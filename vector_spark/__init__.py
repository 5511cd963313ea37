"""vector_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch rebuild of the capabilities of Vector 0.24
(reference: /root/reference, Rust) on the Spark DataFrame /
Structured Streaming stack: source -> transform -> route -> sink
topologies compiled to DataFrame DAGs, with vectorized (Arrow/pandas)
parsing, broadcast enrichment, conditional fan-out routing, and
windowed aggregation. Not a port: no per-event channels, no Event
enum — a fixed StructType schema and Catalyst do the work.
"""

__version__ = "0.1.0"

from vector_spark.session import get_spark  # noqa: F401
