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


def __getattr__(name):
    """Lazy top-level conveniences: vector_spark.run_config(...) etc.
    without importing the pipeline stack at package import."""
    if name in ("load_config", "run_config", "run_config_tests",
                "run_config_streaming", "spec_from_config"):
        import vector_spark.config as _c

        return getattr(_c, name)
    if name in ("run_pipeline", "compile_pipeline", "unit_test",
                "PipelineContext"):
        import vector_spark.pipeline as _p

        return getattr(_p, name)
    raise AttributeError(name)
