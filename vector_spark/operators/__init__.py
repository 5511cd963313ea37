"""Operator library — Vector's transforms as DataFrame combinators.

Each module maps one reference transform (SURVEY.md §2.1) to a thin
`DataFrame -> DataFrame` (or `-> dict[str, DataFrame]`) function.
Stateless transforms are pure Column expressions (Catalyst inlines
them into whole-stage codegen); stateful ones become groupBy/window
compositions — Spark gives us key-partitioned state the reference's
single-threaded Task transforms never had.
"""

from vector_spark.operators.filter import filter_events  # noqa: F401
from vector_spark.operators.route import route, route_single_pass  # noqa: F401
from vector_spark.operators.sample import sample  # noqa: F401
from vector_spark.operators.dedupe import dedupe  # noqa: F401
from vector_spark.operators.reduce import reduce_groups, MergeStrategy  # noqa: F401
from vector_spark.operators.aggregate import aggregate_metrics, salted_aggregate  # noqa: F401
from vector_spark.operators.throttle import throttle  # noqa: F401
from vector_spark.operators.log_to_metric import log_to_metric, MetricSpec  # noqa: F401
from vector_spark.operators.metric_to_log import metric_to_log  # noqa: F401
from vector_spark.operators.tag_cardinality import tag_cardinality_limit  # noqa: F401
