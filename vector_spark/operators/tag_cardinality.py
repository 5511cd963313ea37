"""tag_cardinality_limit — cap distinct values per tag key.

Reference (src/transforms/tag_cardinality_limit.rs:27-80,163-230):
per tag key, only the first `value_limit` distinct values ever seen
are accepted; later values either drop the tag (`drop_tag`) or the
whole event (`drop_event`). "First seen" is arrival order.

Rebuild (batch): arrival order becomes an explicit order key —
rank distinct values by their first occurrence (min of the order
key) and accept ranks <= limit. Two small shuffles over the distinct
(tag_value) set, not the fact table. Documented divergence: exact
HashSet arrival semantics only reproducible under a total order; the
Bloom-filter approximate mode maps to the same rank with
approx_count_distinct guards in streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tag_cardinality_limit(
    df: DataFrame,
    tag_col: str,
    value_limit: int,
    order_by: str,
    mode: str = "drop_tag",
) -> DataFrame:
    firsts = (
        # absent tags don't count against the limit (the reference
        # only tracks values actually present on events)
        df.filter(F.col(tag_col).isNotNull())
        .groupBy(tag_col)
        .agg(F.min(order_by).alias("_first_seen"))
        # orderBy+limit plans TakeOrderedAndProject: each task keeps a
        # k-heap and only k rows reach the driver-side merge. The
        # previous row_number() over an un-partitioned Window pulled
        # ALL distinct tag values into one task — a scale-killer in
        # precisely the runaway-cardinality scenario this operator
        # exists for.
        .orderBy(F.col("_first_seen"), F.col(tag_col))
        .limit(value_limit)
        .select(tag_col)
        .withColumn("_accepted", F.lit(True))
    )
    joined = df.join(F.broadcast(firsts), on=tag_col, how="left")
    if mode == "drop_event":
        # events WITHOUT the tag pass untouched (the reference only
        # limits values actually present); a bare isNotNull filter
        # would silently delete every NULL-tag event
        return joined.filter(
            F.col("_accepted").isNotNull() | F.col(tag_col).isNull()
        ).drop("_accepted")
    if mode == "drop_tag":
        return joined.withColumn(
            tag_col,
            F.when(F.col("_accepted").isNotNull(), F.col(tag_col)),
        ).drop("_accepted")
    raise ValueError(f"unknown mode {mode}")
