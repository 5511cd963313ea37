"""throttle transform — per-key rate limiting.

Reference (src/transforms/throttle.rs:23-40,80-140): a GCRA token
bucket (`governor` crate) per rendered key template — at most
`threshold` events per `window_secs` per key; an `exclude` condition
bypasses the limiter.

Rebuild (batch): event-time semantics — keep the first `threshold`
events per (key, tumbling window), ordered by an explicit order key:
row_number() over (partition by key, window(ts) order by ...) <=
threshold. The GCRA's continuous leak becomes a discrete tumbling
window; exact GCRA is order/arrival dependent and only meaningful in
streaming (applyInPandasWithState variant in streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    key: list[str],
    order_by: list[str],
    ts_col: str = "ts",
    exclude: Column | None = None,
) -> DataFrame:
    win = F.window(ts_col, f"{window_secs} seconds").alias("_w")
    w = Window.partitionBy(*[F.col(k) for k in key], win).orderBy(
        *[F.col(o) for o in order_by]
    )
    if exclude is None:
        ranked = df.withColumn("_rn", F.row_number().over(w))
        return ranked.filter(F.col("_rn") <= threshold).drop("_rn")
    # Excluded events bypass the limiter WITHOUT consuming quota
    # (reference src/transforms/throttle.rs:144-165 skips
    # limiter.check_key entirely for excluded events): rank only
    # non-excluded rows via a running conditional count, keep
    # excluded rows unconditionally.
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rn = F.sum(F.when(exclude, 0).otherwise(1)).over(running)
    ranked = df.withColumn("_rn", rn).withColumn("_ex", exclude)
    return ranked.filter(F.col("_ex") | (F.col("_rn") <= threshold)).drop(
        "_rn", "_ex"
    )
