"""As-of join: each left row picks up the LATEST right row with
right.ts <= left.ts per key — the time-series enrichment Spark has
no built-in operator for (join turns to the config/deployment state
in force at event time, prices to the quote in force, etc.).

Plan shape (the 100 TB one): the union-window trick, not a range
join. Right rows are tagged 0 and carry their payload; left rows are
tagged 1 with a null payload; one window per key ordered by
(ts, tag) forward-fills the last non-null payload, so every left row
reads the most recent right payload at-or-before its timestamp.
ONE shuffle of |left| + |right| rows, no broadcast requirement, no
candidate explosion — a range join materializes |left| x |matching
right| candidates before picking the max, which at web scale is the
difference between a pipeline and an outage. Skew is bounded per
key exactly like any windowed operator.

Precondition: (key, ts) should be unique on the right side; ties on
right.ts make "the latest row" ambiguous (this implementation keeps
the last in (ts, tag) order within the tie, DuckDB's ASOF JOIN picks
an arbitrary one — the registered gate uses a tie-free right side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """Backward (inclusive) as-of join. Returns every left row with
    ``value_cols`` from the latest right row whose ``ts_col`` is
    <= the left row's, plus that row's timestamp as
    ``matched_ts_col`` — NULLs when no right row precedes (left
    semantics, nothing dropped).
    """
    clash = set(left.columns) & (set(value_cols) | {matched_ts_col})
    if clash:
        raise ValueError(
            f"asof_join output columns collide with left columns: "
            f"{sorted(clash)} — rename value_cols/matched_ts_col"
        )
    reserved = {"_asof_payload", "_asof_tag", "_asof_fill"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"asof_join reserves internal column names {sorted(taken)} "
            f"— rename them on the input frames"
        )
    payload_t = F.struct(
        *[F.col(c).alias(c) for c in value_cols],
        F.col(ts_col).alias(matched_ts_col),
    )
    rt = right.select(
        *key_cols,
        F.col(ts_col),
        payload_t.alias("_asof_payload"),
        F.lit(0).alias("_asof_tag"),
    )
    left_only = [c for c in left.columns if c not in set(key_cols) | {ts_col}]
    # align the union schemas in ONE projection: right rows carry
    # nulls for left-only columns, left rows carry a null payload (a
    # per-column withColumn loop re-analyzes a growing plan per field)
    rt = rt.select(
        "*",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_only
        ],
    )
    lt = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(None)
        .cast(rt.schema["_asof_payload"].dataType)
        .alias("_asof_payload"),
        F.lit(1).alias("_asof_tag"),
        *left_only,
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "_asof_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        lt.unionByName(rt)
        .withColumn(
            "_asof_fill", F.last("_asof_payload", ignorenulls=True).over(w)
        )
        .filter(F.col("_asof_tag") == 1)
    )
    out_cols = (
        [F.col(c) for c in key_cols]
        + [F.col(ts_col)]
        + [F.col(c) for c in left_only]
        + [F.col("_asof_fill")[c].alias(c) for c in value_cols]
        + [F.col("_asof_fill")[matched_ts_col].alias(matched_ts_col)]
    )
    return filled.select(*out_cols)
