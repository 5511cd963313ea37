"""reduce transform — collapse groups of events into one.

Reference (src/transforms/reduce/mod.rs:31-69): group events by
`group_by` fields, merge every other field per a named strategy
(merge_strategy.rs:14-52), flush on `ends_when`/staleness. Default
strategies: strings -> first, timestamps -> first plus a `<f>_end`
last, numbers -> sum (reduce/mod.rs:52-56).

Rebuild: `groupBy(group_by).agg(...)` with one expression per
(field, strategy). "first"/"last" in an unordered engine need an
explicit order key, so every call takes `order_by` (for transcripts:
turn_idx) — this is the SURVEY §2.7 point that Vector's implicit
stream order must become an explicit sort key. Order-sensitive
collectors (Array/Concat*) sort a collect_list of (order, value)
structs — one shuffle, no window pass.

`ends_when` sessionization (split a conversation into transactions
at a condition) is `sessionize()`: a running sum of end-markers over
(group, order) — one window pass — then reduce per (group, session).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class MergeStrategy(str, Enum):
    DISCARD = "discard"          # first value (by order)
    RETAIN = "retain"            # last non-null (by order)
    SUM = "sum"
    MAX = "max"
    MIN = "min"
    ARRAY = "array"              # ordered collect
    CONCAT = "concat"            # join with ' '
    CONCAT_NEWLINE = "concat_newline"
    CONCAT_RAW = "concat_raw"    # join with ''
    SHORTEST_ARRAY = "shortest_array"
    LONGEST_ARRAY = "longest_array"
    FLAT_UNIQUE = "flat_unique"
    FIRST_TS = "first_ts"        # default timestamp: first
    LAST_TS = "last_ts"          # default timestamp: <f>_end = last


def _ordered_values(field: str, order: Column) -> Column:
    """array of field values sorted by the order key (null-safe)."""
    pairs = F.collect_list(F.struct(order.alias("o"), F.col(field).alias("v")))
    return F.transform(F.array_sort(pairs), lambda x: x["v"])


def merge_expr(
    field: str, strategy: MergeStrategy, order: Column, is_array: bool = False
) -> Column:
    s = MergeStrategy(strategy)
    col = F.col(field)
    if s is MergeStrategy.DISCARD or s is MergeStrategy.FIRST_TS:
        # first event that CARRIES the field (reduce/mod.rs merges
        # per-field; absent fields don't contribute, and absence is
        # null in the column model)
        return F.min_by(col, F.when(col.isNotNull(), order))
    if s is MergeStrategy.RETAIN or s is MergeStrategy.LAST_TS:
        # last non-null by order: null order keys sort first via max_by
        return F.max_by(col, F.when(col.isNotNull(), order))
    if s is MergeStrategy.SUM:
        return F.sum(col)
    if s is MergeStrategy.MAX:
        return F.max(col)
    if s is MergeStrategy.MIN:
        return F.min(col)
    if s is MergeStrategy.ARRAY:
        return _ordered_values(field, order)
    if s in (
        MergeStrategy.CONCAT, MergeStrategy.CONCAT_NEWLINE, MergeStrategy.CONCAT_RAW
    ):
        sep = {"concat": " ", "concat_newline": "\n", "concat_raw": ""}[s.value]
        vals = _ordered_values(field, order)
        if is_array:
            # Concat over ARRAY values extends into one array — no
            # string join (merge_strategy.rs ConcatMerger Value::Array
            # arm appends items)
            return F.flatten(F.filter(vals, lambda v: v.isNotNull()))
        return F.array_join(vals, sep)
    if s is MergeStrategy.SHORTEST_ARRAY:
        return F.min_by(col, F.size(col))
    if s is MergeStrategy.LONGEST_ARRAY:
        return F.max_by(col, F.size(col))
    if s is MergeStrategy.FLAT_UNIQUE:
        # array values contribute their ELEMENTS (FlatUniqueMerger
        # flattens each Value::Array item); scalars get a synthetic
        # 1-element wrapper so one flatten serves both
        return F.array_distinct(
            F.flatten(F.collect_list(col if is_array else F.array(col)))
        )
    raise ValueError(f"unknown strategy {strategy}")


def reduce_groups(
    df: DataFrame,
    group_by: list[str],
    strategies: dict[str, tuple[MergeStrategy, str]],
    order_by: str,
) -> DataFrame:
    """strategies: {out_col: (strategy, in_col)}. order_by gives the
    'stream order' (e.g. turn_idx)."""
    order = F.col(order_by)
    arr_cols = {
        f.name for f in df.schema.fields if f.dataType.typeName() == "array"
    }
    aggs = [
        merge_expr(src, strat, order, is_array=src in arr_cols).alias(out)
        for out, (strat, src) in strategies.items()
    ]
    return df.groupBy(*group_by).agg(*aggs)


def sessionize(
    df: DataFrame,
    group_by: list[str],
    order_by: str,
    ends_when: Column | None = None,
    starts_when: Column | None = None,
    session_col: str = "_session",
) -> DataFrame:
    """Assign transaction ids within a group (reduce/mod.rs:199-204:
    exactly one of ends_when/starts_when).

    * ends_when: a matching row CLOSES the current transaction (it is
      the transaction's last event) -> running sum of end-markers over
      the PRECEDING rows.
    * starts_when: a matching row OPENS a new transaction (the
      previous one is flushed without it, mod.rs:68) -> running sum of
      start-markers INCLUDING the current row.
    """
    if (ends_when is None) == (starts_when is None):
        raise ValueError("exactly one of ends_when/starts_when required")
    if ends_when is not None:
        frame_end, cond = -1, ends_when
    else:
        frame_end, cond = Window.currentRow, starts_when
    w = (
        Window.partitionBy(*group_by)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, frame_end)
    )
    marker = F.when(cond, 1).otherwise(0)
    return df.withColumn(
        session_col, F.coalesce(F.sum(marker).over(w), F.lit(0)).cast("int")
    )


def sessionize_gap(
    df: DataFrame,
    group_by: list[str],
    ts_col: str,
    expire_after_ms: int = 30000,
    session_col: str = "_session",
) -> DataFrame:
    """The batch mapping of reduce's staleness flush
    (reduce/mod.rs:33,226-241 `expire_after_ms`, default 30 s): a
    group whose next event arrives more than expire_after_ms after
    the previous one starts a new transaction. Event-time gap
    sessionization — one window pass; the streaming runner gets the
    same semantics for free from F.session_window(ts, gap)."""
    w = Window.partitionBy(*group_by).orderBy(ts_col)
    # sub-second-exact epoch seconds; the TIMESTAMP cast first makes
    # this work for TIMESTAMP_NTZ too (bare double cast rejects NTZ,
    # unix_timestamp truncates the fraction)
    def secs(c):
        return c.cast("timestamp").cast("double")

    gap = secs(F.col(ts_col)) - secs(F.lag(F.col(ts_col)).over(w))
    # two window passes over the SAME (group, ts) ordering — Catalyst
    # plans a single sort+exchange reused by both Window operators
    with_gap = df.withColumn("_gap", gap)
    new_sess = F.when(
        F.col("_gap").isNull() | (F.col("_gap") > expire_after_ms / 1000.0), 1
    ).otherwise(0)
    run = (
        Window.partitionBy(*group_by)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_gap.withColumn(
        session_col, (F.sum(new_sess).over(run) - 1).cast("int")
    ).drop("_gap")
