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


def merge_expr(field: str, strategy: MergeStrategy, order: Column) -> Column:
    s = MergeStrategy(strategy)
    col = F.col(field)
    if s is MergeStrategy.DISCARD or s is MergeStrategy.FIRST_TS:
        return F.min_by(col, order)
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
    if s is MergeStrategy.CONCAT:
        return F.array_join(_ordered_values(field, order), " ")
    if s is MergeStrategy.CONCAT_NEWLINE:
        return F.array_join(_ordered_values(field, order), "\n")
    if s is MergeStrategy.CONCAT_RAW:
        return F.array_join(_ordered_values(field, order), "")
    if s is MergeStrategy.SHORTEST_ARRAY:
        return F.min_by(col, F.size(col))
    if s is MergeStrategy.LONGEST_ARRAY:
        return F.max_by(col, F.size(col))
    if s is MergeStrategy.FLAT_UNIQUE:
        return F.array_distinct(F.flatten(F.collect_list(F.array(col))))
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
    aggs = [
        merge_expr(src, strat, order).alias(out)
        for out, (strat, src) in strategies.items()
    ]
    return df.groupBy(*group_by).agg(*aggs)


def sessionize(
    df: DataFrame,
    group_by: list[str],
    order_by: str,
    ends_when: Column,
    session_col: str = "_session",
) -> DataFrame:
    """Assign transaction ids within a group: a row with ends_when
    true closes the current session (reduce's ends_when,
    reduce/mod.rs:226-293). Running sum of previous end-markers."""
    w = (
        Window.partitionBy(*group_by)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marker = F.when(ends_when, 1).otherwise(0)
    return df.withColumn(
        session_col, F.coalesce(F.sum(marker).over(w), F.lit(0)).cast("int")
    )
