"""route transform — conditional fan-out to named output ports.

Reference semantics (src/transforms/route.rs:35-53,107-125): each
event is checked against EVERY named condition and a clone is pushed
to every matching route's port; if none match it goes to the
reserved `_unmatched` port. A row matching k routes appears in
exactly k sinks.

Two physical strategies, chosen by fan-out shape:

* `route(...)` — per-route `filter` over a shared (optionally
  cached) parent. N logical scans, but with a cached/checkpointed
  parent each is a memory scan; with an uncached parquet parent
  Catalyst pushes each route's predicate down, so each scan reads
  only its slice. Right choice when routes feed independent jobs.

* `route_single_pass(...)` — ONE scan: build an array of matched
  route names per row, explode, tag rows with `_route`. Right
  choice for the multi-sink partitioned write (write once,
  partitionBy("_route", ...)); at 100 TB this is the strategy that
  avoids re-reading the fact table once per sink.

Both compute `_unmatched` as NOT(OR(conditions)) evaluated on the
same snapshot — the reference's exact semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNMATCHED = "_unmatched"


def _any(conds: list[Column]) -> Column:
    if not conds:
        # zero routes: nothing matches anything (route({}) sends every
        # row to _unmatched, like route_single_pass)
        return F.lit(False)
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def route(
    df: DataFrame, routes: dict[str, Column], cache: bool = False
) -> dict[str, DataFrame]:
    """Per-route filters. Returns {route_name: DataFrame} plus
    `_unmatched`. Null conditions count as non-matching (VRL false)."""
    if UNMATCHED in routes:
        raise ValueError(f"{UNMATCHED} is a reserved route name")
    parent = df.cache() if cache else df
    conds = {name: cond for name, cond in routes.items()}
    out = {name: parent.filter(cond) for name, cond in conds.items()}
    matched_any = _any([F.coalesce(c, F.lit(False)) for c in conds.values()])
    out[UNMATCHED] = parent.filter(~matched_any)
    return out


def route_single_pass(
    df: DataFrame, routes: dict[str, Column], route_col: str = "_route"
) -> DataFrame:
    """Single-scan routing: explode the array of matched route names.

    Row multiplicity matches the reference exactly: k matches -> k
    output rows; zero matches -> one `_unmatched` row. Output carries
    all input columns plus `route_col`, ready for
    .write.partitionBy(route_col, ...).
    """
    if UNMATCHED in routes:
        raise ValueError(f"{UNMATCHED} is a reserved route name")
    tags = [
        F.when(F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in routes.items()
    ]
    matched = F.array_compact(F.array(*tags))
    tagged = F.when(F.size(matched) > 0, matched).otherwise(
        F.array(F.lit(UNMATCHED))
    )
    return df.withColumn(route_col, F.explode(tagged))


def routed_counts(
    df: DataFrame, routes: dict[str, Column], route_col: str = "_route"
) -> DataFrame:
    """Per-sink routed-row counts (the EventsSent telemetry analogue,
    src/topology/builder.rs:408-413) in one scan + one tiny shuffle."""
    return (
        route_single_pass(df, routes, route_col)
        .groupBy(route_col)
        .agg(F.count(F.lit(1)).alias("rows"))
    )
