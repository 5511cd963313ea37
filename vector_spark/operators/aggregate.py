"""aggregate transform — windowed metric roll-up, with skew salting.

Reference (src/transforms/aggregate.rs:23-33,77-150): a map keyed by
the full MetricSeries (name, namespace, tags); Incremental values
`add()`-merge (sum), Absolute replace (last-wins); the whole map is
flushed every interval_ms. The window is processing-time; there are
no watermarks (SURVEY.md §2.7) — the rebuild upgrades to event-time
tumbling windows on `ts`.

Rebuild: `groupBy(window(ts, interval), *keys)` with `sum` for
incremental columns and `max_by(value, order)` for absolute
(deterministic last-wins — Vector's "last" is arrival order, which a
distributed batch must replace with an explicit order key).

`salted_aggregate` is the north-rule skew weapon: hot keys (one
conv_id owning a big fraction of turns) make a single reducer the
straggler; a two-phase aggregate — partial agg on (key, salt), final
agg on (key) — spreads the hot key over S reducers. Works for any
algebraic aggregate (sum/count/min/max and max_by for last-wins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def aggregate_metrics(
    df: DataFrame,
    keys: list[str],
    interval: str = "1 hour",
    ts_col: str = "ts",
    incremental: dict[str, str] | None = None,
    absolute: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """incremental: {out: in_col} summed; absolute: {out: (in_col,
    order_col)} last-by-order. Always emits a `turns` count."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("turns")]
    for out, src in (incremental or {}).items():
        aggs.append(F.sum(src).alias(out))
    for out, (src, order) in (absolute or {}).items():
        aggs.append(F.max_by(src, F.col(order)).alias(out))
    return df.groupBy(F.window(ts_col, interval).alias("w"), *keys).agg(*aggs)


def merge_metric_stream(
    df: DataFrame,
    keys: list[str],
    interval: str = "1 hour",
    ts_col: str = "ts",
    metric_kind_col: str = "metric_kind",
    value_col: str = "value",
    order_col: str = "_order",
) -> DataFrame:
    """MetricData merge semantics (lib/vector-core/src/event/metric/
    data.rs:81-131): Incremental values ADD (sum), Absolute values
    REPLACE (last wins). A series carries one kind, so the merged
    value dispatches on the group's kind: sum for incremental,
    max_by(value, order) for absolute — Vector's arrival-order "last"
    becomes an explicit order key (SURVEY §2.7)."""
    mk = F.col(metric_kind_col)
    # F.max, not F.first: first() with an arbitrary in-group row order
    # is nondeterministic and does NOT skip nulls — a NULL-kind first
    # row would silently last-wins-merge incremental data. max()
    # ignores nulls and, should a group ever mix kinds (caller error),
    # deterministically prefers 'incremental' (sum — the lossless
    # choice).
    merged = F.when(
        F.max(mk) == "incremental", F.sum(value_col)
    ).otherwise(F.max_by(value_col, F.col(order_col)))
    return (
        df.groupBy(F.window(ts_col, interval).alias("w"), *keys)
        .agg(
            F.max(mk).alias(metric_kind_col),
            merged.alias(value_col),
            F.count(F.lit(1)).alias("n"),
        )
    )


def set_members(
    df: DataFrame,
    keys: list[str],
    member_col: str,
    interval: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """MetricValue::Set keeps the member set, not just a count
    (metric/value.rs) — collect_set, sorted for determinism."""
    return df.groupBy(F.window(ts_col, interval).alias("w"), *keys).agg(
        F.array_sort(F.collect_set(member_col)).alias("members"),
        F.count(F.lit(1)).alias("n"),
    )


def distribution_to_agg_histogram(
    df: DataFrame,
    value_col: str,
    bounds: list[float],
    keys: list[str] | None = None,
    interval: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """distribution_to_agg_histogram (lib/vector-core/src/event/
    metric/value.rs:91-104): samples -> AggregatedHistogram bucket
    counts + count + sum. bucket = number of upper bounds below the
    sample (0..len(bounds)); pure Column exprs, one shuffle."""
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    bucket = F.size(
        F.filter(barr, lambda b: b < F.col(value_col).cast("double"))
    )
    # NULL samples would land in bucket 0 with bucket_count
    # incremented but bucket_sum unchanged (sum skips nulls) — a
    # Distribution has no null samples; drop them like
    # sketch_from_values does
    df = df.filter(F.col(value_col).isNotNull())
    return (
        df.withColumn("_bucket", bucket)
        .groupBy(F.window(ts_col, interval).alias("w"), *(keys or []), "_bucket")
        .agg(
            F.count(F.lit(1)).alias("bucket_count"),
            F.sum(F.col(value_col).cast("double")).alias("bucket_sum"),
        )
        .withColumnRenamed("_bucket", "bucket")
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    salt_buckets: int = 16,
    count_col: str = "turns",
) -> DataFrame:
    """Two-phase salted aggregate for skewed keys.

    Phase 1 groups by (keys..., salt) — map-side partial aggregation
    plus a shuffle where the hot key is spread over `salt_buckets`
    reducers. Phase 2 re-aggregates the (tiny) partials by keys.
    Output schema: keys..., count_col, *sums. Equivalent plan cost:
    two shuffles, but the second is over |distinct keys| * S rows.
    """
    # deterministic row-local salt: monotonically_increasing_id is
    # computed per partition with no shuffle; pmod spreads a hot key's
    # rows uniformly over salt_buckets reducers
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            *[F.sum(src).alias(f"_s_{out}") for out, src in sums.items()],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_cnt").alias(count_col),
        *[F.sum(f"_s_{out}").alias(out) for out in sums],
    )
