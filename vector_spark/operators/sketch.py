"""Mergeable quantile sketch + aggregated-histogram re-aggregation.

Reference: `lib/vector-core/src/event/metric/value.rs:43-49` — Vector
metrics carry `Sketch(AgentDDSketch)`, a MERGEABLE quantile sketch, so
already-aggregated metrics can be re-aggregated losslessly at the next
tier (agent -> regional -> global); and `MetricValue::add`
(`value.rs:168+`) merges two `AggregatedHistogram`s bucket-wise when
the bounds agree.

Rebuild (Spark-first, oracle-exact): the sketch is a log-bucketed
histogram like DDSketch, but the bucket function is HDR-histogram
style INTEGER arithmetic — exponent `e = floor(log2(x))` computed via
the binary-string length (exact in both Spark `bin()` and DuckDB
`printf('%b')`, no libm last-ulp hazard) plus a 4-bit sub-bucket
mantissa, giving <= 2^-4 (~6%) relative error per bucket. Everything
downstream is plain `groupBy().sum()`:

  values -> sketch rows (key..., bucket, cnt)      one shuffle
  sketch ∪ sketch -> merged sketch                 groupBy(bucket) sum
  quantile(q)                                      cumulative window

Merging N sketches is associative/commutative exactly like
AgentDDSketch.merge, so a 2-level (or N-level) rollup never touches
raw samples — the property `percentile_approx` over raw values cannot
provide once the raw values are gone. At 100 TB the level-1 sketch is
built map-side-combinable (groupBy on (keys, bucket) is one shuffle of
|keys| x ~64 rows), and every higher level shuffles only sketch rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sub-bucket bits: 4 -> 16 sub-buckets per octave, ~6% max rel. error
SUB_BITS = 4
SUB = 1 << SUB_BITS  # 16


def hdr_bucket(x: Column) -> Column:
    """Integer-exact log bucket id for a non-negative integer column.

    x < 16            -> bucket = x                  (exact)
    x >= 16, e=msb(x) -> bucket = 16*e + ((x >> (e-4)) & 15)
    NULL / negative   -> NULL (caller filters)
    """
    x = x.cast("bigint")
    e = (F.length(F.bin(x)) - 1).cast("int")
    # the python wrappers take only literal shift amounts; the SQL
    # builtins accept a column
    m = F.call_function("shiftright", x, e - SUB_BITS).bitwiseAND(
        F.lit(SUB - 1)
    )
    small = x.cast("int")
    return (
        F.when(x < 0, F.lit(None).cast("int"))
        .when(x < SUB, small)
        .otherwise((F.lit(SUB) * e + m).cast("int"))
    )


def hdr_bucket_mid(bucket: Column) -> Column:
    """Representative (midpoint) value of a bucket, as double.

    bucket < 16: the exact value. Otherwise the bucket covers
    [(16+m) << (e-4), (16+m+1) << (e-4)) and the midpoint is
    lo + (width-1)/2 — all integer-derived, so cross-engine exact.
    """
    e = (bucket / SUB).cast("int")
    m = F.pmod(bucket, F.lit(SUB))
    lo = F.call_function("shiftleft", (m + SUB).cast("bigint"), e - SUB_BITS)
    width = F.call_function("shiftleft", F.lit(1).cast("bigint"), e - SUB_BITS)
    return (
        F.when(bucket < SUB, bucket.cast("double"))
        .otherwise(lo.cast("double") + (width - 1).cast("double") / 2.0)
    )


def sketch_from_values(
    df: DataFrame,
    value_col: str,
    keys: list[str | Column],
) -> DataFrame:
    """Level-1 accumulation: raw values -> sketch rows
    (keys..., bucket int, cnt bigint). One partial-aggregated shuffle;
    negative/NULL values are dropped (AgentDDSketch::insert takes
    non-negative rates/latencies)."""
    b = hdr_bucket(F.col(value_col))
    return (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) >= 0))
        .groupBy(*keys, b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sketch_merge(df: DataFrame, keys: list[str | Column]) -> DataFrame:
    """Merge sketch rows across a (finer) prior level: bucket-wise
    count sum — the AgentDDSketch.merge analogue. Input may be a
    union of many sketches; output is one sketch per key group."""
    return df.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def sketch_quantiles(
    df: DataFrame,
    keys: list[str],
    qs: list[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Quantile estimates from sketch rows: for each q, the midpoint
    of the first bucket whose cumulative count reaches ceil(q * n)
    (the standard sketch rank query). Output:
    (keys..., q double, est double, n bigint)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy(*keys)
    cum = df.select(
        *keys,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    # ONE pass for every q: explode the quantile list against the
    # cumulative rows and take min(bucket) per (keys, q). The per-q
    # loop re-evaluated the whole cum-window plan (a shuffle over all
    # sketch rows) once per quantile and unioned the results — cost
    # grew linearly with len(qs) for no reason.
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    hits = cum.select(
        *keys, "bucket", "cum", "n", F.explode(qarr).alias("q")
    ).filter(
        F.col("cum") >= F.ceil(F.col("q") * F.col("n")).cast("bigint")
    )
    return (
        hits.groupBy(*keys, "q")
        .agg(F.min("bucket").alias("bucket"), F.max("n").alias("n"))
        .select(
            *keys,
            "q",
            hdr_bucket_mid(F.col("bucket")).alias("est"),
            "n",
        )
    )


def merge_agg_histograms(
    df: DataFrame,
    keys: list[str | Column],
    bucket_col: str = "bucket",
    count_col: str = "bucket_count",
    sum_col: str = "bucket_sum",
) -> DataFrame:
    """MetricValue::add for AggregatedHistogram (value.rs:168+): two
    histograms with matching bounds merge bucket-wise (counts and sums
    add). Input: one row per (source, key..., bucket); output: one row
    per (key..., bucket)."""
    return df.groupBy(*keys, bucket_col).agg(
        F.sum(count_col).alias(count_col),
        F.sum(sum_col).alias(sum_col),
    )
