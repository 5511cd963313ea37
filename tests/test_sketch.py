"""Mergeable-sketch operator tests (metric/value.rs:43-49 Sketch +
MetricValue::add histogram merging)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_equals_direct(spark):
    """The AgentDDSketch.merge property: sketching two halves and
    merging is IDENTICAL to sketching the union — no information loss
    at any rollup depth."""
    from vector_spark.operators.sketch import sketch_from_values, sketch_merge

    df = spark.range(1, 5000).select(
        (F.col("id") % 3).alias("k"),
        ((F.col("id") * 7919) % 100000).alias("v"),
        (F.col("id") % 4).alias("agent"),
    )
    direct = sketch_from_values(df, "v", ["k"])
    two_level = sketch_merge(
        sketch_from_values(df, "v", ["k", "agent"]).drop("agent"), ["k"]
    )
    a = {(r.k, r.bucket): r.cnt for r in direct.collect()}
    b = {(r.k, r.bucket): r.cnt for r in two_level.collect()}
    assert a == b


def test_bucket_relative_error(spark):
    """Every value lands in a bucket whose midpoint is within 2^-4
    relative error (the HDR 4-bit-mantissa guarantee)."""
    from vector_spark.operators.sketch import hdr_bucket, hdr_bucket_mid

    df = spark.range(0, 200000, 17).select(F.col("id").alias("v"))
    rows = df.select(
        "v", hdr_bucket_mid(hdr_bucket(F.col("v"))).alias("mid")
    ).collect()
    for r in rows:
        if r.v < 16:
            assert r.mid == float(r.v)
        else:
            assert abs(r.mid - r.v) / r.v <= 1 / 16, (r.v, r.mid)


def test_quantile_rank_guarantee(spark):
    """sketch p-quantile must sit within one bucket of the true rank:
    the count of values strictly below the reported bucket's lower
    edge is < ceil(q*n), and values <= upper edge reach it."""
    from vector_spark.operators.sketch import (
        sketch_from_values,
        sketch_quantiles,
    )

    vals = [(i * i) % 7777 for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long").withColumn(
        "k", F.lit("a")
    )
    sk = sketch_from_values(df, "v", ["k"])
    out = {r.q: r for r in sketch_quantiles(sk, ["k"]).collect()}
    n = len(vals)
    s = sorted(vals)
    for q, row in out.items():
        true_val = s[min(int(-(-q * n // 1)) - 1, n - 1)]  # ceil(q*n)-th
        if true_val >= 16:
            assert abs(row.est - true_val) / true_val <= 1 / 8, (q, row.est, true_val)
        else:
            assert row.est == true_val
        assert row.n == n


def test_merge_agg_histograms(spark):
    """Bucket-wise histogram addition (MetricValue::add)."""
    from vector_spark.operators.sketch import merge_agg_histograms

    df = spark.createDataFrame(
        [("h1", "a", 0, 5, 25.0), ("h1", "a", 1, 2, 300.0),
         ("h2", "a", 0, 3, 12.0), ("h2", "a", 2, 1, 5000.0)],
        "src string, w string, bucket int, bucket_count long, bucket_sum double",
    )
    got = {
        (r.w, r.bucket): (r.bucket_count, r.bucket_sum)
        for r in merge_agg_histograms(df.drop("src"), ["w"]).collect()
    }
    assert got == {
        ("a", 0): (8, 37.0),
        ("a", 1): (2, 300.0),
        ("a", 2): (1, 5000.0),
    }
