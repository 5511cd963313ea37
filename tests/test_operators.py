"""Unit tests per operator, mirroring the reference's inline
#[cfg(test)] suites (SURVEY.md §5.1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vector_spark.conditions import check_fields, vrl_expr
from vector_spark.operators.dedupe import dedupe
from vector_spark.operators.log_to_metric import MetricSpec, log_to_metric
from vector_spark.operators.reduce import MergeStrategy, reduce_groups, sessionize
from vector_spark.operators.sample import sample
from vector_spark.operators.tag_cardinality import tag_cardinality_limit
from vector_spark.operators.throttle import throttle
from vector_spark.operators.aggregate import salted_aggregate


def test_check_fields(spark):
    df = spark.createDataFrame(
        [("assistant", "python", 5), ("assistant", "none", 3), ("user", None, 9)],
        ["role", "tool", "n"],
    )
    got = df.filter(
        check_fields(role__eq="assistant", tool__neq="none", tool__exists=True)
    ).collect()
    assert len(got) == 1 and got[0].tool == "python"
    assert df.filter(check_fields(not__role__eq="assistant")).count() == 1
    assert df.filter(check_fields(n__gt=4)).count() == 2
    assert df.filter(vrl_expr("n % 3 = 0")).count() == 2
    with pytest.raises(ValueError):
        check_fields(role__bogus="x")


def test_sample_deterministic_and_consistent(spark, transcripts):
    out1 = sample(transcripts, 10, "conv_id").select("conv_id").distinct()
    out2 = sample(transcripts, 10, "conv_id").select("conv_id").distinct()
    assert sorted(r.conv_id for r in out1.collect()) == sorted(
        r.conv_id for r in out2.collect()
    )
    # keyed consistency: every turn of a kept conv is kept
    kept = sample(transcripts, 5, "conv_id")
    kept_convs = [r.conv_id for r in kept.select("conv_id").distinct().collect()]
    assert kept.count() == transcripts.filter(
        F.col("conv_id").isin(kept_convs)
    ).count()


def test_sample_rate_annotation(transcripts):
    out = sample(transcripts, 10, "conv_id")
    assert out.select("sample_rate").distinct().collect()[0][0] == 10


def test_dedupe_match_and_ignore(spark):
    rows = [("c1", 0, "a"), ("c1", 0, "a"), ("c1", 1, "b"), ("c2", 0, "a")]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    assert dedupe(df, match=["conv_id", "turn_idx"]).count() == 3
    assert dedupe(df, ignore=["conv_id"]).count() == 2  # (0,a),(1,b)
    with pytest.raises(ValueError):
        dedupe(df)
    with pytest.raises(ValueError):
        dedupe(df, match=["conv_id"], ignore=["text"])


def test_dedupe_keep_first_deterministic(spark):
    rows = [("k", 2, "late"), ("k", 1, "early"), ("k", 3, "latest")]
    df = spark.createDataFrame(rows, ["k", "ord", "v"])
    out = dedupe(df, match=["k"], order_by=["ord"]).collect()
    assert len(out) == 1 and out[0].v == "early"


def test_reduce_strategies(spark):
    rows = [
        ("c1", 0, "hello", 10, "search"),
        ("c1", 1, "world", 20, None),
        ("c1", 2, "again", 5, "search"),
        ("c2", 0, "solo", 7, "python"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text", "lat", "tool"])
    out = {
        r.conv_id: r
        for r in reduce_groups(
            df,
            ["conv_id"],
            {
                "first_text": (MergeStrategy.DISCARD, "text"),
                "last_text": (MergeStrategy.RETAIN, "text"),
                "lat_sum": (MergeStrategy.SUM, "lat"),
                "lat_max": (MergeStrategy.MAX, "lat"),
                "texts": (MergeStrategy.ARRAY, "text"),
                "joined": (MergeStrategy.CONCAT, "text"),
                "lines": (MergeStrategy.CONCAT_NEWLINE, "text"),
                "tools": (MergeStrategy.FLAT_UNIQUE, "tool"),
            },
            order_by="turn_idx",
        ).collect()
    }
    c1 = out["c1"]
    assert c1.first_text == "hello"
    assert c1.last_text == "again"
    assert c1.lat_sum == 35
    assert c1.lat_max == 20
    assert c1.texts == ["hello", "world", "again"]
    assert c1.joined == "hello world again"
    assert c1.lines == "hello\nworld\nagain"
    assert set(c1.tools) == {"search", None} or set(
        x for x in c1.tools if x
    ) == {"search"}


def test_reduce_retain_skips_trailing_nulls(spark):
    rows = [("c", 0, "x"), ("c", 1, None)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = reduce_groups(
        df, ["k"], {"last": (MergeStrategy.RETAIN, "v")}, order_by="o"
    ).collect()[0]
    assert out.last == "x"


def test_sessionize(spark):
    rows = [("c", 0, False), ("c", 1, True), ("c", 2, False), ("c", 3, True), ("c", 4, False)]
    df = spark.createDataFrame(rows, ["k", "o", "end"])
    out = sessionize(df, ["k"], "o", F.col("end"))
    got = {r.o: r._session for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_throttle(spark):
    rows = [
        ("k1", i, f"2025-01-01 00:{i:02d}:00") for i in range(5)
    ] + [("k2", 0, "2025-01-01 00:00:00")]
    df = spark.createDataFrame(rows, ["key", "ord", "ts_s"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = throttle(df, threshold=2, window_secs=3600, key=["key"], order_by=["ord"])
    got = sorted((r.key, r.ord) for r in out.collect())
    assert got == [("k1", 0), ("k1", 1), ("k2", 0)]
    # exclude bypasses the limiter
    out2 = throttle(
        df, 1, 3600, ["key"], ["ord"], exclude=F.col("ord") == 4
    )
    assert sorted(r.ord for r in out2.filter("key='k1'").collect()) == [0, 4]


def test_tag_cardinality_drop_event(spark):
    rows = [
        ("a", 1.0), ("a", 2.0), ("b", 3.0), ("c", 4.0), ("b", 5.0),
    ]
    df = spark.createDataFrame(rows, ["tag", "ts"])
    kept = tag_cardinality_limit(df, "tag", 2, "ts", mode="drop_event")
    assert sorted(r.tag for r in kept.collect()) == ["a", "a", "b", "b"]
    dropped_tag = tag_cardinality_limit(df, "tag", 2, "ts", mode="drop_tag")
    vals = [r.tag for r in dropped_tag.collect()]
    assert vals.count(None) == 1 and len(vals) == 5


def test_log_to_metric_specs(spark, parsed):
    out = log_to_metric(
        parsed,
        specs=[
            MetricSpec(kind="counter", name="errors",
                       condition=F.col("level") == "ERROR"),
            MetricSpec(kind="counter", name="lat_total", field_="latency_ms"),
            MetricSpec(kind="set", name="reqs", field_="req_id"),
            MetricSpec(kind="histogram", name="lat", field_="latency_ms"),
        ],
        tags=["role"],
        interval="30 days",
    ).collect()
    assert len(out) > 0
    row = out[0]
    assert row.errors >= 0 and row.reqs > 0 and len(row.lat_p) == 3


def test_salted_aggregate_matches_plain(parsed):
    plain = {
        (r.role,): (r.turns, r.lat)
        for r in parsed.groupBy("role")
        .agg(F.count(F.lit(1)).alias("turns"), F.sum("latency_ms").alias("lat"))
        .collect()
    }
    salted = {
        (r.role,): (r.turns, r.lat)
        for r in salted_aggregate(
            parsed, ["role"], {"lat": "latency_ms"}, salt_buckets=8
        ).collect()
    }
    assert plain == salted


def test_sample_counter(spark):
    """Counter-mode 1-in-N by explicit order (sample.rs:152-166):
    first event kept, then every rate-th; exclude bypasses without
    consuming the counter."""
    from pyspark.sql import functions as F
    from vector_spark.operators.sample import sample_counter

    df = spark.range(100).select(F.col("id").alias("seq"))
    kept = sample_counter(df, rate=10, order_by="seq", partitions=4)
    got = sorted(r.seq for r in kept.collect())
    assert got == list(range(0, 100, 10))
    assert kept.collect()[0].sample_rate == 10

    # exclude: seq < 5 always pass and do not consume the counter,
    # so sampling ranks the remaining 95 rows starting at seq=5
    kept2 = sample_counter(
        df, rate=10, order_by="seq", exclude=F.col("seq") < 5, partitions=4
    )
    got2 = sorted(r.seq for r in kept2.collect())
    assert got2 == [0, 1, 2, 3, 4] + list(range(5, 100, 10))


def test_tag_cardinality_drop_event_passes_null_tags(spark):
    from vector_spark.operators.tag_cardinality import tag_cardinality_limit

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "c"), (5, None)],
        "ord int, tag string",
    )
    out = tag_cardinality_limit(
        df, "tag", value_limit=2, order_by="ord", mode="drop_event"
    )
    rows = sorted(r.ord for r in out.collect())
    # a,b accepted; c over limit -> dropped; NULL-tag events pass
    # untouched (tag_cardinality_limit.rs only limits present values)
    assert rows == [1, 2, 3, 5]


def test_reduce_flat_unique_flattens_array_columns(spark):
    from vector_spark.operators.reduce import MergeStrategy, reduce_groups

    df = spark.createDataFrame(
        [("g", 0, ["a", "b"]), ("g", 1, ["b", "c"]), ("g", 2, None)],
        "k string, ord int, tags array<string>",
    )
    out = reduce_groups(
        df, ["k"], {"tags": (MergeStrategy.FLAT_UNIQUE, "tags")}, "ord"
    ).collect()[0]
    # elements, not sub-arrays (FlatUniqueMerger semantics)
    assert sorted(out.tags) == ["a", "b", "c"]
    # scalar columns still wrap correctly
    df2 = spark.createDataFrame(
        [("g", 0, "x"), ("g", 1, "y"), ("g", 2, "x")],
        "k string, ord int, v string",
    )
    out2 = reduce_groups(
        df2, ["k"], {"v": (MergeStrategy.FLAT_UNIQUE, "v")}, "ord"
    ).collect()[0]
    assert sorted(out2.v) == ["x", "y"]


def test_dedupe_order_by_with_all_columns_as_keys(spark):
    from vector_spark.operators.dedupe import dedupe

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], "k string, ts int"
    )
    out = dedupe(df, match=["k", "ts"], order_by=["ts"])
    assert sorted((r.k, r.ts) for r in out.collect()) == [("a", 1), ("b", 2)]


def test_route_empty_routes_all_unmatched(spark):
    from vector_spark.operators.route import route

    df = spark.createDataFrame([(1,), (2,)], "x int")
    out = route(df, {})
    assert set(out) == {"_unmatched"}
    assert out["_unmatched"].count() == 2


def test_explode_metrics_wire_kind_and_null_field(spark):
    from vector_spark.operators.log_to_metric import (
        MetricSpec,
        explode_metrics,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "2024-01-01 00:00:00"),
         (2, None, "2024-01-01 00:00:01")],
        "id long, lat double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = explode_metrics(
        df,
        [MetricSpec(kind="histogram", name="lat_h", field_="lat")],
        tags=["id"],
    ).collect()
    # histogram config kind emits a distribution VALUE; the
    # null-field row emits no metric at all
    assert len(out) == 1
    assert out[0].kind == "distribution" and out[0].value == 10.0


def test_merge_metric_stream_null_kind_rows_ignored(spark):
    from vector_spark.operators.aggregate import merge_metric_stream

    df = spark.createDataFrame(
        [("m", None, 5.0, "a", "2024-01-01 00:00:00"),
         ("m", "incremental", 1.0, "b", "2024-01-01 00:10:00"),
         ("m", "incremental", 2.0, "c", "2024-01-01 00:20:00")],
        "name string, metric_kind string, value double, ord string,"
        " ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = merge_metric_stream(
        df, keys=["name"], metric_kind_col="metric_kind",
        value_col="value", order_col="ord",
    ).collect()[0]
    # a NULL-kind row must not flip the group to last-wins
    assert r.metric_kind == "incremental" and r.value == 8.0


def test_agg_histogram_skips_null_samples(spark):
    from vector_spark.operators.aggregate import (
        distribution_to_agg_histogram,
    )

    df = spark.createDataFrame(
        [(1.0, "2024-01-01 00:00:00"), (None, "2024-01-01 00:00:01")],
        "v double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = distribution_to_agg_histogram(df, "v", bounds=[10.0]).collect()
    assert len(rows) == 1
    assert rows[0].bucket_count == 1 and rows[0].bucket_sum == 1.0
