"""Round-2 operator tests: throttle exclude quota, dropped port,
multiline assembly, starts_when/gap sessionization, metric merge."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from vector_spark.operators.throttle import throttle


def test_throttle_exclude_does_not_consume_quota(spark):
    """Mirror of the reference's throttle exclude behavior
    (src/transforms/throttle.rs:144-165): excluded events bypass the
    limiter WITHOUT consuming tokens — a burst of excluded rows must
    not throttle subsequent non-excluded ones."""
    rows = [
        ("k", 0, "ex"), ("k", 1, "ex"), ("k", 2, "ex"),
        ("k", 3, "a"), ("k", 4, "b"), ("k", 5, "c"),
    ]
    df = spark.createDataFrame(rows, "key string, i int, tag string") \
        .withColumn("ts", F.timestamp_seconds(F.col("i")))
    out = throttle(
        df, threshold=2, window_secs=3600, key=["key"], order_by=["i"],
        exclude=F.col("tag") == "ex",
    )
    got = sorted(r["i"] for r in out.collect())
    # all 3 excluded pass; then 2 of 3 normal rows fit the quota
    assert got == [0, 1, 2, 3, 4]


def test_streaming_throttle_exclude_kernel():
    from vector_spark.streaming.stateful import _gcra_kernel

    # sanity: the kernel itself is unchanged; exclude filtering
    # happens around it (see streaming_throttle)
    ts = pd.Series([0.0, 1.0, 2.0])
    keep, _ = _gcra_kernel(ts, float("-inf"), threshold=2, window_secs=10.0)
    assert list(keep) == [True, True, False]


def test_dropped_port_split(spark):
    from vector_spark.functions import with_dropped_port

    df = spark.createDataFrame(
        [("a", False), ("b", True), ("c", None)], "v string, _parse_error boolean"
    )
    ok, dropped = with_dropped_port(df, component_id="p1")
    assert sorted(r["v"] for r in ok.collect()) == ["a", "c"]
    d = dropped.collect()
    assert [r["v"] for r in d] == ["b"]
    meta = d[0]["metadata_dropped"]
    assert meta["reason"] == "error"
    assert meta["component_id"] == "p1"
    assert meta["component_kind"] == "transform"


def test_dropped_port_in_pipeline(spark, transcripts):
    """parse_regex with reroute_dropped exposes `.dropped` as a
    pipeline port; default + dropped row counts partition the input
    (explode-free transform: ok + dropped == total)."""
    from vector_spark.pipeline import PipelineContext, run_pipeline

    spec = {
        "sources": {"t": {}},
        "transforms": {
            "parser": {
                "type": "parse_regex", "inputs": ["t"],
                "reroute_dropped": True,
            },
        },
        "sinks": {
            "ok": {"type": "blackhole", "inputs": ["parser"]},
            "bad": {"type": "blackhole", "inputs": ["parser.dropped"]},
        },
    }
    res = run_pipeline(PipelineContext(spark), spec, {"t": transcripts})
    total = transcripts.count()
    assert res["ok"] + res["bad"] == total
    assert res["bad"] > 0  # the ~2% malformed rows


def test_multiline_whole_and_lines(spark):
    from vector_spark.sources import (
        assemble_multiline_lines,
        assemble_multiline_whole,
    )

    trace = (
        "2024-01-01 ERROR boom\n"
        "  at foo.bar(Baz.java:42)\n"
        "  at qux.quux(Corge.java:7)\n"
        "2024-01-01 INFO fine"
    )
    whole = spark.createDataFrame([("f", trace)], "file string, content string")
    got = assemble_multiline_whole(whole, r"^\d{4}-").orderBy("event_idx").collect()
    assert len(got) == 2
    assert got[0]["event"].count("\n") == 2
    assert got[1]["event"] == "2024-01-01 INFO fine"

    lines = spark.createDataFrame(
        [("f", i, l) for i, l in enumerate(trace.split("\n"))],
        "file string, line_no int, line string",
    )
    got2 = (
        assemble_multiline_lines(lines, r"^\s", mode="continue_through")
        .orderBy("event_idx").collect()
    )
    assert len(got2) == 2 and got2[0]["event"].count("\n") == 2
    # halt_with: ';' terminated statements
    sql_lines = spark.createDataFrame(
        [("g", 0, "SELECT *"), ("g", 1, "FROM t;"), ("g", 2, "DELETE x;")],
        "file string, line_no int, line string",
    )
    got3 = (
        assemble_multiline_lines(sql_lines, r";$", mode="halt_with")
        .orderBy("event_idx").collect()
    )
    assert [r["event"] for r in got3] == ["SELECT *\nFROM t;", "DELETE x;"]


def test_sessionize_starts_when(spark):
    from vector_spark.operators.reduce import sessionize

    rows = [("c", 0, "user"), ("c", 1, "assistant"), ("c", 2, "user"),
            ("c", 3, "tool"), ("c", 4, "assistant")]
    df = spark.createDataFrame(rows, "conv string, i int, role string")
    out = sessionize(
        df, group_by=["conv"], order_by="i",
        starts_when=F.col("role") == "user",
    ).orderBy("i").collect()
    # a user turn OPENS a new session including itself
    assert [r["_session"] for r in out] == [1, 1, 2, 2, 2]


def test_sessionize_gap(spark):
    from vector_spark.operators.reduce import sessionize_gap

    rows = [("u", 0.0), ("u", 10.0), ("u", 50.0), ("u", 55.0)]
    df = spark.createDataFrame(rows, "user string, sec double").withColumn(
        "ts", F.timestamp_seconds(F.col("sec"))
    )
    out = sessionize_gap(
        df, group_by=["user"], ts_col="ts", expire_after_ms=30000
    ).orderBy("sec").collect()
    assert [r["_session"] for r in out] == [0, 0, 1, 1]


def test_merge_metric_stream_kinds(spark):
    from vector_spark.operators.aggregate import merge_metric_stream

    rows = [
        ("c", "incremental", 1.0, "a", 0),
        ("c", "incremental", 2.0, "b", 1),
        ("g", "absolute", 5.0, "a", 0),
        ("g", "absolute", 9.0, "b", 1),
    ]
    df = spark.createDataFrame(
        rows, "name string, metric_kind string, value double, _order string, sec int"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec")))
    out = {
        r["name"]: r["value"]
        for r in merge_metric_stream(df, keys=["name"]).collect()
    }
    assert out == {"c": 3.0, "g": 9.0}  # add vs replace


def test_distribution_histogram(spark):
    from vector_spark.operators.aggregate import distribution_to_agg_histogram

    df = spark.createDataFrame(
        [(5.0,), (50.0,), (500.0,), (5000.0,)], "v double"
    ).withColumn("ts", F.timestamp_seconds(F.lit(0)))
    out = {
        r["bucket"]: r["bucket_count"]
        for r in distribution_to_agg_histogram(
            df, "v", bounds=[10.0, 100.0, 1000.0]
        ).collect()
    }
    assert out == {0: 1, 1: 1, 2: 1, 3: 1}
