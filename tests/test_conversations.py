"""dataops/conversations.py: conversation-level dedup + stats."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vector_spark.dataops.conversations import (
    conversation_fingerprints,
    conversation_stats,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def test_fingerprint_exact_dup_detection(spark):
    df = _turns(
        spark,
        [
            ("a", 0, "hi"), ("a", 1, "there"),
            ("b", 0, "hi"), ("b", 1, "there"),   # exact dup of a
            ("c", 0, "there"), ("c", 1, "hi"),   # same turns, other order
        ],
    )
    rows = {r.conv_id: r for r in conversation_fingerprints(df).collect()}
    assert rows["a"].fingerprint == rows["b"].fingerprint
    assert rows["a"].fingerprint != rows["c"].fingerprint  # order-sensitive
    assert rows["a"].canonical_id == "a" and not rows["a"].is_dup
    assert rows["b"].canonical_id == "a" and rows["b"].is_dup
    assert not rows["c"].is_dup
    assert rows["a"].n_turns == 2


def test_fingerprint_order_insensitive_input(spark):
    # shuffled input row order must not change the fingerprint
    rows1 = [("a", i, f"t{i}") for i in range(5)]
    f1 = conversation_fingerprints(_turns(spark, rows1)).collect()[0]
    f2 = conversation_fingerprints(
        _turns(spark, list(reversed(rows1)))
    ).collect()[0]
    assert f1.fingerprint == f2.fingerprint


def test_conversation_stats_rollup(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    parsed = spark.createDataFrame(
        [
            ("a", 0, "user", "none", "hi", "INFO", None, t0),
            ("a", 1, "assistant", "search", "ok!", "INFO", 120,
             t0 + datetime.timedelta(seconds=90)),
            ("a", 2, "assistant", "none", "done", "ERROR", 40,
             t0 + datetime.timedelta(seconds=150)),
        ],
        "conv_id string, turn_idx int, role string, tool string, "
        "text string, level string, latency_ms long, ts timestamp_ntz",
    )
    [row] = conversation_stats(parsed).collect()
    assert row.n_turns == 3
    assert row.n_user == 1 and row.n_assistant == 2
    assert row.n_tool_turns == 1
    assert row.n_errors == 1
    assert row.total_chars == len("hi") + len("ok!") + len("done")
    assert row.latency_sum == 160
    assert row.duration_s == 150


def test_stats_single_shuffle_with_partial_agg(spark):
    parsed = spark.createDataFrame(
        [("a", 0, "user", "none", "x", "INFO", 1,
          datetime.datetime(2024, 1, 1))],
        "conv_id string, turn_idx int, role string, tool string, "
        "text string, level string, latency_ms long, ts timestamp_ntz",
    )
    df = conversation_stats(parsed)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "partial_sum" in plan.lower()
