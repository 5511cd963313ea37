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


def _role_turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_pack_conversations_contiguous_fill(spark):
    from vector_spark.dataops.conversations import pack_conversations

    # one shard so the fill order is the conv_id order
    df = _role_turns(
        spark,
        [
            ("a", 0, "user", "one two three"),       # 3 tokens
            ("a", 1, "assistant", "four five"),      # 2 tokens -> a: 5
            ("b", 0, "user", "x " * 7),              # b: 7
            ("c", 0, "user", "y y"),                 # c: 2
        ],
    )
    rows = {
        r.conv_id: r
        for r in pack_conversations(df, budget=6, n_shards=1).collect()
    }
    # layout in conv_id order: a(5 tok)@0, b(7)@5, c(2)@12
    assert (rows["a"].pack_id, rows["a"].pack_pos) == (0, 0)
    # b STARTS inside pack 0 (pos 5) and overflows it - contiguous rule
    assert (rows["b"].pack_id, rows["b"].pack_pos) == (0, 5)
    assert (rows["c"].pack_id, rows["c"].pack_pos) == (2, 0)
    assert rows["a"].conv_tokens == 5 and rows["a"].n_turns == 2
    assert all(r.shard == 0 for r in rows.values())


def test_pack_conversations_never_splits_a_conversation(spark):
    from vector_spark.dataops.conversations import pack_conversations

    df = _role_turns(
        spark,
        [("c%02d" % i, j, "user", "w w w") for i in range(20) for j in range(2)],
    )
    out = pack_conversations(df, budget=10, n_shards=4)
    # each conversation appears exactly once (whole-conv assignment)
    assert out.count() == 20
    assert out.select("conv_id").distinct().count() == 20


def test_conversation_quality_flags(spark):
    from vector_spark.dataops.conversations import conversation_quality

    df = _role_turns(
        spark,
        [
            # clean conversation: alternating, user opens, assistant closes
            ("good", 0, "user", "hello"),
            ("good", 1, "assistant", "hi there!"),
            # violations: assistant opens, double-assistant, blank, user closes
            ("bad", 0, "assistant", "hi"),
            ("bad", 1, "assistant", ""),
            ("bad", 2, "user", "??"),
        ],
    )
    rows = {r.conv_id: r for r in conversation_quality(df).collect()}
    g, b = rows["good"], rows["bad"]
    assert g.quality_ok and g.n_role_repeats == 0 and g.n_blank == 0
    assert g.starts_with_user and g.ends_with_assistant
    assert g.assistant_chars == 9 and g.user_chars == 5
    assert abs(g.char_ratio - 9 / 5) < 1e-12
    assert not b.quality_ok
    assert b.n_role_repeats == 1 and b.n_blank == 1
    assert not b.starts_with_user and not b.ends_with_assistant


def test_conversation_quality_single_turn_not_null(spark):
    from vector_spark.dataops.conversations import conversation_quality

    # a 1-turn conversation's lag is all-NULL; the repeat count must
    # be 0, not NULL (sum-of-NULLs trap)
    df = _role_turns(spark, [("solo", 0, "user", "hi")])
    r = conversation_quality(df).collect()[0]
    assert r.n_role_repeats == 0
    assert r.quality_ok is False  # no assistant close


def test_repair_conversations_merges_runs(spark):
    from vector_spark.dataops.conversations import repair_conversations

    df = _role_turns(
        spark,
        [
            ("a", 0, "user", "part one"),
            ("a", 1, "user", "part two"),
            ("a", 2, "assistant", "reply"),
            ("a", 3, "user", "followup"),
        ],
    )
    out = sorted(
        repair_conversations(df).collect(), key=lambda r: r.turn_idx
    )
    assert [r.turn_idx for r in out] == [0, 1, 2]
    assert [r.role for r in out] == ["user", "assistant", "user"]
    assert out[0].text == "part one\x1fpart two"  # reversible join
    assert out[0].n_merged == 2 and out[0].first_src_turn == 0
    assert out[1].text == "reply" and out[1].n_merged == 1
    assert out[2].first_src_turn == 3


def test_repair_conversations_already_alternating_is_identity(spark):
    from vector_spark.dataops.conversations import repair_conversations

    rows = [("a", i, "user" if i % 2 == 0 else "assistant", f"t{i}")
            for i in range(6)]
    out = sorted(
        repair_conversations(_role_turns(spark, rows)).collect(),
        key=lambda r: r.turn_idx,
    )
    assert [(r.turn_idx, r.role, r.text, r.n_merged) for r in out] == [
        (i, "user" if i % 2 == 0 else "assistant", f"t{i}", 1)
        for i in range(6)
    ]


def test_template_replies_detects_repeats(spark):
    from vector_spark.dataops.conversations import template_replies

    df = _role_turns(
        spark,
        [
            ("a", 0, "user", "hi"),
            ("a", 1, "assistant", "I cannot help with that."),
            ("b", 0, "user", "yo"),
            ("b", 1, "assistant", "i cannot help with that. "),  # normalizes equal
            ("b", 3, "assistant", "unique reply"),
            ("c", 1, "assistant", "I cannot help with that."),
        ],
    )
    rows = template_replies(df).collect()
    assert len(rows) == 1  # only the canned refusal crosses min_uses
    r = rows[0]
    assert r.n_uses == 3 and r.n_convs == 3
    assert r.first_use == "a:000001"


def test_template_replies_role_scoped(spark):
    from vector_spark.dataops.conversations import template_replies

    # repeated USER text must not surface when scanning assistant turns
    df = _role_turns(
        spark,
        [("a", 0, "user", "same"), ("b", 0, "user", "same")],
    )
    assert template_replies(df).count() == 0


def test_sft_pairs_mines_user_assistant_adjacency(spark):
    from vector_spark.dataops.conversations import sft_pairs

    df = _role_turns(
        spark,
        [
            ("a", 0, "user", "q1"),
            ("a", 1, "assistant", "a1"),     # pair
            ("a", 2, "assistant", "a2"),     # prev is assistant: no pair
            ("a", 3, "system", "note"),
            ("a", 4, "assistant", "a3"),     # prev is system: no pair
            ("b", 0, "assistant", "cold"),   # no predecessor: no pair
            ("b", 1, "user", "q2"),
            ("b", 2, "assistant", "a4"),     # pair
        ],
    )
    rows = sorted(sft_pairs(df).collect(), key=lambda r: (r.conv_id, r.turn_idx))
    assert [(r.conv_id, r.turn_idx, r.prompt, r.response) for r in rows] == [
        ("a", 1, "q1", "a1"),
        ("b", 2, "q2", "a4"),
    ]


def test_context_windows_bounded_prefix(spark):
    from vector_spark.dataops.conversations import context_windows

    rows = [("a", i, "user" if i % 2 == 0 else "assistant", f"t{i}")
            for i in range(7)]
    out = {
        r.turn_idx: r
        for r in context_windows(_role_turns(spark, rows), k=3).collect()
    }
    assert set(out) == {1, 3, 5}  # assistant turns only
    # turn 1 sees only turn 0; turn 5 sees exactly the 3 preceding
    assert out[1].context == "user: t0" and out[1].context_len == 1
    assert out[5].context_len == 3
    assert out[5].context == "user: t2\x1fassistant: t3\x1fuser: t4"
    assert out[5].response == "t5"


def test_pack_conversations_rejects_zero_shards(spark):
    import pytest

    from vector_spark.dataops.conversations import pack_conversations

    df = _role_turns(spark, [("a", 0, "user", "hi")])
    with pytest.raises(ValueError, match="n_shards"):
        pack_conversations(df, budget=10, n_shards=0)


def test_conversation_quality_null_text_not_poisoned(spark):
    from vector_spark.dataops.conversations import conversation_quality

    # all-NULL text: n_blank must be 0 (oracle's CASE..ELSE 0), not NULL
    df = spark.createDataFrame(
        [("a", 0, "user", None), ("a", 1, "assistant", None)],
        "conv_id string, turn_idx int, role string, text string",
    )
    r = conversation_quality(df).collect()[0]
    assert r.n_blank == 0
    assert r.quality_ok is False or r.quality_ok is True  # never NULL


def test_tool_transitions_skips_non_calls(spark):
    from vector_spark.dataops.conversations import tool_transitions

    df = spark.createDataFrame(
        [
            # conv a: search, (user turn, no tool), python, none, search
            ("a", 0, "search"), ("a", 1, None), ("a", 2, "python"),
            ("a", 3, "none"), ("a", 4, "search"),
            # conv b: python -> python (adjacent), then nothing
            ("b", 0, "python"), ("b", 1, "python"),
            # conv c: single call -> no transition
            ("c", 0, "browser"),
        ],
        "conv_id string, turn_idx int, tool string",
    )
    rows = {
        (r.prev_tool, r.next_tool): r
        for r in tool_transitions(df).collect()
    }
    # 'none' and NULL are not calls: a's chain is search->python->search
    assert rows[("search", "python")].n_transitions == 1
    assert rows[("python", "search")].n_transitions == 1
    assert rows[("python", "python")].n_transitions == 1
    assert rows[("python", "python")].n_convs == 1
    assert ("browser", "browser") not in rows
    assert len(rows) == 3


def test_turn_latency_gap_arithmetic(spark):
    from vector_spark.dataops.conversations import turn_latency

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    df = spark.createDataFrame(
        [
            ("a", 0, "user", at(0)),
            ("a", 1, "assistant", at(2.5)),     # user->assistant 2.5s
            ("a", 2, "user", at(10)),           # assistant->user 7.5s
            ("a", 3, "assistant", at(10.75)),   # user->assistant 0.75s
            ("b", 0, "user", at(100)),          # no gap (first turn)
        ],
        "conv_id string, turn_idx int, role string, ts timestamp",
    )
    rows = {(r.prev_role, r.role): r for r in turn_latency(df).collect()}
    ua = rows[("user", "assistant")]
    assert ua.n_gaps == 2
    assert abs(ua.avg_secs - 1.625) < 1e-9
    assert abs(ua.max_secs - 2.5) < 1e-9
    assert abs(ua.p50_secs - 1.625) < 1e-9  # interpolated median of 2
    au = rows[("assistant", "user")]
    assert au.n_gaps == 1 and abs(au.avg_secs - 7.5) < 1e-9
    # conv b's opening turn contributes nothing
    assert len(rows) == 2


def test_retry_loops_islands(spark):
    from vector_spark.dataops.conversations import retry_loops

    df = spark.createDataFrame(
        [
            # conv a: ERROR search x3 (run), then ok, then ERROR search
            # again (new run, too short), then ERROR python x2 (run)
            ("a", 0, "search", "ERROR"),
            ("a", 1, "search", "ERROR"),
            ("a", 2, "search", "ERROR"),
            ("a", 3, "search", "INFO"),
            ("a", 4, "search", "ERROR"),
            ("a", 5, "python", "ERROR"),
            ("a", 6, "python", "ERROR"),
            # conv b: ERROR runs broken by a non-adjacent turn_idx gap
            # (an intervening non-tool turn was filtered upstream)
            ("b", 0, "browser", "ERROR"),
            ("b", 2, "browser", "ERROR"),
            # conv c: tool change breaks the run even when adjacent
            ("c", 0, "search", "ERROR"),
            ("c", 1, "python", "ERROR"),
            # 'none' / NULL tools are never eligible
            ("d", 0, "none", "ERROR"),
            ("d", 1, None, "ERROR"),
        ],
        "conv_id string, turn_idx int, tool string, level string",
    )
    out = sorted(
        retry_loops(df, min_len=2).collect(),
        key=lambda r: (r.conv_id, r.start_turn),
    )
    assert [
        (r.conv_id, r.tool, r.start_turn, r.end_turn, r.run_len)
        for r in out
    ] == [
        ("a", "search", 0, 2, 3),
        ("a", "python", 5, 6, 2),
    ]
