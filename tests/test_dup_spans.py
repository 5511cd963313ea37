"""ExactSubstr-style duplicated-span detection/removal
(dataops/dedup.py duplicate_spans / remove_duplicate_spans; method:
Lee et al. 2022, arXiv:2107.06499 — sub-document dedup the
reference's whole-event `dedupe` transform has no analogue for)."""

from __future__ import annotations

import re

import pytest

from vector_spark.dataops.dedup import (
    duplicate_spans,
    remove_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED8 = "alpha beta gamma delta epsilon zeta eta theta"


def test_detects_shared_span_with_offsets(spark):
    docs = _docs(spark, [
        (1, SHARED8 + " unique1 tail1 tail2"),
        (2, "prefix2 " + SHARED8 + " other words here"),
        (3, "totally different content with no shared spans at all"),
    ])
    got = sorted(
        tuple(r) for r in duplicate_spans(docs, k=4).collect()
    )
    # 8 shared tokens, k=4 -> 5 windows each, merged to one span;
    # doc 2's span shifts by its 1-token prefix
    assert got == [(1, 0, 8, 8, 5), (2, 1, 9, 8, 5)]


def test_disjoint_spans_stay_separate_islands(spark):
    # two shared runs separated by >k unique tokens in each doc
    docs = _docs(spark, [
        (1, "one two three four u1 u2 u3 u4 u5 five six seven eight"),
        (2, "one two three four v1 v2 v3 v4 v5 five six seven eight"),
    ])
    got = sorted(tuple(r) for r in duplicate_spans(docs, k=4).collect())
    assert got == [
        (1, 0, 4, 4, 1), (1, 9, 13, 4, 1),
        (2, 0, 4, 4, 1), (2, 9, 13, 4, 1),
    ]


def test_within_doc_repeat_is_not_cross_doc(spark):
    # the same phrase twice in ONE doc: min(id)==max(id) -> no span
    docs = _docs(spark, [
        (1, "rep rep rep rep middle rep rep rep rep"),
        (2, "nothing in common here at all friends"),
    ])
    assert duplicate_spans(docs, k=4).count() == 0


def test_min_docs_three(spark):
    docs = _docs(spark, [
        (1, SHARED8), (2, SHARED8),
        (3, "unrelated text that shares nothing with the others"),
    ])
    assert duplicate_spans(docs, k=4, min_docs=3).count() == 0
    docs3 = _docs(spark, [(1, SHARED8), (2, SHARED8), (3, SHARED8)])
    got = duplicate_spans(docs3, k=4, min_docs=3).collect()
    assert {r.doc_id for r in got} == {1, 2, 3}


def test_max_window_df_caps_boilerplate(spark):
    rows = [(i, SHARED8) for i in range(1, 11)]
    # every window occurs 10x; a df cap of 5 drops them all
    assert duplicate_spans(
        _docs(spark, rows), k=4, max_window_df=5
    ).count() == 0
    assert duplicate_spans(_docs(spark, rows), k=4).count() == 10


def test_short_and_empty_docs_yield_nothing(spark):
    docs = _docs(spark, [
        (1, "one two three"), (2, "one two three"), (3, ""),
    ])
    # 3 tokens < k=4: no windows at all
    assert duplicate_spans(docs, k=4).count() == 0


def test_removal_keeps_canonical_occurrence(spark):
    docs = _docs(spark, [
        (1, SHARED8 + " unique1 tail1 tail2"),
        (2, "prefix2 " + SHARED8 + " other words here"),
        (3, "totally different content with no shared spans at all"),
    ])
    got = {r.doc_id: r for r in remove_duplicate_spans(docs, k=4).collect()}
    # doc 1 is canonical (min doc_id): untouched
    assert got[1].n_removed_tokens == 0
    assert got[1].clean_text == (SHARED8 + " unique1 tail1 tail2")
    # doc 2 loses exactly the 8 shared tokens
    assert got[2].n_removed_tokens == 8
    assert got[2].clean_text == "prefix2 other words here"
    assert got[3].n_removed_tokens == 0
    assert got[2].n_tokens == 12


def test_removal_normalizes_case_and_whitespace(spark):
    # detection hashes lowercase/ws-normalized tokens; the rewrite is
    # over the same normalized stream, so mixed case still matches
    docs = _docs(spark, [
        (1, "Alpha Beta  Gamma Delta Epsilon"),
        (2, "alpha beta gamma delta epsilon plus more stuff here"),
    ])
    got = {r.doc_id: r for r in remove_duplicate_spans(docs, k=5).collect()}
    assert got[1].n_removed_tokens == 0
    assert got[2].clean_text == "plus more stuff here"


def test_plan_shape_single_corpus_exchange(spark):
    """The corpus-sized data crosses exactly ONE exchange (wh);
    the only other exchange is the island merge over the hit set."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        duplicate_spans(docs, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan
    assert "Join" not in plan, plan


def test_sf_corpus_has_real_spans(spark):
    out = duplicate_spans(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        k=10,
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.span_end - r.span_start == r.span_tokens for r in rows)
    assert all(r.span_tokens >= 10 for r in rows)
