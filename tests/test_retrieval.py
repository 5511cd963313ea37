"""dataops/retrieval.py: BM25 keyword retrieval, token-window
chunking, int8 embedding quantization — semantics + plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import pytest

from vector_spark.dataops.retrieval import (
    assemble_packs,
    bm25_topk,
    chunk_documents,
    dequantized_embeddings,
    doc_term_postings,
    lm_topk,
    pack_documents,
    quantize_int8,
    rrf_fuse,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffles data between stages"),
            (2, "broadcast joins avoid the shuffle"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "shuffle shuffle shuffle everywhere"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


# -- postings -----------------------------------------------------------------


def test_postings_tf_and_dl(spark):
    rows = {
        (r.doc_id, r.term): (r.dl, r.tf)
        for r in doc_term_postings(_docs(spark)).collect()
    }
    assert rows[(4, "shuffle")] == (4, 3.0)
    assert rows[(1, "spark")] == (5, 1.0)
    # empty doc contributes no postings
    assert not any(d == 5 for d, _ in rows)


# -- BM25 ---------------------------------------------------------------------


def test_bm25_self_retrieval_ranks_first(spark):
    docs = _docs(spark).filter(F.col("doc_id") != 5)
    queries = spark.createDataFrame(
        [(1, "quick brown fox")], "query_id int, query_text string"
    )
    top = bm25_topk(docs, queries, k=3).orderBy("rank").collect()
    assert top[0].doc_id == 3 and top[0].rank == 1
    assert top[0].score > 0


def test_bm25_matches_hand_computation(spark):
    # 2 docs, 1-term query: idf = ln(1 + (2 - 1 + .5)/(1 + .5)) = ln 2
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(0, "alpha")], "query_id int, query_text string"
    )
    [row] = bm25_topk(docs, queries, k=5).collect()
    # dl = avgdl = 2 -> tf term = (1*2.2)/(1 + 1.2) = 1.0
    assert row.doc_id == 1
    assert abs(row.score - round(math.log(2.0), 6)) < 1e-6


def test_bm25_ignores_repeated_query_terms(spark):
    docs = _docs(spark).filter(F.col("doc_id") != 5)
    q1 = spark.createDataFrame(
        [(0, "shuffle")], "query_id int, query_text string"
    )
    q2 = spark.createDataFrame(
        [(0, "shuffle shuffle")], "query_id int, query_text string"
    )
    r1 = {(r.doc_id, r.score) for r in bm25_topk(docs, q1).collect()}
    r2 = {(r.doc_id, r.score) for r in bm25_topk(docs, q2).collect()}
    assert r1 == r2


def test_bm25_query_side_broadcasts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    queries = spark.createDataFrame(
        [(0, "hash join")], "query_id int, query_text string"
    )
    df = bm25_topk(docs, queries)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # query vocabulary + per-term df + corpus stats all broadcast;
    # the postings side must never sort-merge against them
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- query-likelihood LM ------------------------------------------------------


def test_lm_self_retrieval_ranks_first(spark):
    docs = _docs(spark).filter(F.col("doc_id") != 5)
    queries = spark.createDataFrame(
        [(1, "quick brown fox")], "query_id int, query_text string"
    )
    top = lm_topk(docs, queries, k=3).orderBy("rank").collect()
    assert top[0].doc_id == 3 and top[0].rank == 1


def test_lm_matches_hand_computation(spark):
    # 2 docs x 2 tokens, query 'alpha': cf=1, |C|=4 -> p=0.25, mu=2
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(0, "alpha")], "query_id int, query_text string"
    )
    [row] = lm_topk(docs, queries, k=5, mu=2.0).collect()
    # only doc 1 matches; score = ln((1 + 2*.25)/(2 + 2)) = ln(1.5/4)
    assert row.doc_id == 1
    assert abs(row.score - round(math.log(1.5 / 4.0), 6)) < 1e-6


def test_lm_missing_term_component_included(spark):
    # two docs both matching 'alpha'; doc 2 also contains noise terms
    # so its dl is larger -> lower score for the SAME matched tf
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "alpha beta")], "query_id int, query_text string"
    )
    rows = {r.doc_id: r for r in lm_topk(docs, queries, k=5).collect()}
    assert rows[1].rank == 1 and rows[2].rank == 2
    assert rows[1].score > rows[2].score


# -- RRF fusion ---------------------------------------------------------------


def test_rrf_hand_computed(spark):
    r1 = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id int, doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id int, doc_id long, rank int"
    )
    rows = {r.doc_id: r for r in rrf_fuse([r1, r2], k=10).collect()}
    # doc 11: 1/62 + 1/61 beats doc 10: 1/61 and doc 12: 1/62
    assert rows[11].rank == 1 and rows[11].n_systems == 2
    assert rows[10].rank == 2 and rows[12].rank == 3
    assert abs(rows[11].rrf_score - round(1 / 62 + 1 / 61, 6)) < 1e-6


def test_rrf_requires_input():
    with pytest.raises(ValueError):
        rrf_fuse([])


# -- packing ------------------------------------------------------------------


def test_pack_contiguous_fill(spark):
    docs = spark.createDataFrame(
        [
            (1, "s", "a b c"),        # 3 tokens, before=0  -> pack 0 pos 0
            (2, "s", "d e"),          # 2 tokens, before=3  -> pack 0 pos 3
            (3, "s", "f g h i j k"),  # 6 tokens, before=5  -> pack 1 pos 1
            (4, "s", "l"),            # 1 token,  before=11 -> pack 2 pos 3
            (5, "t", "m n"),          # other group restarts at before=0
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        r.doc_id: r
        for r in pack_documents(docs, budget=4, group_col="source").collect()
    }
    assert (rows[1].pack_id, rows[1].pack_pos) == (0, 0)
    assert (rows[2].pack_id, rows[2].pack_pos) == (0, 3)
    assert (rows[3].pack_id, rows[3].pack_pos) == (1, 1)
    assert (rows[4].pack_id, rows[4].pack_pos) == (2, 3)
    assert (rows[5].pack_id, rows[5].pack_pos) == (0, 0)


def test_assemble_packs_roundtrip(spark):
    docs = spark.createDataFrame(
        [
            (1, "s", "a b c"),
            (2, "s", "d e"),
            (3, "s", "f g h i j k"),
            (4, "s", "l"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        (r.group, r.pack_id): r
        for r in assemble_packs(docs, budget=4, group_col="source").collect()
    }
    # pack 0: docs 1+2 (texts joined in pack order); pack 1: doc 3;
    # pack 2: doc 4
    assert rows[("s", 0)].pack_text == "a b c\x1ed e"
    assert rows[("s", 0)].n_docs == 2 and rows[("s", 0)].pack_tokens == 5
    assert rows[("s", 1)].pack_text == "f g h i j k"
    assert rows[("s", 2)].pack_text == "l"


def test_token_quota_greedy_prefix(spark):
    from vector_spark.dataops.mixing import token_quota_filter

    docs = spark.createDataFrame(
        [
            (1, "a", "w x y"),   # cum 3 <= 5 kept
            (2, "a", "w x"),     # cum 5 <= 5 kept
            (3, "a", "w"),       # cum 6 > 5  dropped
            (4, "b", "w x y z"), # default quota 2 -> dropped
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        r.doc_id: r
        for r in token_quota_filter(docs, {"a": 5}, default_quota=2).collect()
    }
    assert [rows[i].kept for i in (1, 2, 3, 4)] == [True, True, False, False]
    assert rows[3].cum_tokens == 6


def test_pack_budget_validation(spark):
    with pytest.raises(ValueError):
        pack_documents(_docs(spark).withColumn("source", F.lit("s")), budget=0)


def test_pack_single_window_shuffle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    df = pack_documents(docs, budget=512, group_col="source")
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the per-group window sort
    assert plan.count("Exchange") - plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange hashpartitioning") == 1


# -- chunking -----------------------------------------------------------------


def test_chunk_windows_and_tail_clamp(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    rows = (
        chunk_documents(docs, chunk_size=4, stride=3)
        .orderBy("chunk_idx")
        .collect()
    )
    # starts 0,3,6,9 -> windows [0:4) [3:7) [6:10) [9:10)
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    assert [r.chunk_tokens for r in rows] == [4, 4, 4, 1]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[3].chunk_text == "t9"


def test_chunk_empty_doc_produces_no_chunks(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_size=4, stride=3).collect()
    assert {r.doc_id for r in rows} == {3}


def test_chunk_plan_is_shuffle_free(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    df = chunk_documents(docs)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -- quantization -------------------------------------------------------------


def test_quantize_roundtrip_bounds(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5, 4.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8(emb).collect()}
    q1 = rows[1]
    assert q1.qvec == [32, -64, 16, 127]  # scale = 4/127
    assert abs(q1.scale - round(4.0 / 127.0, 6)) < 1e-9
    assert 0 <= q1.recon_mse < (q1.scale / 2) ** 2 + 1e-12
    # all-zero vector: scale 0, zero code, zero error
    q2 = rows[2]
    assert q2.qvec == [0, 0, 0, 0]
    assert q2.scale == 0.0 and q2.recon_mse == 0.0


def test_quantize_codes_in_int8_range(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    out = quantize_int8(emb)
    bad = out.filter(
        F.exists("qvec", lambda q: (q > 127) | (q < -127))
    ).count()
    assert bad == 0


def test_dequantized_error_bounded_by_half_step(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5, 4.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r.embedding for r in dequantized_embeddings(emb).collect()}
    step = 4.0 / 127.0
    for orig, dq in zip([1.0, -2.0, 0.5, 4.0], rows[1]):
        assert abs(orig - dq) <= step / 2 + 1e-12
    assert rows[2] == [0.0, 0.0, 0.0, 0.0]


def test_quantized_topk_recall_vs_exact(spark):
    # int8 quantization must preserve nearly all of the exact top-10
    from vector_spark.dataops.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    exact = brute_force_topk(emb, emb.filter(F.col("vec_id") < 8), k=10)
    dq = dequantized_embeddings(emb)
    quant = brute_force_topk(dq, dq.filter(F.col("vec_id") < 8), k=10)
    e = {(r.q_id, r.neighbor_id) for r in exact.collect()}
    q = {(r.q_id, r.neighbor_id) for r in quant.collect()}
    recall = len(e & q) / len(e)
    assert recall >= 0.9, f"quantized recall {recall}"


def test_quantize_plan_is_shuffle_free(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    df = quantize_int8(emb)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
