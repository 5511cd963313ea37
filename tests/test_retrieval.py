"""dataops/retrieval.py: BM25 keyword retrieval, token-window
chunking, int8 embedding quantization — semantics + plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_spark.dataops.retrieval import (
    bm25_topk,
    chunk_documents,
    doc_term_postings,
    quantize_int8,
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


def test_quantize_plan_is_shuffle_free(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    df = quantize_int8(emb)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
