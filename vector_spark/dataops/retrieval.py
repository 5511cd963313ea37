"""Keyword retrieval + document chunking + embedding quantization —
the retrieval-side operations of a training-data pipeline (build a
BM25 index over the corpus, cut documents into overlapping token
windows for embedding, and compress the resulting vectors to int8
for the ANN store).

Everything is expressed as declarative DataFrame plans:

- ``bm25_topk`` builds the inverted doc-term postings with ONE
  shuffle (explode + partial-agg groupBy), restricts them to the
  query vocabulary via a broadcast semi-join BEFORE any further
  work (at 100 TB you never materialize document frequencies for
  the whole vocabulary when only |Q| terms matter), and ranks with
  a per-query window over the candidate set only.
- ``chunk_documents`` is a zero-shuffle row-local plan: the token
  array is projected once, chunk starts come from ``sequence()``,
  and ``posexplode`` fans out chunks inside the same stage.
- ``quantize_int8`` is a zero-shuffle map (per-vector symmetric
  scale, ``transform`` + ``round``); the reconstruction error is an
  in-order ``aggregate`` fold so an SQL oracle reproduces it
  bit-for-bit.

Reference parity: the reference engine has no retrieval surface —
these extend the corpus-preparation family (dedup / quality /
decontam) that SURVEY.md scopes in for LLM training pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.dataops.text import tokens


def doc_term_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: (doc_id, dl, term, tf).

    One shuffle: explode the (projected-once) token array and
    groupBy (doc_id, term) with map-side partial aggregation. ``dl``
    (doc length in tokens) rides the grouping key — it is
    functionally determined by doc_id, so it adds no cardinality.
    """
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    return (
        toked.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
) -> DataFrame:
    """BM25 top-k document retrieval: (query_id, doc_id, rank, score).

    Lucene-style idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive); repeated query terms count once (classic BM25 ignores
    query-side tf). Ranking ties break on the 6-dp-rounded score then
    doc_id, so the ordering is engine-independent.

    Scale shape: postings shuffle once; the query vocabulary (tiny)
    is broadcast to filter postings BEFORE df aggregation, so both
    ``df`` and the scored candidate set are bounded by the documents
    that share a term with some query — never the whole corpus.
    """
    postings = doc_term_postings(docs, id_col, text_col)
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(tokens(F.col(text_col)))).alias("avgdl"),
    )
    qterms = (
        queries.select(
            F.col(qid_col).alias("query_id"),
            F.explode(tokens(F.col(qtext_col))).alias("term"),
        )
        .distinct()
    )
    qvocab = qterms.select("term").distinct()
    # Materialize the candidate postings ONCE: they feed two
    # consumers (the per-term df aggregate and the scoring join) and
    # Spark does not dedupe common subplans, so without this the
    # whole scan -> tokenize -> explode -> groupBy index build runs
    # twice. localCheckpoint (lazy) keeps the blocks only while the
    # returned plan is referenced — the ContextCleaner reclaims them
    # — and the candidate set is bounded by |query vocab| x df, the
    # same magnitude the scoring shuffle moves anyway.
    cand = postings.join(F.broadcast(qvocab), "term").localCheckpoint(
        eager=False
    )
    dfreq = cand.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        cand.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "rank", F.round("score", 6).alias("score")
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunks for embedding pipelines:
    (doc_id, chunk_idx, chunk_tokens, chunk_text).

    Chunk starts are 0, stride, 2*stride, ... < n_tokens; the last
    window is allowed to be short (it clamps at the document end).
    Zero-token documents produce no chunks. Zero shuffle: the token
    array is projected once and ``posexplode(sequence(...))`` fans
    out inside the same whole-stage-codegen span.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    with_starts = toked.withColumn(
        "starts",
        F.when(
            F.size("toks") > 0,
            F.sequence(
                F.lit(0), F.size("toks") - 1, F.lit(stride)
            ),
        ).otherwise(F.array().cast("array<int>")),
    )
    chunked = with_starts.select(
        "doc_id",
        "toks",
        F.posexplode("starts").alias("chunk_idx", "start"),
    ).withColumn("chunk", F.slice("toks", F.col("start") + 1, chunk_size))
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("chunk").cast("int").alias("chunk_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization for the ANN store:
    (vec_id, scale, qvec, recon_mse).

    scale = max(|x|)/127; q_i = round(x_i/scale) in [-127, 127];
    an all-zero vector quantizes to zeros with scale 0. The
    reconstruction MSE is an IN-ORDER fold over the elements
    (``aggregate``), so an SQL oracle reproduces the float sum
    bit-for-bit. Zero shuffle — pure per-row Column arithmetic that
    scales linearly with the corpus.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = maxabs / F.lit(127.0)
    qvec = F.when(maxabs == 0, F.transform(vec, lambda x: F.lit(0))).otherwise(
        F.transform(vec, lambda x: F.round(x / scale, 0).cast("int"))
    )
    df = emb.select(
        F.col(id_col).alias("vec_id"),
        scale.alias("_scale"),
        qvec.alias("qvec"),
        vec.alias("_vec"),
    )
    recon = F.aggregate(
        F.zip_with(
            "_vec",
            "qvec",
            lambda x, q: (x - q.cast("double") * F.col("_scale"))
            * (x - q.cast("double") * F.col("_scale")),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    ) / F.greatest(F.size("qvec"), F.lit(1))
    return df.select(
        "vec_id",
        F.round("_scale", 6).alias("scale"),
        "qvec",
        F.round(recon, 6).alias("recon_mse"),
    )
