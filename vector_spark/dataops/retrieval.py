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

from vector_spark.dataops.packing import contiguous_fill
from vector_spark.dataops.text import join_sorted, ordered_struct, tokens


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


def build_candidates(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
) -> dict:
    """Shared retrieval scaffolding for the lexical rankers:
    ``{"cand", "qterms", "stats"}``.

    - ``cand``: postings restricted to the query vocabulary,
      materialized ONCE (lazy localCheckpoint) — every ranker's df /
      cf / scoring pass reads these same blocks instead of re-running
      the scan -> tokenize -> explode -> groupBy index build.
    - ``qterms``: distinct (query_id, term).
    - ``stats``: 1-row (n_docs, avgdl, c_len) corpus statistics.

    Build it once and hand it to several rankers (BM25 + QL for RRF
    fusion) so hybrid retrieval costs one index pass, not one per
    ranker.
    """
    postings = doc_term_postings(docs, id_col, text_col)
    # project the doc length ONCE before aggregating: Catalyst does
    # not reliably CSE duplicate expressions ACROSS aggregate
    # functions, so avg(size(tokens)) + sum(size(tokens)) would
    # tokenize every document twice (same trap as shingles /
    # dequantized_embeddings)
    stats = docs.select(
        F.size(tokens(F.col(text_col))).alias("_dl")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("_dl").alias("avgdl"),
        F.sum("_dl").cast("double").alias("c_len"),
    )
    qterms = (
        queries.select(
            F.col(qid_col).alias("query_id"),
            F.explode(tokens(F.col(qtext_col))).alias("term"),
        )
        .distinct()
    )
    qvocab = qterms.select("term").distinct()
    # Materialize the candidate postings ONCE: they feed several
    # consumers (per-term df/cf aggregates and each ranker's scoring
    # join) and Spark does not dedupe common subplans, so without
    # this the whole index build would run once per consumer.
    # localCheckpoint (lazy) keeps the blocks only while the plans
    # reference them — the ContextCleaner reclaims them — and the
    # candidate set is bounded by |query vocab| x df, the same
    # magnitude the scoring shuffles move anyway.
    cand = postings.join(F.broadcast(qvocab), "term").localCheckpoint(
        eager=False
    )
    return {"cand": cand, "qterms": qterms, "stats": stats}


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
    candidates: dict | None = None,
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
    c = candidates or build_candidates(
        docs, queries, id_col, text_col, qid_col, qtext_col
    )
    cand, qterms, stats = c["cand"], c["qterms"], c["stats"]
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


def lm_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    mu: float = 2000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
    candidates: dict | None = None,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking — the classic
    second lexical ranker beside BM25 (Zhai & Lafferty):

        score(q, d) = sum_t ln((tf + mu*p_t) / (dl + mu)),
        p_t = cf(t) / |C|

    Candidates are docs sharing >=1 query term; their scores still
    include the missing-term components via the split-sum identity
    ``score = S_q - n_q*ln(dl + mu) + sum_matched [ln(tf + mu*p_t)
    - ln(mu*p_t)]`` where S_q = sum_t ln(mu*p_t) — so only MATCHED
    postings are ever joined, never the candidate x query-vocab
    cross product. Collection frequencies come from the same
    query-restricted postings (they are global for those terms).
    Ties rank on the 6-dp-rounded score then doc_id.
    """
    c = candidates or build_candidates(
        docs, queries, id_col, text_col, qid_col, qtext_col
    )
    cand, qterms, stats = c["cand"], c["qterms"], c["stats"]
    cfreq = (
        cand.groupBy("term")
        .agg(F.sum("tf").alias("cf"))
        .crossJoin(F.broadcast(stats.select("c_len")))
        .select("term", (F.col("cf") / F.col("c_len")).alias("p_t"))
    )
    # per-query constants: S_q = sum_t ln(mu*p_t), n_q = |q| — every
    # query term must exist in the collection (p_t > 0); terms absent
    # from the corpus are dropped from the query (standard QL
    # convention: their likelihood is undefined without a fallback
    # smoothing floor)
    qstats = (
        qterms.join(F.broadcast(cfreq), "term")
        .groupBy("query_id")
        .agg(
            F.sum(F.log(mu * F.col("p_t"))).alias("s_q"),
            F.count(F.lit(1)).cast("double").alias("n_q"),
        )
    )
    matched = (
        cand.join(F.broadcast(qterms), "term")
        .join(F.broadcast(cfreq), "term")
        .withColumn(
            "delta",
            F.log(F.col("tf") + mu * F.col("p_t"))
            - F.log(mu * F.col("p_t")),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("delta").alias("m_sum"), F.first("dl").alias("dl"))
    )
    scored = matched.join(F.broadcast(qstats), "query_id").select(
        "query_id",
        "doc_id",
        (
            F.col("s_q")
            - F.col("n_q") * F.log(F.col("dl") + mu)
            + F.col("m_sum")
        ).alias("score"),
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


def rrf_fuse(
    rankings: list[DataFrame], k: int = 10, c: float = 60.0
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): fuse any number of
    per-query rankings — lexical, dense, whatever — by
    ``sum_r 1/(c + rank_r)``. Rank-only fusion needs no score
    calibration between systems, which is why it is the default
    hybrid-retrieval combiner. Input frames carry
    (query_id, doc_id, rank); ties on the fused score break on how
    many systems retrieved the doc, then doc_id.

    Scale shape: each input is already a top-k (bounded per query),
    so the union + groupBy moves k*|systems| rows per query.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    u = rankings[0].select("query_id", "doc_id", "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select("query_id", "doc_id", "rank"))
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum(1.0 / (F.lit(c) + F.col("rank"))).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_systems"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("rrf_score", 6)),
        F.desc("n_systems"),
        F.asc("doc_id"),
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.round("rrf_score", 6).alias("rrf_score"),
            F.col("n_systems").cast("int").alias("n_systems"),
        )
    )


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget sequence packing — assemble training batches by
    filling ``budget``-token packs with whole documents:
    (doc_id, group, n_tokens, pack_id, pack_pos).

    Contiguous-fill contract (the deterministic streaming-packer
    rule): documents are laid out end-to-end in (group, doc_id)
    order and a document belongs to the pack its FIRST token lands
    in — ``pack_id = floor(exclusive_cumsum / budget)`` — so an
    oversize or straddling document overflows its pack rather than
    opening a new one. This is a single window per group (one
    shuffle, sorted within partition); groups are independent, so at
    100 TB packing parallelizes across shards/sources with no global
    coordination — exactly why real packers work per-shard.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("group"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    return contiguous_fill(base, "group", "doc_id", "n_tokens", budget)


def assemble_packs(
    docs: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\x1e",
) -> DataFrame:
    """Materialize the training sequences that ``pack_documents``
    assigns: (group, pack_id, n_docs, pack_tokens, pack_text) with
    documents joined in pack order by a record separator (0x1e by
    default — not producible by the whitespace tokenizer, so the
    join is reversible).

    Two shuffles total: the packing window (inherited) and the
    groupBy(group, pack_id) assembly. The per-pack collect is
    bounded by ``budget`` tokens — bounded per-key state, safe at
    any corpus size.
    """
    packed = pack_documents(docs, budget, group_col, id_col, text_col)
    texts = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    return (
        packed.join(texts, "doc_id")
        .groupBy("group", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            join_sorted(
                F.collect_list(ordered_struct("pack_pos", F.col("_text"))),
                sep,
            ).alias("pack_text"),
        )
    )


def dequantized_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """The int8-quantized store as a search view: quantize with the
    EXACT (unrounded) per-vector scale and immediately dequantize —
    ``x -> round(x * 127/max|x|) * max|x|/127`` — so retrieval
    queries run against what the compressed store actually holds.
    Every arithmetic step is order-fixed IEEE double, so an SQL
    oracle reproduces the reconstructed vectors bit-for-bit. Zero
    shuffle; feeds brute_force_topk/LSH unchanged.
    """
    # scale is projected to a NAMED column before the element lambda
    # references it: Catalyst does no CSE inside lambda bodies, so an
    # inlined scale subtree (an array_max scan) would re-evaluate per
    # ELEMENT (~2 x dim array scans per row). A multiply-referenced
    # non-cheap alias survives CollapseProject.
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = emb.select(F.col(id_col).alias(id_col), vec.alias("_v")).select(
        id_col,
        "_v",
        (
            F.array_max(F.transform("_v", lambda x: F.abs(x))) / F.lit(127.0)
        ).alias("_scale"),
    )
    s = F.col("_scale")
    dq = F.when(s == 0, F.transform("_v", lambda x: F.lit(0.0))).otherwise(
        F.transform(
            "_v", lambda x: F.round(x / s, 0).cast("int").cast("double") * s
        )
    )
    return staged.select(id_col, dq.alias(vec_col))


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
    # same CSE-in-lambda discipline as dequantized_embeddings: the
    # scale lands in a named column BEFORE any element lambda uses it
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = emb.select(
        F.col(id_col).alias("vec_id"), vec.alias("_vec")
    ).select(
        "vec_id",
        "_vec",
        (
            F.array_max(F.transform("_vec", lambda x: F.abs(x)))
            / F.lit(127.0)
        ).alias("_scale"),
    )
    s = F.col("_scale")
    qvec = F.when(s == 0, F.transform("_vec", lambda x: F.lit(0))).otherwise(
        F.transform("_vec", lambda x: F.round(x / s, 0).cast("int"))
    )
    df = staged.select("vec_id", "_scale", qvec.alias("qvec"), "_vec")
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
