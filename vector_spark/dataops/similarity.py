"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k: broadcast the (small) query
  set against the full corpus; one scan of the corpus, per-row dot
  products via JVM higher-order functions (zip_with + aggregate —
  no Python in the loop), then a top-k window per query. This is
  the baseline and the verifier for the approximate paths.
* lsh_topk — random-hyperplane LSH: H sign-bits per vector form a
  bucket key; candidates share a bucket in at least one of B tables;
  exact re-rank of candidates only. Sub-linear probe cost at scale.
* ivf_topk — IVF-style coarse quantization without a trained
  codebook: deterministic seed vectors (hash-derived) as centroids,
  probe the nearest n_probe cells. The scale path when the corpus
  outgrows brute force.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    # zero-norm vectors: define cos = 0.0 (no direction, no
    # similarity) instead of Spark's NULL-on-divide-by-zero, which
    # would rank every candidate as an all-NULL "match" for a zero
    # query and silently drop rows from near-dup thresholds
    return F.coalesce(
        _dot(a, b) / F.nullif(_norm(a) * _norm(b), F.lit(0.0)),
        F.lit(0.0),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, neighbor_id, rank, cosine) — exact top-k per query.

    The query side is broadcast (it is small by definition); the
    corpus is scanned once; ranking shuffles only (q, corpus-row)
    score pairs which AQE coalesces. Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("q_id") != F.col("neighbor_id")
    )
    scored = scored.withColumn(
        "cosine", cosine(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplane(dim: int, h: int, table: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (public constants —
    splitmix-style integer scramble mapped to [-1, 1])."""
    out = []
    for d in range(dim):
        z = (h * 0x9E3779B97F4A7C15 + table * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = ((z >> 30) ^ z) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        z = ((z >> 27) ^ z) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        z = (z >> 31) ^ z
        out.append((z % 2000003) / 1000001.0 - 1.0)
    return out


def lsh_bucket(vec_col, dim: int, n_bits: int = 10, table: int = 0):
    """Sign-bit bucket id for one LSH table, as a JVM expression.
    Each per-bit sum runs strictly left-to-right over dims, so the
    DuckDB oracle's list_reduce reproduces it bit-for-bit."""
    bucket = F.lit(0).cast("bigint")
    for h in range(n_bits):
        plane = _hyperplane(dim, h, table)
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(p) for p in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << h).cast("bigint")).otherwise(0)
    return bucket


def lsh_buckets_numpy(
    df: DataFrame,
    dim: int,
    n_bits: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """(id, table, bucket) via ONE BLAS matmul per Arrow batch — the
    100 TB signature kernel (~100x the interpreted-lambda JVM cost of
    lsh_bucket). Same hyperplanes as lsh_bucket; the only divergence
    window is float summation ORDER (BLAS pairwise vs left-to-right),
    which can flip a sign only when a projection sits within one ulp
    of zero — test_similarity_kernels asserts full agreement on the
    test corpora. The oracle-gated queries keep the JVM path; this is
    the drop-in for real-scale runs."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            [_hyperplane(dim, h, t) for h in range(n_bits)]
            for t in range(n_tables)
        ]
    )  # (tables, bits, dim)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        # NULL embeddings land in bucket 0, matching the JVM twin
        # (aggregate over a null array -> null proj -> every bit 0) —
        # np.array over a ragged list with None would kill the stage
        lst = [
            v if v is not None else [0.0] * dim for v in vecs.tolist()
        ]
        mat = np.array(lst, dtype=np.float64)  # (n, dim)
        out = []
        for t in range(n_tables):
            proj = mat @ planes[t].T  # (n, bits)
            out.append(((proj > 0) * weights).sum(axis=1))
        return pd.Series(np.stack(out, axis=1).tolist())

    tb = F.explode(
        F.arrays_zip(
            F.sequence(F.lit(0), F.lit(n_tables - 1)).alias("table"),
            buckets(F.col(vec_col)).alias("bucket"),
        )
    )
    # keep_vec carries the vector through the explode (duplicated
    # n_tables ways) so callers re-ranking candidates don't pay a
    # shuffle-join back to the source for it
    extra = [F.col(vec_col).alias("vec")] if keep_vec else []
    out = df.select(F.col(id_col).alias("id"), *extra, tb.alias("tb"))
    return out.select(
        "id",
        F.col("tb.table").cast("int").alias("table"),
        "tb.bucket",
        *(["vec"] if keep_vec else []),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = bucket collisions in any
    table; exact cosine re-rank of candidates only."""
    def bucketize(df: DataFrame, side: str) -> DataFrame:
        # one scan: explode an array of (table, bucket) structs rather
        # than unioning n_tables re-reads of the source
        tb = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_bucket(F.col(vec_col), dim, n_bits, t).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        )
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            tb.alias("tb"),
        ).select(f"{side}_id", f"{side}_vec", "tb.table", "tb.bucket")

    qb = bucketize(queries, "q")
    cb = bucketize(corpus, "c")
    cand = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_vec", F.col("c_id").alias("neighbor_id"), "c_vec")
        .distinct()
    )
    scored = cand.withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def lsh_topk_fast(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """lsh_topk with the BLAS signature kernel — the registered scale
    path. Buckets come from lsh_buckets_numpy (one matmul per Arrow
    batch instead of n_bits*n_tables interpreted JVM lambda sums, the
    ~100x win measured in test_similarity_kernels); the exact cosine
    re-rank of the (small) candidate set stays JVM-side, strictly
    left-to-right, so the DuckDB oracle reproduces it bit-for-bit.
    Bucket agreement with the JVM/oracle path is exact except when a
    projection sits within one ulp of zero (pairwise vs left-to-right
    float summation); test_similarity_kernels pins full agreement on
    the test corpora."""
    def bucketize(df: DataFrame, side: str) -> DataFrame:
        # keep_vec rides the vector through the explode — no
        # shuffle-join back to the source on the (large) corpus side
        return (
            lsh_buckets_numpy(
                df, dim, n_bits, n_tables,
                id_col=id_col, vec_col=vec_col, keep_vec=True,
            )
            .withColumnRenamed("id", f"{side}_id")
            .withColumnRenamed("vec", f"{side}_vec")
        )

    qb = bucketize(queries, "q")
    cb = bucketize(corpus, "c")
    cand = (
        F.broadcast(qb)  # query side is small by definition
        .join(cb, ["table", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_vec", F.col("c_id").alias("neighbor_id"), "c_vec")
        .distinct()
    )
    scored = cand.withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (id_a, id_b,
    cosine) for every a<b with cosine >= threshold. O(n^2) pairs —
    the correctness baseline; use `embedding_near_dup_lsh` at scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: candidate pairs share an LSH bucket in >=1 table
    (high-cosine pairs collide with high probability), exact cosine
    filter on candidates only. Join cost ~ sum of bucket sizes^2,
    not n^2; the bucket join shuffles on (table, bucket)."""
    tb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    lsh_bucket(F.col(vec_col), dim, n_bits, t).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
    )
    bucketed = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), tb.alias("tb")
    ).select("id", "v", "tb.table", "tb.bucket")
    a = bucketed.select("table", "bucket", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = bucketed.select("table", "bucket", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
    )
    return (
        cand.withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with deterministic centroids: assign each corpus vector to
    its nearest centroid cell (argmax dot), probe the query's nearest
    n_probe cells. Centroids are fixed pseudo-random unit-ish vectors
    — at real scale they'd come from a k-means job; the plumbing
    (cell assignment, probe-join, re-rank) is identical."""
    cents = [
        (c, _hyperplane(dim, c + 101, 7)) for c in range(n_cells)
    ]

    def cell_scores(vec):
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(vec, F.array(*[F.lit(p) for p in cv]), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                for _, cv in cents
            ]
        )

    # The score array must be evaluated ONCE per row: Catalyst does
    # not CSE across higher-order-function lambdas, and CollapseProject
    # re-inlines a multiply-referenced alias — so every derivation
    # below references `scores` exactly once (argmax via struct
    # array-max, not array_position(scores, array_max(scores))).
    # array_max over struct(s, -i) picks the max score and, on exact
    # float ties, the smallest index — identical to the oracle's
    # first-position-of-max.
    idx = F.sequence(F.lit(0), F.lit(n_cells - 1))

    def argmax_cell(scores):
        amax = F.array_max(
            F.zip_with(
                scores, idx,
                lambda s, i: F.struct(s.alias("s"), (-i).alias("ni")),
            )
        )
        return -amax["ni"]

    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        argmax_cell(cell_scores(F.col(vec_col))).alias("cell"),
    )

    def ranked_cells(scores):
        return F.slice(
            F.transform(
                F.array_sort(
                    F.zip_with(
                        scores, idx,
                        lambda s, i: F.struct((-s).alias("neg"), i.alias("i")),
                    )
                ),
                lambda x: x["i"],
            ),
            1,
            n_probe,
        )

    q_scored = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        cell_scores(F.col(vec_col)).alias("scores"),
    )
    q_assigned = q_scored.select(
        "q_id",
        "q_vec",
        F.explode(ranked_cells(F.col("scores"))).alias("cell"),
    )
    cand = F.broadcast(q_assigned).join(c_assigned, "cell").filter(
        F.col("q_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def ivf_cells_numpy(
    df: DataFrame,
    dim: int,
    n_cells: int = 16,
    n_probe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cell assignment via ONE BLAS matmul per Arrow batch — the
    100 TB twin of ivf_topk's JVM cell_scores (which codegens
    n_cells*dim literals into the projection and evaluates
    interpreted lambdas per row). Without n_probe: (id, vec, cell)
    with cell = argmax-dot centroid, ties to the smallest index
    (numpy argmax = first max, same as the JVM struct-max). With
    n_probe: the n_probe best cells exploded per row (query side;
    stable argsort ties to the smaller index like the JVM
    array_sort on struct(-s, i)). Float caveat mirrors
    lsh_buckets_numpy: BLAS pairwise vs left-to-right summation can
    differ within one ulp — test_similarity_kernels pins full cell
    agreement on the test corpora."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cents = np.array(
        [_hyperplane(dim, c + 101, 7) for c in range(n_cells)]
    )  # (cells, dim)

    if n_probe is None:
        @pandas_udf(T.IntegerType())
        def best_cell(vecs: pd.Series) -> pd.Series:
            # NULL embedding -> NULL cell, matching the JVM twin
            # (aggregate over a null array nulls the whole score
            # struct); a ragged np.array would kill the stage
            lst = vecs.tolist()
            mask = np.array([v is None for v in lst])
            mat = np.array(
                [v if v is not None else [0.0] * dim for v in lst],
                dtype=np.float64,
            )
            out = pd.Series(
                (mat @ cents.T).argmax(axis=1).astype("int32")
            )
            if mask.any():
                out = out.astype("Int32")
                out[mask] = None
            return out

        return df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            best_cell(F.col(vec_col)).alias("cell"),
        )

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        lst = vecs.tolist()
        mask = [v is None for v in lst]
        mat = np.array(
            [v if v is not None else [0.0] * dim for v in lst],
            dtype=np.float64,
        )
        order = np.argsort(-(mat @ cents.T), axis=1, kind="stable")
        probes = order[:, :n_probe].astype("int32").tolist()
        return pd.Series(
            [None if m else p for m, p in zip(mask, probes)]
        )

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )


def ivf_topk_fast(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ivf_topk with the BLAS cell kernel — the registered scale
    path. Assignment and probe ranking run as one matmul per Arrow
    batch (ivf_cells_numpy); the exact cosine re-rank of candidates
    stays JVM-side, strictly left-to-right, so the DuckDB oracle
    reproduces it bit-for-bit."""
    c_assigned = ivf_cells_numpy(
        corpus, dim, n_cells, id_col=id_col, vec_col=vec_col
    ).select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec"), "cell"
    )
    q_assigned = ivf_cells_numpy(
        queries, dim, n_cells, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    ).select(F.col("id").alias("q_id"), F.col("vec").alias("q_vec"), "cell")
    cand = F.broadcast(q_assigned).join(c_assigned, "cell").filter(
        F.col("q_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )
