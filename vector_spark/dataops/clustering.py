"""Embedding clustering for training-data curation: Lloyd's k-means
over the embedding column plus SemDeDup-style within-cluster semantic
pruning (cluster first, then look for near-duplicates ONLY inside a
cluster — the sub-quadratic trick that makes semantic dedup feasible
at corpus scale).

Two centroid-update forms, same algorithm:

* `kmeans_fit(..., exact=True)` — each cluster's members are sorted
  by id and summed LEFT-TO-RIGHT inside one aggregate(); float
  summation order is fully deterministic, so the DuckDB oracle
  reproduces every iteration (and therefore every assignment)
  bit-for-bit. Cluster updates collect per-cluster lists — right for
  verification scale.
* `exact=False` — plain groupBy avg per dimension: the 100 TB shape
  (map-side partial aggregation, no per-cluster list), numerically
  equal but with engine-dependent float summation order; the
  throughput twin, equality-tested at fixed precision.

Initial centroids are the deterministic splitmix vectors
(similarity._hyperplane) — no RNG, both engines derive them from
constants. k-means on the driver holds k x dim floats per iteration;
everything per-row is JVM Column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.dataops.similarity import _hyperplane, cosine


def initial_centroids(k: int, dim: int) -> list[list[float]]:
    """Constant deterministic seeds (same constants as the IVF
    cells). Data-independent but may land off the data manifold —
    prefer data_seeds for real corpora."""
    return [_hyperplane(dim, c + 101, 7) for c in range(k)]


def data_seeds(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic data-dependent seeds: the k corpus vectors with
    the smallest ids. On-manifold (no empty clusters from stray
    constants), reproducible in SQL (ORDER BY id LIMIT k), and one
    tiny driver collect."""
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    return [list(r["v"]) for r in rows]


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cell): nearest centroid by squared Euclidean distance,
    ties to the lowest cell index — one zero-shuffle map stage."""
    vec = F.col(vec_col)

    def dist2(cv: list[float]) -> Column:
        carr = F.array(*[F.lit(float(x)) for x in cv])
        return F.aggregate(
            F.zip_with(vec, carr, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # struct-array-min argmin: ONE evaluation of the k x dim distance
    # array. array_position(dists, array_min(dists)) references the
    # aggregate-lambda array twice, and Catalyst does not CSE lambda
    # arrays across references — the same trap the IVF cell scores
    # fix measured at ~2x (similarity.py ivf_topk). Struct comparison
    # is lexicographic, so min-by-(dist, index) keeps the lowest-index
    # tie rule.
    entries = F.array(
        *[
            F.struct(dist2(cv).alias("d"), F.lit(i).alias("i"))
            for i, cv in enumerate(centroids)
        ]
    )
    # explicit NULL-vec guard: with a null vector every d is null and
    # struct comparison would sort null-first, electing cell 0 — keep
    # the NULL-cell contract the twins share
    cell = F.when(vec.isNotNull(), F.array_min(entries)["i"])
    return df.select(
        F.col(id_col).alias("id"), vec.alias("vec"), cell.cast("int").alias("cell")
    )


def assign_cells_numpy(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """assign_cells via ONE BLAS matmul per Arrow batch — the 100 TB
    kernel. argmin over ||x-c||² = argmin over (||c||² - 2·x·c) (the
    ||x||² term is constant per row); numpy argmin takes the first
    minimum, the same lowest-index tie rule as the JVM
    array_position-of-min. Float caveat mirrors lsh_buckets_numpy:
    pairwise vs left-to-right summation can reorder distances only
    on sub-ulp ties — test_dataops pins full assignment agreement
    with assign_cells on the test corpora."""
    import numpy as np
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cents = np.array(centroids, dtype=np.float64)  # (k, dim)
    c2 = (cents**2).sum(axis=1)  # (k,)

    @pandas_udf(T.IntegerType())
    def cell_of(vecs):
        import pandas as pd

        # NULL embedding -> NULL cell (JVM twin parity: null dists
        # null the array_min); ragged np.array would kill the stage
        lst = vecs.tolist()
        mask = np.array([v is None for v in lst])
        dim = cents.shape[1]
        mat = np.array(
            [v if v is not None else [0.0] * dim for v in lst],
            dtype=np.float64,
        )
        d = c2[None, :] - 2.0 * (mat @ cents.T)
        out = pd.Series(d.argmin(axis=1).astype("int32"))
        if mask.any():
            out = out.astype("Int32")
            out[mask] = None
        return out

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        cell_of(F.col(vec_col)).alias("cell"),
    )


def _update_exact(assigned: DataFrame, dim: int) -> dict[int, list[float]]:
    """Sorted left-to-right per-dimension sums — deterministic float
    order, reproducible in SQL with list(... ORDER BY id)."""
    rows = (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("id"), F.col("vec")))
                    ),
                    lambda s: s["vec"],
                ),
                F.array(*[F.lit(0.0)] * dim),
                lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x),
            ).alias("sums"),
        )
        .collect()
    )
    return {
        r["cell"]: [s / r["n"] for s in r["sums"]] for r in rows
    }


def _update_mean(assigned: DataFrame, dim: int) -> dict[int, list[float]]:
    """Plain per-dimension avg — the scale form (partial-aggregated
    shuffle, no per-cluster collect)."""
    aggs = [
        F.avg(F.col("vec")[d]).alias(f"m{d}") for d in range(dim)
    ]
    rows = assigned.groupBy("cell").agg(*aggs).collect()
    return {
        r["cell"]: [r[f"m{d}"] for d in range(dim)] for r in rows
    }


def kmeans_fit(
    df: DataFrame,
    k: int,
    dim: int,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
    init: str = "data",
    round_to: int | None = None,
) -> list[list[float]]:
    """Lloyd's iterations from deterministic seeds (init="data": the
    k smallest-id corpus vectors; init="splitmix": constant vectors);
    empty clusters keep their previous centroid (the standard fix,
    both engines).

    round_to: round every centroid coordinate after each update. The
    scale form (exact=False) sums in engine-dependent float order, so
    an oracle can only agree with it at fixed precision — rounding
    INSIDE the loop makes both engines feed identical centroids into
    the next assignment, so the final integer assignments match
    exactly, not just approximately."""
    if init == "data":
        cents = data_seeds(df, k, id_col, vec_col)
        # a corpus smaller than k yields fewer seeds — degrade k to
        # what exists (cents[c] for c >= |seeds| would IndexError in
        # the update loop)
        k = min(k, len(cents))
    else:
        cents = initial_centroids(k, dim)
    update = _update_exact if exact else _update_mean
    # the scale form pairs with the BLAS assignment kernel; the exact
    # form keeps the left-to-right JVM expression the oracle replays
    assign = assign_cells if exact else assign_cells_numpy
    for _ in range(n_iter):
        assigned = assign(df, cents, id_col, vec_col)
        new = update(assigned, dim)
        cents = [new.get(c, cents[c]) for c in range(k)]
        if round_to is not None:
            cents = [[round(x, round_to) for x in cv] for cv in cents]
    return cents


def kmeans_predict(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "jvm",
) -> DataFrame:
    """(id, cell) final assignment. kernel="numpy" uses the BLAS
    matmul kernel (the 100 TB path); "jvm" keeps the oracle-exact
    left-to-right expression."""
    assign = assign_cells_numpy if kernel == "numpy" else assign_cells
    return assign(df, centroids, id_col, vec_col).select("id", "cell")


def semdedup_pairs(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "jvm",
) -> DataFrame:
    """SemDeDup: near-duplicate pairs (cosine >= threshold) WITHIN a
    cluster only — candidate generation cost is the sum of squared
    cluster sizes, not n². Output (cell, id_a, id_b, cosine)."""
    assign = assign_cells_numpy if kernel == "numpy" else assign_cells
    # materialize ONCE for both sides of the self-join via lazy
    # localCheckpoint (the retrieval-module idiom): unlike a bare
    # cache(), the blocks are released by the ContextCleaner when the
    # returned plan is no longer referenced, so a driver loop over
    # shards/thresholds doesn't accumulate leaked storage
    assigned = assign(df, centroids, id_col, vec_col).localCheckpoint(
        eager=False
    )
    a = assigned.select(
        "cell", F.col("id").alias("id_a"), F.col("vec").alias("va")
    )
    b = assigned.select(
        "cell", F.col("id").alias("id_b"), F.col("vec").alias("vb")
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("cell", "id_a", "id_b", "cosine")
    )
