"""Training-data ops: dedup family, similarity search, text analysis,
multimodal plumbing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF
from vector_spark.dataops.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from vector_spark.dataops.similarity import brute_force_topk, lsh_topk, ivf_topk
from vector_spark.dataops.text import lang_id_udf, text_stats


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    return d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1000000)).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        .cache()
    )


def test_exact_dedup_finds_injected_dupes(docs):
    out = exact_dedup(docs, "doc_id", "text")
    pdf = out.toPandas()
    assert (pdf.dup_count >= 2).all()  # every doc duplicated
    assert len(pdf) == docs.count() / 2
    assert (pdf.canonical_id < 1000000).all()


def test_ngram_jaccard_exact_dupes_score_one(docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.999)
    pdf = pairs.toPandas()
    # each injected duplicate pair (id, id+1000000) has jaccard 1.0
    injected = pdf[(pdf.id_b - pdf.id_a) == 1000000]
    assert len(injected) == docs.count() / 2
    assert (injected.jaccard == 1.0).all()


def test_minhash_lsh_recall_on_exact_dupes(docs):
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.999).toPandas()
    injected = pairs[(pairs.id_b - pairs.id_a) == 1000000]
    # identical docs share every band -> recall 1.0 on exact dupes
    assert len(injected) == docs.count() / 2
    assert (injected.est_jaccard == 1.0).all()


def test_minhash_estimates_track_exact_jaccard(docs):
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    }
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    }
    common = set(exact) & set(est)
    assert common, "no overlapping pairs to compare"
    for k in common:
        assert abs(exact[k] - est[k]) < 0.35  # 64-hash estimator tolerance


def test_simhash_exact_dupes_hamming_zero(docs):
    pairs = simhash_near_pairs(docs, "doc_id", "text", max_hamming=0).toPandas()
    injected = pairs[(pairs.id_b - pairs.id_a) == 1000000]
    assert len(injected) == docs.count() / 2
    assert (injected.hamming == 0).all()


def test_brute_force_topk_shape(emb):
    q = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(emb, q, k=5).toPandas()
    assert len(out) == 15
    assert set(out.q_id.unique()) == {0, 1, 2}
    for _, ranks in out.groupby("q_id")["rank"]:
        assert sorted(ranks.tolist()) == [1, 2, 3, 4, 5]
    # cosine descending within each query
    for _, g in out.groupby("q_id"):
        cs = g.sort_values("rank").cosine.tolist()
        assert cs == sorted(cs, reverse=True)
    assert (out.q_id != out.neighbor_id).all()


def test_lsh_topk_recall_vs_brute(emb):
    q = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, q, k=5).toPandas()
    approx = lsh_topk(emb, q, dim=64, k=5, n_bits=4, n_tables=16).toPandas()
    hits = 0
    for qid in range(5):
        e = set(exact[exact.q_id == qid].neighbor_id)
        a = set(approx[approx.q_id == qid].neighbor_id)
        hits += len(e & a)
    # random 64-d embeddings have weak NN structure; 16 tables x 4
    # bits gives solid-but-not-total recall there
    assert hits / 25 >= 0.4


def test_ivf_topk_runs(emb):
    q = emb.filter(F.col("vec_id") < 3)
    out = ivf_topk(emb, q, dim=64, k=5, n_cells=8, n_probe=3).toPandas()
    assert set(out.q_id.unique()) == {0, 1, 2}
    assert out.groupby("q_id")["rank"].max().le(5).all()


def test_text_stats_ranges(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today ok")],
        ["doc_id", "text"],
    )
    r = text_stats(df, "doc_id", "text").collect()[0]
    assert r.n_tokens == 11
    assert 0 <= r.punct_ratio <= 1
    assert r.stopword_ratio > 0
    assert 0 <= r.quality_score <= 1


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy there"),
            (2, "la casa de la ciudad es grande y los perros ladran en el parque"),
            (3, "这是一个中文句子"),
            (4, ""),
        ],
        ["id", "text"],
    )
    got = {r.id: r.lang for r in df.select("id", lang_id_udf("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "zh"
    assert got[4] == "und"


def test_lsh_buckets_numpy_matches_jvm(emb):
    """The BLAS signature kernel (the 100 TB path) must produce the
    same (table, bucket) assignments as the oracle-exact JVM
    expression — summation-order divergence is only possible within
    one ulp of a zero projection, which real data never sits on."""
    from vector_spark.dataops.similarity import lsh_bucket, lsh_buckets_numpy

    tb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    lsh_bucket(F.col("embedding"), 64, 10, t).alias("bucket"),
                )
                for t in range(4)
            ]
        )
    )
    jvm = {
        (r["vec_id"], r["tb"]["table"]): r["tb"]["bucket"]
        for r in emb.select("vec_id", tb.alias("tb")).collect()
    }
    np_rows = lsh_buckets_numpy(emb, dim=64, n_bits=10, n_tables=4).collect()
    assert len(np_rows) == len(jvm)
    for r in np_rows:
        assert jvm[(r["id"], r["table"])] == r["bucket"]


def test_lsh_topk_fast_matches_jvm(emb):
    """The registered BLAS LSH top-k plan must equal the JVM twin
    row-for-row (same buckets -> same candidates -> identical exact
    re-rank)."""
    from vector_spark.dataops.similarity import lsh_topk, lsh_topk_fast

    q = emb.filter(F.col("vec_id") < 4)
    key = lambda r: (r["q_id"], r["rank"])
    slow = sorted(lsh_topk(emb, q, dim=64, k=5).collect(), key=key)
    fast = sorted(lsh_topk_fast(emb, q, dim=64, k=5).collect(), key=key)
    assert [tuple(r) for r in slow] == [tuple(r) for r in fast]
    assert len(fast) > 0


def test_assign_cells_numpy_matches_jvm(emb):
    """The BLAS k-means assignment kernel must reproduce the JVM
    argmin cell per vector (ties to the lowest cell on both sides)."""
    from vector_spark.dataops.clustering import (
        assign_cells,
        assign_cells_numpy,
        initial_centroids,
    )

    cents = initial_centroids(8, 64)
    jvm = {r["id"]: r["cell"] for r in assign_cells(emb, cents).collect()}
    np_rows = assign_cells_numpy(emb, cents).collect()
    assert len(np_rows) == len(jvm)
    for r in np_rows:
        assert jvm[r["id"]] == r["cell"]


def test_ivf_cells_numpy_matches_jvm(emb):
    """The BLAS IVF cell kernel (the 100 TB path) must reproduce the
    JVM argmax cell per vector AND the JVM probe ranking per query —
    ties break to the smaller index on both sides."""
    from vector_spark.dataops.similarity import (
        ivf_cells_numpy,
        ivf_topk,
        ivf_topk_fast,
    )

    q = emb.filter(F.col("vec_id") < 4)
    key = lambda r: (r["q_id"], r["rank"])
    slow = sorted(ivf_topk(emb, q, dim=64, k=5).collect(), key=key)
    fast = sorted(ivf_topk_fast(emb, q, dim=64, k=5).collect(), key=key)
    assert [tuple(r) for r in slow] == [tuple(r) for r in fast]
    assert len(fast) > 0
    # probe ranking shape: n_probe cells per query, all distinct
    probes = ivf_cells_numpy(q, dim=64, n_cells=16, n_probe=4).collect()
    per_q: dict = {}
    for r in probes:
        per_q.setdefault(r["id"], []).append(r["cell"])
    for cells in per_q.values():
        assert len(cells) == 4 and len(set(cells)) == 4


def test_score_deciles_deterministic_buckets(spark):
    from vector_spark.dataops.mixing import score_deciles

    rows = [(f"d{i:02d}", "web", i) for i in range(20)]
    rows += [(f"e{i:02d}", "code", 5) for i in range(4)]  # all ties
    df = spark.createDataFrame(rows, "doc_id string, source string, n int")
    out = {(r.doc_id): r for r in score_deciles(df, "n").collect()}
    # 20 docs over 10 buckets: 2 per bucket, ordered by (score, id)
    assert out["d00"].bucket == 1 and out["d01"].bucket == 1
    assert out["d18"].bucket == 10 and out["d19"].bucket == 10
    assert out["d00"].group == "web" and out["d00"].score == 0
    # the tied group buckets purely by doc_id (deterministic)
    code = sorted(
        (r.doc_id, r.bucket) for r in out.values() if r.group == "code"
    )
    assert [b for _, b in code] == sorted(b for _, b in code)


def test_balanced_sample_exact_quota(spark):
    from vector_spark.dataops.mixing import balanced_sample

    rows = [(f"a{i}", "big") for i in range(30)]
    rows += [(f"b{i}", "small") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = balanced_sample(df, k=5).toPandas()
    kept = out[out.kept]
    assert (kept.groupby("group").size().to_dict()
            == {"big": 5, "small": 3})  # min(k, |group|)
    # deterministic: same pick on a second run
    again = balanced_sample(df, k=5).toPandas()
    assert sorted(kept.doc_id) == sorted(again[again.kept].doc_id)


def test_exact_dedup_incremental_flags_novelty(spark):
    from pyspark.sql import functions as F

    from vector_spark.dataops.dedup import exact_dedup_incremental

    new = spark.createDataFrame(
        [
            ("n1", "seen before"),
            ("n2", "brand new"),
            ("n3", "brand new"),   # within-batch dup of n2
            ("n4", None),          # NULL text: fingerprints as ''
        ],
        "doc_id string, text string",
    )
    store = spark.createDataFrame(
        [("seen before",), ("other",)], "t string"
    ).select(F.md5("t").alias("fingerprint"))
    out = {r.doc_id: r for r in exact_dedup_incremental(new, store).collect()}
    assert out["n1"].in_store and not out["n1"].is_novel
    # only the FIRST within-batch copy is novel
    assert out["n2"].is_novel and out["n2"].first_in_batch
    assert not out["n3"].is_novel and not out["n3"].first_in_batch
    assert out["n3"].fingerprint == out["n2"].fingerprint
    # NULL text gets the empty-string fingerprint, not NULL
    assert out["n4"].fingerprint is not None and out["n4"].is_novel


def test_bpe_ish_token_count_segments(spark):
    from pyspark.sql import functions as F

    from vector_spark.dataops.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [
            ("a", "it's 2024, really!"),
            ("b", ""),
            ("c", "hello"),
        ],
        "id string, t string",
    )
    out = {r.id: r.n for r in df.select(
        "id", bpe_ish_token_count(F.col("t")).alias("n")
    ).collect()}
    # it | 's | ' 2024' | , | ' really' | ! -> 6 pieces
    assert out["a"] == 6
    assert out["b"] == 0
    assert out["c"] == 1


def test_kmeans_fit_k_larger_than_corpus(spark):
    from vector_spark.dataops.clustering import kmeans_fit

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(df, k=8, dim=2, n_iter=1)
    assert len(cents) == 3  # degraded to |corpus|, no IndexError


def test_numpy_kernels_tolerate_null_embeddings(spark):
    from vector_spark.dataops.clustering import (
        assign_cells,
        assign_cells_numpy,
    )
    from vector_spark.dataops.similarity import (
        ivf_cells_numpy,
        lsh_buckets_numpy,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [0.5, -1.0])],
        "vec_id long, embedding array<double>",
    )
    # lsh: NULL -> bucket 0 (JVM twin parity)
    b = {
        (r.id, r.table): r.bucket
        for r in lsh_buckets_numpy(df, dim=2, n_tables=2).collect()
    }
    assert b[(1, 0)] == 0 and b[(1, 1)] == 0
    # ivf + kmeans assignment: NULL -> NULL cell (JVM twin parity)
    cents = [[1.0, 0.0], [0.0, 1.0]]
    jvm = {r.id: r.cell for r in assign_cells(df, cents).collect()}
    np_ = {r.id: r.cell for r in assign_cells_numpy(df, cents).collect()}
    assert jvm == np_ and jvm[1] is None
    iv = {r.id: r.cell for r in ivf_cells_numpy(df, dim=2, n_cells=4).collect()}
    assert iv[1] is None and iv[0] is not None
    # probe form: NULL row yields no probes
    ivp = ivf_cells_numpy(df, dim=2, n_cells=4, n_probe=2)
    assert ivp.filter("id = 1").count() == 0


def test_cosine_zero_vector_is_zero_not_null(spark):
    from vector_spark.dataops.similarity import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    r = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]
    assert r.c == 0.0


def test_unigram_logprob_join_keeps_empty_docs(spark):
    from vector_spark.dataops.mixing import unigram_logprob_join

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, ""), (2, "   ")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [("alpha", 10), ("beta", 5)], "token string, cnt long"
    )
    rows = {r.doc_id: r for r in unigram_logprob_join(docs, vocab).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[1].n_tokens == 0 and rows[1].avg_logprob == 0.0
    assert rows[2].n_tokens == 0


def test_top_bigram_frac_capped_at_one(spark):
    from vector_spark.dataops.quality import top_bigram_frac

    df = spark.createDataFrame([("a a a",)], "text string")
    r = df.select(top_bigram_frac(F.col("text")).alias("f")).collect()[0]
    assert r.f == 1.0  # overlapping 'a a' x2 would otherwise give 1.2


def test_contiguous_fill_rejects_output_collision(spark):
    import pytest

    from vector_spark.dataops.packing import contiguous_fill

    df = spark.createDataFrame(
        [("p", 0, 5, 9)], "part string, ord int, n int, pack_id int"
    )
    with pytest.raises(ValueError, match="pack_id"):
        contiguous_fill(df, "part", "ord", "n", budget=10)


def test_exact_dedup_null_text_matches_incremental_store(spark):
    from vector_spark.dataops.dedup import (
        exact_dedup,
        exact_dedup_incremental,
    )

    docs = spark.createDataFrame(
        [(0, None), (1, "x")], "doc_id long, text string"
    )
    store = exact_dedup(docs, "doc_id", "text").select("fingerprint")
    assert store.filter("fingerprint IS NULL").count() == 0
    new = spark.createDataFrame([(2, None)], "doc_id long, text string")
    r = exact_dedup_incremental(new, store).collect()[0]
    assert r.in_store is True and r.is_novel is False


def test_ngram_jaccard_consistent_under_shingle_cap(spark):
    from vector_spark.dataops.dedup import ngram_jaccard_pairs

    # 'stop stop stop' shingle appears in all 4 docs -> capped at
    # max_shingle_df=3; docs 0/1 share their remaining shingles
    # exactly, so capped-universe Jaccard is 1.0 (a full-set size
    # with a capped intersection would report < 1)
    base = "stop stop stop alpha beta gamma delta"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, "stop stop stop xx yy zz qq"),
         (3, "stop stop stop aa bb cc dd")],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.9, max_shingle_df=3
        ).collect()
    }
    assert pairs.get((0, 1)) == 1.0


def test_minhash_null_text_not_banded(spark):
    from vector_spark.dataops.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(0, None), (1, None), (2, "alpha beta gamma delta echo"),
         (3, "alpha beta gamma delta echo")],
        "doc_id long, text string",
    )
    pairs = [
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    ]
    # the two null-text docs never meet in a band; the real dup pair
    # still does
    assert (0, 1) not in pairs and (2, 3) in pairs
