"""Training-data pipeline ops: PII scrub, Gopher quality rules,
benchmark decontamination (dataops/pii.py, quality.py, decontam.py).

These are unit-level semantics checks on crafted inputs; the exact
cross-engine verification runs through the docs_pii_scrub /
docs_gopher_quality / docs_decontam oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    from vector_spark.dataops.pii import scrub

    df = _df(spark, [
        (1, "mail a.b+c@x-corp.io and b@y.org, ip 192.168.0.1"),
        (2, "ssn 123-45-6789 phone 555-123-4567"),
        (3, "card 4242 4242 4242 4242 end"),
        (4, "clean text, no pii at all"),
    ])
    out = {r["doc_id"]: r for r in scrub(df, "doc_id", "text").collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_ipv4"] == 1
    assert out[1]["redacted"] == "mail [EMAIL] and [EMAIL], ip [IP]"
    assert out[2]["n_ssn"] == 1 and out[2]["n_phone"] == 1
    assert out[2]["redacted"] == "ssn [SSN] phone [PHONE]"
    assert out[3]["n_cc"] == 1 and out[3]["n_phone"] == 0  # masked first
    assert out[3]["redacted"] == "card [CC] end"
    assert out[4]["n_pii"] == 0 and out[4]["redacted"] == out[4]["redacted"]


def test_pii_masking_order_no_double_count(spark):
    """The 16-digit card must not ALSO count as phone/ip fragments,
    and an SSN must not count as a phone."""
    from vector_spark.dataops.pii import scrub

    df = _df(spark, [(1, "4242 4242 4242 4242 and 123-45-6789")])
    r = scrub(df, "doc_id", "text").collect()[0]
    assert (r["n_cc"], r["n_ssn"], r["n_phone"], r["n_ipv4"]) == (1, 1, 0, 0)
    assert r["n_pii"] == 2


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------


def test_gopher_metrics_known_doc(spark):
    from vector_spark.dataops.quality import gopher_quality

    # 6 tokens, "a b" twice -> dup 1/6 (b repeats), bigram "a b" x2
    df = _df(spark, [(1, "a b c d a b")])
    r = gopher_quality(df, "doc_id", "text").collect()[0]
    assert r["n_tokens"] == 6
    assert abs(r["dup_token_frac"] - round(1 - 4 / 6, 6)) < 1e-9
    # stream "a b c d a b" = 11 chars; best bigram "a b" covers 2*3=6
    assert abs(r["top_bigram_frac"] - round(6 / 11, 6)) < 1e-9
    assert r["alpha_word_frac"] == 1.0
    assert r["gopher_pass"] is False  # too short + too repetitive


def test_gopher_degenerate_docs(spark):
    from vector_spark.dataops.quality import gopher_quality

    df = _df(spark, [(1, ""), (2, "word"), (3, "12 34 56")])
    rows = {r["doc_id"]: r for r in
            gopher_quality(df, "doc_id", "text").collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["top_bigram_frac"] == 0.0
    assert rows[2]["n_tokens"] == 1 and rows[2]["top_bigram_frac"] == 0.0
    assert rows[3]["alpha_word_frac"] == 0.0  # digit-only words
    assert not any(r["gopher_pass"] for r in rows.values())


def test_gopher_passing_doc(spark):
    from vector_spark.dataops.quality import gopher_quality

    text = " ".join(f"word{i:03d}" for i in range(60))
    df = _df(spark, [(1, text)])
    r = gopher_quality(df, "doc_id", "text").collect()[0]
    assert r["gopher_pass"] is True
    assert r["dup_token_frac"] == 0.0


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontam_hits_and_clean(spark):
    from vector_spark.dataops.decontam import decontaminate

    bench = _df(spark, [(100, "the quick brown fox jumps over")])
    corpus = _df(spark, [
        (1, "xx the quick brown fox yy"),       # 1 shared 4-gram
        (2, "quick brown fox jumps over now"),  # 2 shared 4-grams
        (3, "completely different words here"),
        (4, "too short"),                       # < n tokens
    ])
    out = {r["doc_id"]: r for r in
           decontaminate(corpus, bench, n=4).collect()}
    assert out[1]["n_hits"] == 1 and out[1]["contaminated"]
    assert out[2]["n_hits"] == 2 and out[2]["contaminated"]
    assert out[3]["n_hits"] == 0 and not out[3]["contaminated"]
    assert out[4]["n_hits"] == 0 and not out[4]["contaminated"]
    assert len(out) == 4  # zero-hit docs kept


def test_decontam_benchmark_broadcast(spark):
    """The benchmark side must be broadcast (scale contract: the
    corpus never shuffles for the probe)."""
    from vector_spark.dataops.decontam import decontaminate

    bench = _df(spark, [(100, "a b c d e")])
    corpus = _df(spark, [(1, "a b c d e f")])
    plan = decontaminate(corpus, bench, n=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# corpus mixing (dataops/mixing.py)
# ---------------------------------------------------------------------------


def test_stratified_sample_rates_and_stability(spark):
    from vector_spark.dataops.mixing import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)],
        "doc_id long, lang string",
    )
    kept = stratified_sample(docs, "lang", {"en": 30})
    by_lang = {r["lang"]: r["n"] for r in
               kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["fr"] == 1000          # default rate keeps all
    assert 230 <= by_lang["en"] <= 370    # ~30% of 1000, hash-binomial
    # deterministic: the same call keeps the same documents
    ids1 = {r["doc_id"] for r in kept.collect()}
    ids2 = {r["doc_id"] for r in
            stratified_sample(docs, "lang", {"en": 30}).collect()}
    assert ids1 == ids2


def test_assign_split_stable_under_growth(spark):
    from vector_spark.dataops.mixing import assign_split

    small = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long")
    big = spark.createDataFrame(
        [(i,) for i in range(1000)], "doc_id long")
    s_small = {r["doc_id"]: r["split"] for r in assign_split(small).collect()}
    s_big = {r["doc_id"]: r["split"] for r in assign_split(big).collect()}
    # membership depends only on the id: growing the corpus never
    # migrates an existing document between splits
    assert all(s_big[i] == s_small[i] for i in s_small)
    frac_val = sum(1 for v in s_big.values() if v == "val") / 1000
    assert 0.02 <= frac_val <= 0.09


def test_unigram_logprob_map_vs_join(spark):
    """The literal-map (oracle-exact) and broadcast-join (100 TB)
    forms agree at the rounded precision, and rare tokens score
    lower."""
    from vector_spark.dataops.mixing import (
        build_vocab,
        unigram_logprob,
        unigram_logprob_join,
    )

    docs = spark.createDataFrame(
        [(1, "common common common common"),
         (2, "common common rare common"),
         (3, "rare unique common words here")],
        "doc_id long, text string",
    )
    lit = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    join = {r["doc_id"]: r for r in
            unigram_logprob_join(docs, build_vocab(docs)).collect()}
    for i in (1, 2, 3):
        assert abs(lit[i]["avg_logprob"] - join[i]["avg_logprob"]) < 1e-5
        assert lit[i]["n_tokens"] == join[i]["n_tokens"]
    assert lit[1]["avg_logprob"] > lit[2]["avg_logprob"] > lit[3]["avg_logprob"]


# ---------------------------------------------------------------------------
# embedding clustering + SemDeDup (dataops/clustering.py)
# ---------------------------------------------------------------------------


def _blob_corpus(spark):
    """Three well-separated 8-dim blobs, 30 points each,
    deterministic offsets."""
    rows = []
    centers = [[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4]
    vid = 0
    for c in centers:
        for i in range(30):
            vec = [x + ((vid * 7 + d * 3) % 5 - 2) * 0.1
                   for d, x in enumerate(c)]
            rows.append((vid, vec))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_blobs(spark):
    """splitmix (constant) init: blob ids are contiguous, so data
    seeds would all fall in blob 0 — the constant-seed path must
    still separate well-spread blobs."""
    from vector_spark.dataops.clustering import kmeans_fit, kmeans_predict

    df = _blob_corpus(spark)
    cents = kmeans_fit(df, k=3, dim=8, n_iter=4, exact=True,
                       init="splitmix")
    cells = {r["id"]: r["cell"] for r in kmeans_predict(df, cents).collect()}
    # every blob lands in exactly one cluster, and the three differ
    blobs = [
        {cells[i] for i in range(b * 30, (b + 1) * 30)} for b in range(3)
    ]
    assert all(len(b) == 1 for b in blobs)
    assert len({next(iter(b)) for b in blobs}) == 3


def test_kmeans_exact_vs_mean_update(spark):
    from vector_spark.dataops.clustering import kmeans_fit

    df = _blob_corpus(spark)
    exact = kmeans_fit(df, k=3, dim=8, n_iter=2, exact=True)
    mean = kmeans_fit(df, k=3, dim=8, n_iter=2, exact=False)
    for ce, cm in zip(exact, mean):
        assert all(abs(a - b) < 1e-9 for a, b in zip(ce, cm))


def test_semdedup_finds_twins_within_clusters(spark):
    from pyspark.sql import functions as F

    from vector_spark.dataops.clustering import kmeans_fit, semdedup_pairs

    base = _blob_corpus(spark)
    twins = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001).alias("embedding"),
    )
    corpus = base.unionByName(twins)
    cents = kmeans_fit(corpus, k=3, dim=8, n_iter=4, exact=True)
    pairs = semdedup_pairs(corpus, cents, threshold=0.999999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # every scaled twin pairs with its original (cosine 1.0)
    assert all((i, i + 1000) in got for i in range(90))


def test_kmeans_data_seeds_interleaved(spark):
    """data-seed init: with blob membership interleaved across ids,
    the first-k seeds land on distinct blobs and separation holds."""
    from vector_spark.dataops.clustering import kmeans_fit, kmeans_predict

    rows = []
    centers = [[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4]
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [x + ((i * 7 + d * 3) % 5 - 2) * 0.1
                         for d, x in enumerate(c)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, dim=8, n_iter=3, exact=True, init="data")
    cells = {r["id"]: r["cell"] for r in kmeans_predict(df, cents).collect()}
    blobs = [{cells[i] for i in range(b, 90, 3)} for b in range(3)]
    assert all(len(b) == 1 for b in blobs)
    assert len({next(iter(b)) for b in blobs}) == 3


def test_connected_components_clusters(spark):
    """Min-label propagation: chains and singletons resolve to the
    component minimum; exactly one canonical per component."""
    from vector_spark.dataops.dedup import connected_components

    nodes = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long")
    # components: {0,1,2,3} (chain), {5,6} — 4 and 7 are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (0, 3), (5, 6)], "id_a long, id_b long")
    out = {r["id"]: r for r in
           connected_components(nodes, pairs).collect()}
    assert [out[i]["cluster_rep"] for i in range(8)] == [0, 0, 0, 0, 4, 5, 5, 7]
    canon = {i for i in range(8) if out[i]["is_canonical"]}
    assert canon == {0, 4, 5, 7}


def test_connected_components_lineage_bounded(spark):
    """A deep chain forces many propagation rounds; the periodic
    localCheckpoint must keep the logical plan from growing one join
    per iteration (a deep component at real scale would otherwise
    balloon the driver DAG)."""
    from vector_spark.dataops.dedup import connected_components

    n = 40  # one long chain — the worst case for plain propagation
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    # max_iter=12 << n pins the O(log diameter) property: pointer
    # doubling from round 2 must fully converge a 40-chain in ~8
    # rounds; plain min-label would need ~40 and fail this assert
    out = connected_components(nodes, pairs, max_iter=12)
    assert {r["cluster_rep"] for r in out.collect()} == {0}
    # the checkpointed loop's final plan stays shallow: a handful of
    # post-checkpoint iterations, not ~n stacked joins
    depth = out._jdf.queryExecution().optimizedPlan().toString().count("Join")
    assert depth <= 12, depth
