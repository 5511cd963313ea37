"""Deduplication over a documents table — exact and near-dup.

Design for 100 TB: every method below avoids the O(n^2) cross join.
* exact: hash-groupBy on a text fingerprint — one shuffle over
  (fingerprint), the canonical web-dedup first pass.
* n-gram Jaccard: inverted-index self-join on shared shingles
  (only docs sharing >=1 shingle ever meet a reducer), then exact
  set arithmetic — exact, and the shuffle key is the shingle, so
  skew is bounded by shingle document-frequency (cap via df filter).
* MinHash-LSH: 64 portable permutation hashes -> 16 bands of 4;
  candidate pairs share a band signature — the sub-quadratic scale
  path; similarity estimated from matching minhash positions.
* SimHash: 64-bit weighted-token hash; near-dups = equal simhash
  (block dedup) or Hamming<=k via band rotation.

Portable hashing: token -> int via the first 15 hex chars of md5
(both Spark `conv(substr(md5(x),1,15),16,10)` and DuckDB
`('0x'||substr(md5(x),1,15))::BIGINT`), then universal hashes
h_i(x) = (a_i * (x mod P) + b_i) mod P with P = 4294967311 (prime >
2^32; a_i*x stays < 2^41, no int64 overflow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.dataops.text import tokens

P = 4294967311  # prime > 2^32
N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS


def hash_params(i: int) -> tuple[int, int]:
    """Fixed universal-hash coefficients (seeded by index, public
    constants — nothing magic)."""
    return 2 * i + 1, (1000003 * i + 12345) % P


def token_int(col):
    """Portable string -> int64: md5 prefix as hex."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).

    PRECONDITION: `id_col` values must be unique (one row per doc).
    (id, shingle) uniqueness — which ngram_jaccard_pairs' df-counts
    and intersection counts rely on — comes from array_distinct
    within the single row each doc occupies; duplicate ids would
    inflate both. The documents table's doc_id is its primary key.

    The token array is projected into its own column FIRST: inlining
    split() into the gram lambda replicates the tokenization subtree
    per gram element (O(len^2) splitting — measured 6x on the sf0.1
    documents table). As a multiply-referenced non-cheap alias it
    survives CollapseProject and is evaluated once per row."""
    return shingle_sets(df, id_col, text_col, n).select(
        "id", F.explode("_shingles").alias("shingle")
    )


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, _shingles: array<string>) — the DISTINCT shingle set per
    doc as a zero-shuffle per-row expression (same precondition and
    tokenize-once discipline as shingles())."""
    tokd = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("_toks"),
    )
    toks = F.col("_toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    # no global .distinct(): array_distinct already dedupes within the
    # doc and each doc is a single row, so (id, shingle) pairs are
    # unique by construction — a distinct here would shuffle the whole
    # exploded shingle set for nothing
    return tokd.select("id", F.array_distinct(grams).alias("_shingles"))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via text fingerprint groupBy: one row per distinct
    text with the canonical (min) id and duplicate count."""
    # coalesce: NULL text fingerprints as md5('') so the output is a
    # valid seen_fingerprints store for exact_dedup_incremental (a
    # NULL fingerprint never equi-joins, silently never matching)
    return (
        df.groupBy(
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fingerprint")
        )
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup_incremental(
    new_docs: DataFrame,
    seen_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup: flag each NEW document against an
    EXISTING fingerprint store without rescanning the corpus —
    (doc_id, fingerprint, in_store, first_in_batch, is_novel).

    The production shape of dedup at 100 TB: yesterday's corpus is a
    persisted fingerprint table; today's shard joins against it, the
    corpus itself never re-reads. ``seen_fingerprints`` needs one
    column ``fingerprint``. The join broadcasts when the store is
    small and degrades to a fingerprint-keyed shuffle join when it
    is not — either way cost scales with |new| + |store|, never with
    the corpus text.

    is_novel admits only the FIRST (min-id) copy of a fingerprint
    within the new batch — two copies arriving in the same shard
    must not both pass. NULL text fingerprints as the empty string
    so a NULL-text doc dedups like any other instead of silently
    never matching the store.
    """
    store = seen_fingerprints.select("fingerprint").distinct().withColumn(
        "_seen", F.lit(True)
    )
    fps = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint")
    return (
        fps.join(store, "fingerprint", "left")
        .select(
            "doc_id",
            "fingerprint",
            F.col("_seen").isNotNull().alias("in_store"),
            (F.col("doc_id") == F.min("doc_id").over(w)).alias(
                "first_in_batch"
            ),
        )
        .withColumn(
            "is_novel", ~F.col("in_store") & F.col("first_in_batch")
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via inverted-index join.

    max_shingle_df drops stop-shingles appearing in more than K docs
    before the self-join — the skew cap that keeps the shuffle sane
    at web scale (a shingle in D docs contributes D^2 pair rows).
    The final Jaccard is computed over the SAME capped shingle
    universe on both sides (intersection AND set sizes exclude
    capped shingles), so the metric is self-consistent; pairs sharing
    ONLY ultra-common shingles never become candidates at all. At
    default settings on the fixture corpus no shingle hits the cap.
    """
    # repartition the exploded shingle set by the JOIN/GROUP key before
    # caching: the scan has few input splits, so an un-redistributed
    # cache throttles every consumer to scan parallelism — and hash
    # (shingle) partitioning is reused exchange-free by both the
    # df_counts groupBy and the inverted-index self-join (measured
    # ~1.4x vs caching a (id,shingle)-distinct shuffle, ~3x vs raw)
    sh = shingles(df, id_col, text_col, n).repartition(F.col("shingle")).cache()
    # per-doc set sizes as a zero-shuffle per-row expression — the
    # groupBy(id) form shuffled the ENTIRE exploded shingle stream a
    # second time just to count it (at 100 TB that is the corpus's
    # whole token stream); re-tokenizing the doc row is a per-row map
    sizes_full = shingle_sets(df, id_col, text_col, n).select(
        "id", F.size("_shingles").alias("sz")
    )
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    capped = df_counts.filter(F.col("df") > max_shingle_df)
    # one tiny probe job (an agg over the cached shingle frame)
    # decides whether the capped-universe size correction is needed at
    # all — on corpora where nothing hits the cap it skips an entire
    # extra pass over the shingle cache
    any_capped = capped.limit(1).count() > 0
    filtered = (
        sh.join(F.broadcast(capped), "shingle", "left_anti")
        if any_capped
        else sh
    )
    # set sizes over the SAME capped universe as the intersection: a
    # full-set size with a capped-set intersection would silently
    # UNDERESTIMATE Jaccard for any pair sharing a stop shingle.
    # The subtraction pass touches only capped-shingle occurrences
    # and partial-aggregates on id before its (tiny) exchange.
    capped_per_doc = (
        sh.join(F.broadcast(capped.select("shingle")), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_capped"))
        if any_capped
        else None
    )
    a, b = filtered.alias("a"), filtered.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = (
        sizes_full.join(capped_per_doc, "id", "left").select(
            "id",
            (F.col("sz") - F.coalesce(F.col("_capped"), F.lit(0))).alias(
                "sz"
            ),
        )
        if capped_per_doc is not None
        else sizes_full
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, sig: array<bigint>[N_HASHES]) minhash signatures.

    Zero-shuffle: the signature is a pure per-row expression — the
    doc's distinct shingle set stays an ARRAY column and each of the
    64 mins is `array_min(transform(...))` over it (nested
    higher-order functions, all JVM-side). The previous form exploded
    every doc into (id, shingle) rows and shuffled the ENTIRE token
    stream into a 64-expression groupBy — at 100 TB that shuffles
    ~|corpus tokens| rows to compute a per-doc value; this form
    shuffles nothing. Hash family identical (hash_params), so
    signatures are byte-identical to the old path.
    """
    # Arrow-batched pandas UDF, vectorized with numpy inside the
    # batch. Why not pure Column exprs: the 64-way min over per-doc
    # shingle hashes needs either (a) explode + groupBy — shuffles
    # the ENTIRE token stream at 100 TB (the round-1 form), or (b)
    # nested higher-order functions — which Spark evaluates
    # *interpreted*, per element, with no subexpression elimination
    # (measured 15-300 s at sf0.1 depending on nesting). The UDF is
    # shuffle-free, runs one numpy matmul-shaped min per doc, and
    # parallelizes across all cores. Hash family identical to
    # hash_params(i) and the md5-hex-15 token hash, so signatures are
    # byte-identical to the Column form.
    return df.select(
        F.col(id_col).alias("id"),
        _minhash_sig_udf(n)(F.col(text_col)).alias("sig"),
    )


_MINHASH_UDFS: dict[int, object] = {}


def _minhash_sig_udf(n: int):
    if n in _MINHASH_UDFS:
        return _MINHASH_UDFS[n]

    from pyspark.sql.functions import pandas_udf

    # shingle-string -> md5-int cache, shared across Arrow batches of
    # one worker process: md5 is the only per-string Python cost left
    # and web corpora repeat shingles heavily (bounded below)
    _md5_cache: dict[str, int] = {}
    _MD5_CACHE_MAX = 1_000_000

    @pandas_udf("array<bigint>")
    def sig_udf(texts):
        import hashlib
        import re as _re

        import numpy as np
        import pandas as pd

        A = (2 * np.arange(N_HASHES, dtype=np.int64) + 1)[:, None]
        B = ((1000003 * np.arange(N_HASHES, dtype=np.int64) + 12345) % P)[
            :, None
        ]
        split = _re.compile(r"\s+").split
        cache_get = _md5_cache.get

        # one vectorized pass per Arrow batch: gather every doc's
        # shingle-hash ints into ONE flat array, apply all 64
        # universal hashes as a single (64, total) matrix op, and
        # take per-doc minima with np.minimum.reduceat — the only
        # remaining per-shingle Python is a dict lookup (md5 computed
        # once per DISTINCT shingle per worker)
        flat: list[int] = []
        offsets: list[int] = []
        doc_idx: list[int] = []
        for pos, text in enumerate(texts):
            if text is None or (isinstance(text, float) and text != text):
                continue
            # mirror the Column shingler exactly: split(lower, \s+)
            # keeps a leading "" on leading whitespace (Java split)
            toks = split(text.lower())
            hi = max(len(toks) - n, 0)
            grams = {" ".join(toks[i : i + n]) for i in range(hi + 1)}
            offsets.append(len(flat))
            doc_idx.append(pos)
            for g in grams:
                v = cache_get(g)
                if v is None:
                    v = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % P
                    if len(_md5_cache) < _MD5_CACHE_MAX:
                        _md5_cache[g] = v
                flat.append(v)

        out = pd.Series([None] * len(texts), dtype=object)
        if flat:
            xs = np.asarray(flat, dtype=np.int64)
            H = (A * xs[None, :] + B) % P  # (64, total_shingles)
            mins = np.minimum.reduceat(H, np.asarray(offsets), axis=1)
            for j, pos in enumerate(doc_idx):
                out.iloc[pos] = mins[:, j]
        return out

    _MINHASH_UDFS[n] = sig_udf
    return sig_udf


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via LSH banding, similarity = fraction of
    equal minhash positions (unbiased Jaccard estimator)."""
    # Null signatures (null/too-short text) are excluded BEFORE
    # banding: concat_ws skips nulls, so every null-sig doc would
    # share the md5('') band signature — one quadratic skew key of
    # pure noise in the self-join at scale.
    sigs = (
        minhash_signatures(df, id_col, text_col, n)
        .filter(F.col("sig").isNotNull())
        .cache()
    )
    # Materialize before the self-join: its two sides (and the two
    # signature re-joins) otherwise run as CONCURRENT stages that
    # each race the not-yet-populated cache and recompute the UDF.
    # One eager pass makes every branch a cache read. At scale the
    # cached frame is 64*8 bytes/doc — orders smaller than the corpus.
    sigs.count()
    bands = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "-",
                            *[
                                F.col("sig")[i].cast("string")
                                for i in range(
                                    b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND
                                )
                            ],
                        )
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "bsig"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda v: v,
                    )
                )
                / F.lit(N_HASHES),
                6,
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return est


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash over word tokens: sign-sum of token-hash bits.

    (id, simhash bigint). Tokens hashed portably (md5-prefix ints);
    bit b contributes +1 if set else -1 per OCCURRENCE; simhash bit =
    1 iff sum > 0. Near-dup blocks = equal simhash values (or Hamming
    distance via XOR popcount in simhash_near_pairs).

    Zero-shuffle (round-3 rewrite, same family as the minhash
    kernel): the previous form exploded every token row and shuffled
    the WHOLE token stream into a 60-expression groupBy — at 100 TB
    that moves ~|corpus tokens| rows to compute one per-doc value.
    Now one Arrow batch pass computes all 60 bit-sums with a single
    numpy reduceat; the only per-token Python is a dict lookup (md5
    memoized per distinct token per worker). Bit-identical output
    (the DuckDB oracle is unchanged and stays green).
    """
    return df.select(
        F.col(id_col).alias("id"),
        _simhash_udf()(F.col(text_col)).alias("simhash"),
    )


_SIMHASH_UDF = []


def _simhash_udf():
    if _SIMHASH_UDF:
        return _SIMHASH_UDF[0]

    from pyspark.sql.functions import pandas_udf

    _md5_cache: dict[str, int] = {}
    _MAX = 1_000_000

    @pandas_udf("bigint")
    def sim_udf(texts):
        import hashlib
        import re as _re

        import numpy as np
        import pandas as pd

        split = _re.compile(r"\s+").split
        cache_get = _md5_cache.get
        BITS = np.arange(60, dtype=np.int64)[:, None]

        flat: list[int] = []
        offsets: list[int] = []
        doc_idx: list[int] = []
        for pos, text in enumerate(texts):
            if text is None or (isinstance(text, float) and text != text):
                continue
            offsets.append(len(flat))
            doc_idx.append(pos)
            for tok in split(text.lower()):
                v = cache_get(tok)
                if v is None:
                    v = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                    if len(_md5_cache) < _MAX:
                        _md5_cache[tok] = v
                flat.append(v)

        out = pd.Series([None] * len(texts), dtype=object)
        if flat:
            xs = np.asarray(flat, dtype=np.int64)
            # (60, total): +1 where the bit is set, -1 otherwise
            contrib = (((xs[None, :] >> BITS) & 1) << 1) - 1
            sums = np.add.reduceat(contrib, np.asarray(offsets), axis=1)
            sim = ((sums > 0).astype(np.int64) << BITS[:, 0:1]).sum(axis=0)
            for j, pos in enumerate(doc_idx):
                out.iloc[pos] = int(sim[j])
        return out

    _SIMHASH_UDF.append(sim_udf)
    return sim_udf


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Hamming<=k pairs via 4-block banding (pigeonhole: any pair
    within Hamming 3 of 60 bits shares at least one of 4 15-bit
    blocks), then exact popcount verify."""
    s = simhash(df, id_col, text_col).cache()
    blocks = s.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * 15).bitwiseAND(F.lit((1 << 15) - 1))
                    for b in range(4)
                ]
            )
        ).alias("blk", "bval"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the
    near-dup pair graph by min-label propagation — the step that
    turns PAIRS into CLUSTERS so exactly one canonical document per
    component survives (the standard dedup endgame; the distributed
    min-label loop is the classic large-scale CC algorithm).

    Deterministic: every node converges to the MINIMUM id reachable
    in its component — min is order-independent, so the result is
    identical regardless of execution order (and a recursive-CTE
    oracle reproduces it; the oracle is algorithm-independent, it
    pins the min-reachable fixpoint itself).

    Round structure (shallow graphs cheap, deep graphs log-bounded):
    - iteration 0 skips the edge⋈label join entirely — labels are
      the identity map, so min-neighbor is just groupBy(dst).min(src)
    - iterations 0-1 run plain min-label propagation: one
      groupBy(min) per round, optimal for the shallow components
      near-dup dedup actually produces (diameter 1-2)
    - from iteration 2 on (a deep component is evidently present)
      each round adds pointer doubling — label <- label(label), the
      anchor-compression step — so the propagation horizon doubles
      per round and total rounds are O(log diameter) instead of
      O(diameter) (Kiveris et al., 'Connected Components in
      MapReduce and Beyond')
    Output: (id, cluster_rep, is_canonical)."""
    # symmetrize in ONE scan of the (possibly expensive) pair
    # derivation — a two-leg union would compute it twice. No
    # .distinct(): min-agg is idempotent to duplicate edges, and the
    # dedupe would shuffle the whole edge set for nothing.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                    ),
                    F.struct(
                        F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .cache()
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).cache()
    for it in range(max_iter):
        if it == 0:
            # labels is the identity map on round 0: joining it in
            # would map src -> src, so skip the join
            msgs = (
                edges.groupBy(F.col("dst").alias("id"))
                .agg(F.min("src").alias("nbr_min"))
            )
        else:
            msgs = (
                edges.join(labels, edges["src"] == labels["id"])
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("label").alias("nbr_min"))
            )
        # the changed flag rides the label frame itself (new < old
        # iff a neighbor message beat the old label) — detecting the
        # fixpoint needs no second join-and-count pass per iteration
        new_labels = (
            labels.join(msgs, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_min"), F.col("label")) < F.col("label"))
                .alias("_chg"),
            )
        )
        if it >= 2:
            # pointer doubling: a component still unconverged after
            # two rounds has depth — compress paths so remaining
            # rounds go log(diameter). Cache the stepped frame: the
            # doubling join reads it twice.
            stepped = new_labels.cache()
            lmap = stepped.select(
                F.col("id").alias("_lid"), F.col("label").alias("_llab")
            )
            new_labels = (
                stepped.join(lmap, stepped["label"] == lmap["_lid"], "left")
                .select(
                    "id",
                    F.coalesce("_llab", "label").alias("label"),
                    (
                        F.col("_chg")
                        | (F.coalesce("_llab", "label") < F.col("label"))
                    ).alias("_chg"),
                )
            )
        else:
            stepped = None
        if it >= 2:
            # truncate lineage EVERY doubling round: the self-join
            # references the label frame twice, so the logical plan
            # would otherwise double per round (cache feeds execution
            # but does not truncate the plan). Doubling rounds are
            # O(log diameter), so an eager checkpoint per round is
            # cheap — and keeps the driver DAG flat and executor-loss
            # recovery bounded at real scale.
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.cache()
        # iteration 0 cannot converge unless the edge set is empty —
        # any edge moves a label on the first round — so skip its
        # convergence action entirely: the first Spark job then fires
        # at iteration 1 and pipelines edge-cache fill, round 0, and
        # round 1 through one scheduling barrier instead of three
        # (an empty edge set just pays one no-op extra round)
        converged = it > 0 and new_labels.filter(F.col("_chg")).isEmpty()
        labels.unpersist()
        if stepped is not None:
            stepped.unpersist()
        labels = new_labels
        if converged:
            break
    edges.unpersist()
    return labels.select(
        F.col("id"),
        F.col("label").alias("cluster_rep"),
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )


def _span_windows(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, start, wh): every k-token window per doc with its md5
    window hash; 0-based token start. Pure per-row map — tokenize
    once (projected column, survives CollapseProject), one explode,
    no shuffle. Docs shorter than k tokens yield no windows."""
    tokd = df.select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    return (
        tokd.where(F.size(toks) >= k)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.md5(
                            F.array_join(F.slice(toks, i + 1, k), " ")
                        ).alias("wh"),
                    ),
                )
            ).alias("w"),
        )
        .select("id", "w.start", "w.wh")
    )


def _merge_islands(hits: DataFrame, k: int) -> DataFrame:
    """Shared gaps-and-islands merge for the ExactSubstr pair:
    (id, start) window-hit rows -> (id, start, _island), where
    _island labels each maximal run of overlapping/adjacent k-token
    windows (fixed window length makes the overlap test a lag on
    start alone: new island iff the gap exceeds k). Both the span
    report and the removal rewrite derive from this one labeling —
    keep the island rule here so they cannot drift apart."""
    w_ord = Window.partitionBy("id").orderBy("start")
    return hits.select(
        "id",
        "start",
        F.when(
            F.col("start") - F.lag("start").over(w_ord) > k, 1
        ).otherwise(0).alias("_new"),
    ).select("id", "start", F.sum("_new").over(w_ord).alias("_island"))


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_docs: int = 2,
    max_window_df: int | None = None,
) -> DataFrame:
    """Cross-document duplicated k-token spans — the ExactSubstr
    dedup signal (Lee et al. 2022, arXiv:2107.06499) re-expressed
    Spark-first. Returns one row per maximal duplicated span:
    (doc_id, span_start, span_end, span_tokens, n_windows), token
    positions 0-based, span_end exclusive.

    Where the reference's `dedupe` transform (src/transforms/
    dedupe.rs) drops whole duplicate EVENTS, training-data curation
    needs the sub-document form: boilerplate headers, license
    blocks, and templated paragraphs duplicate across otherwise
    distinct documents, and removing the span (not the doc) is the
    published-best treatment.

    100 TB shape: windows are a per-row map (no shuffle); the only
    corpus-sized exchange is ONE hash partition on the window hash.
    Duplicate detection is a window aggregate over that partitioning
    (min(id) != max(id) for the default min_docs=2 — no distinct-agg
    re-shuffle, no join, no candidate-pair quadratic term). The
    island merge then shuffles only the HIT set (duplicated-window
    occurrences), which is tiny relative to the corpus.
    `max_window_df` caps pathological boilerplate before the
    per-doc merge (a window in D docs contributes D hit rows).
    """
    win = _span_windows(df, id_col, text_col, k)
    w_wh = Window.partitionBy("wh")
    marked = win.select(
        "id",
        "start",
        F.min("id").over(w_wh).alias("_mn"),
        F.max("id").over(w_wh).alias("_mx"),
        *(
            [F.size(F.collect_set("id").over(w_wh)).alias("_nd")]
            if min_docs > 2
            else []
        ),
        *(
            [F.count(F.lit(1)).over(w_wh).alias("_occ")]
            if max_window_df is not None
            else []
        ),
    )
    cond = (
        F.col("_nd") >= min_docs
        if min_docs > 2
        else F.col("_mn") != F.col("_mx")
    )
    if max_window_df is not None:
        cond = cond & (F.col("_occ") <= max_window_df)
    hits = marked.where(cond).select("id", "start")
    # merge overlapping/adjacent windows into maximal spans
    isl = _merge_islands(hits, k)
    return (
        isl.groupBy("id", "_island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
            "n_windows",
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    max_window_df: int | None = None,
) -> DataFrame:
    """ExactSubstr REMOVAL: rewrite each doc's text with duplicated
    k-token spans cut everywhere except their canonical (min doc_id,
    then min start) occurrence — (doc_id, clean_text, n_tokens,
    n_removed_tokens). Tokens are lowercase/whitespace-normalized
    (same normalization the detection hashes on).

    Same single corpus-sized exchange as duplicate_spans (window
    aggregates over the wh partitioning — no join); the
    reconstruction is a per-row filter over the token array driven
    by a per-doc removal-interval list, so the text stream never
    shuffles — only (id, start) hit rows do.
    """
    win = _span_windows(df, id_col, text_col, k)
    w_wh = Window.partitionBy("wh")
    marked = win.select(
        "id",
        "start",
        F.min("id").over(w_wh).alias("_mn"),
        F.max("id").over(w_wh).alias("_mx"),
        F.min(F.struct("id", "start")).over(w_wh).alias("_canon"),
        *(
            [F.count(F.lit(1)).over(w_wh).alias("_occ")]
            if max_window_df is not None
            else []
        ),
    )
    # every duplicated-window occurrence EXCEPT the canonical one
    cond = (F.col("_mn") != F.col("_mx")) & (
        (F.col("id") != F.col("_canon.id"))
        | (F.col("start") != F.col("_canon.start"))
    )
    if max_window_df is not None:
        cond = cond & (F.col("_occ") <= max_window_df)
    hits = marked.where(cond).select("id", "start")
    # merge to maximal removal intervals per doc, then collect the
    # (start, end) list — bounded: intervals per doc <= n_tokens/1
    isl = _merge_islands(hits, k)
    spans = (
        isl.groupBy("id", "_island")
        .agg(
            F.min("start").alias("s"),
            (F.max("start") + k).alias("e"),
        )
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("_rm"))
    )
    tokd = df.select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    joined = tokd.join(spans, "id", "left")
    toks = F.col("_toks")
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.coalesce(F.col("_rm"), F.array()),
            lambda r: (s["i"] >= r["s"]) & (s["i"] < r["e"]),
        ),
    )
    return joined.select(
        F.col("id").alias("doc_id"),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias(
            "clean_text"
        ),
        F.size(toks).alias("n_tokens"),
        (F.size(toks) - F.size(kept)).alias("n_removed_tokens"),
    )
