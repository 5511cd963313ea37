"""Corpus mixing for pre-training pipelines: stratified sampling,
deterministic train/validation split assignment, and a unigram-LM
quality score (the CCNet-style perplexity proxy).

Determinism contract: every decision derives from md5 integer
arithmetic (the repo's portable-hash idiom — Spark
`conv(substr(md5(x),1,15),16,10)` == DuckDB
`('0x'||substr(md5(x),1,15))::BIGINT`), so the DuckDB oracle
reproduces membership bit-for-bit; no Spark `rand()` anywhere.

Scale notes: sampling and splits are pure per-row Column arithmetic
(zero shuffle, map stage at scan speed). The unigram score has two
forms: `unigram_logprob` keeps the vocabulary in a broadcast
element_at map and loops tokens per-row LEFT-TO-RIGHT (deterministic
float summation -> oracle-exact; right for bounded vocabularies), and
`unigram_logprob_join` is the 100 TB shape (explode -> broadcast join
-> per-doc aggregate; float sum order is partition-dependent, so it
is the throughput twin, equality-tested at fixed precision)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.dataops.text import tokens


def _hash_pct(col: Column, salt: str) -> Column:
    """Deterministic [0, 100) bucket from md5 of salt||value — the
    portable integer idiom, exactly reproducible in DuckDB."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15),
        16, 10,
    ).cast("bigint")
    return F.pmod(h, F.lit(100))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    default_rate: int = 100,
) -> DataFrame:
    """Keep `rates[stratum]` percent of each stratum (0-100),
    membership decided by the document's hash bucket — stable across
    runs and engines, no shuffle. The standard corpus-mixing knob
    (downweight over-represented languages/sources)."""
    rate = F.lit(default_rate)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(int(pct))).otherwise(rate)
    return (
        df.withColumn("_keep_pct", rate)
        .filter(_hash_pct(F.col(id_col), "sample:") < F.col("_keep_pct"))
        .drop("_keep_pct")
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by document hash —
    documents never migrate between splits when the corpus grows
    (membership depends only on the id, not on position)."""
    b = _hash_pct(F.col(id_col), "split:")
    return df.withColumn(
        out_col,
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def token_quota_filter(
    df: DataFrame,
    quotas: dict[str, int],
    default_quota: int = 0,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budgeted corpus mixing: keep documents per source shard
    (in doc_id order) while the INCLUSIVE running token total stays
    within that source's quota — how a mixing recipe like 'at most
    N tokens of web, M of code' is executed deterministically:
    (doc_id, group, n_tokens, cum_tokens, kept).

    One window per group (one shuffle). n_tokens >= 0 makes the
    running total monotone, so 'kept' is a prefix of each shard —
    the greedy fill — and the SQL-oracle reproduces it exactly.
    """
    from itertools import chain

    from pyspark.sql import Window

    quota_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(quotas.items())]
    )
    w = (
        Window.partitionBy("group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("group"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    return base.select(
        "doc_id",
        "group",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        (
            F.sum("n_tokens").over(w)
            <= F.coalesce(
                quota_map[F.col("group")], F.lit(default_quota)
            ).cast("bigint")
        ).alias("kept"),
    )


def build_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, cnt) over the corpus — one explode + one aggregation.
    Vocabularies are zipfian: even web scale stays broadcastable
    after a min-count cut."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: dict[str, int] | None = None,
    oov_count: int = 1,
) -> DataFrame:
    """(id, n_tokens, avg_logprob): mean ln p(token) under the corpus
    unigram model — low scores flag gibberish / OOV-heavy documents
    (the CCNet perplexity-filter shape with a unigram LM).

    `vocab` (token -> count) is embedded as a literal map and the
    per-doc sum runs left-to-right inside one aggregate() — float
    summation order is deterministic, so the DuckDB oracle matches
    exactly. When vocab is None it is computed from df (two passes)."""
    if vocab is None:
        vocab = {
            r["token"]: r["cnt"] for r in build_vocab(df, text_col).collect()
        }
    total = sum(vocab.values())
    entries: list[Column] = []
    for t in sorted(vocab):
        entries.append(F.lit(t))
        entries.append(F.lit(float(vocab[t])))
    vocab_map = F.create_map(*entries) if entries else F.create_map()
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    logprob_sum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + F.log(
            F.coalesce(F.element_at(vocab_map, t), F.lit(float(oov_count)))
            / F.lit(float(total))
        ),
    )
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        F.round(logprob_sum / F.greatest(n, F.lit(1)), 6).alias("avg_logprob"),
    )


def unigram_logprob_join(
    df: DataFrame,
    vocab_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_count: int = 1,
) -> DataFrame:
    """The 100 TB shape of unigram_logprob: explode tokens, broadcast
    join the vocabulary, aggregate per document. Sum order is
    partition-dependent (floats), so results match the literal-map
    form at fixed precision, not bit-for-bit — the throughput twin."""
    total = vocab_df.agg(F.sum("cnt")).collect()[0][0]
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    scored = toks.join(F.broadcast(vocab_df), "token", "left").select(
        id_col,
        F.log(
            F.coalesce(F.col("cnt"), F.lit(oov_count)).cast("double")
            / F.lit(float(total))
        ).alias("lp"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )
    # zero-token docs produce no exploded rows and would vanish from
    # the output — the literal-map twin emits (id, 0, 0.0) for them,
    # and a downstream join on the scores must not silently drop
    # documents. Left-join back from the id universe.
    ids = df.select(F.col(id_col))
    return ids.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
        F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
    )


def score_deciles(
    df: DataFrame,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """Per-group quantile bucketing for stratified curation:
    (doc_id, group, score, bucket 1..n_buckets).

    The window orders by (score, id) so ties break deterministically
    and the SQL oracle replays every bucket edge. Partitioned per
    group — at 100 TB each source's ntile runs independently; there
    is deliberately NO global (unpartitioned) variant, which would
    funnel the corpus through one task. Use an integer-valued score
    (token counts, char counts) for cross-engine exactness; float
    scores can differ in final-ulp order between engines.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(score_col, id_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("group"),
        F.col(score_col).alias("score"),
        F.ntile(n_buckets).over(w).alias("bucket"),
    )


def balanced_sample(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "bal",
) -> DataFrame:
    """Exact per-group subsampling: keep exactly min(k, |group|) rows
    per group, chosen by deterministic hash order —
    (doc_id, group, rank, kept).

    Class-balanced corpus construction ("equal documents per
    source") needs exact quotas, which rate-based sampling
    (stratified_sample) cannot give. Hash order makes the pick
    uniform-ish AND reproducible: rank = row_number over
    (md5(salt:id), id) per group, kept = rank <= k. One window per
    group (single shuffle); no global ordering anywhere.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col))), F.col(id_col)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("group"),
        F.row_number().over(w).alias("rank"),
    ).withColumn("kept", F.col("rank") <= k)
