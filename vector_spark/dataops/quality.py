"""Repetition / quality filter rules for pre-training corpora, after
the published Gopher rules (Rae et al. 2021, "Scaling Language Models",
appendix A1.1) re-expressed as deterministic, SQL-portable arithmetic:

* n_tokens bounds                  (word count 50..100_000)
* mean token length bounds         (3..10 chars)
* duplicate-token fraction         (1 - distinct/total)
* top-bigram coverage fraction     (chars covered by the bigram that
                                    covers the most characters / chars
                                    of the token stream)
* alphabetic-word fraction         (words containing >=1 letter)

Every metric is a pure Column expression over the token array —
per-row JVM work, ZERO shuffle, which is the point at 100 TB: quality
filtering is a map-only stage that runs at scan speed. The bigram
coverage uses array_distinct + filter counting (O(distinct x n) per
row, bounded by document length), not an explode/groupBy — no
shuffle-per-document.

Thresholds are tuned so the synthetic corpus splits (docs of 10..99
tokens with dup fractions around 0.5); real deployments tune them
per-corpus, the plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.dataops.text import mean_token_len, token_count, tokens

# rule thresholds (documented corpus-tunable knobs)
MIN_TOKENS = 50
MAX_TOKENS = 100_000
MIN_MEAN_TOKEN_LEN = 3.0
MAX_MEAN_TOKEN_LEN = 10.0
MAX_DUP_TOKEN_FRAC = 0.55
MAX_TOP_BIGRAM_FRAC = 0.20
MIN_ALPHA_WORD_FRAC = 0.90


def dup_token_frac_tokens(toks: Column) -> Column:
    return F.round(
        1.0 - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)),
        6,
    )


def dup_token_frac(col: Column) -> Column:
    return dup_token_frac_tokens(tokens(col))


def alpha_word_frac_tokens(toks: Column) -> Column:
    alpha = F.filter(toks, lambda t: t.rlike("[a-z]"))
    return F.round(F.size(alpha) / F.greatest(F.size(toks), F.lit(1)), 6)


def alpha_word_frac(col: Column) -> Column:
    return alpha_word_frac_tokens(tokens(col))


def top_bigram_frac(col: Column) -> Column:
    """Fraction of token-stream characters covered by the bigram that
    covers the most characters (count x length, space included) —
    the Gopher "fraction of characters in most common 2-gram" rule
    with a deterministic tie rule (max coverage, not max count).

    Implementation note: sort the bigram array once and take the max
    of run_length x strlen in a single aggregate() pass. The naive
    transform(array_distinct(bg), g -> size(filter(bg, =g)))
    formulation re-evaluates the whole bigram-array EXPRESSION per
    distinct element (Catalyst does not CSE inside lambda bodies),
    which measured ~12x slower at sf0.1; the run-length form
    evaluates every array exactly once per row."""
    return top_bigram_frac_tokens(tokens(col))


def top_bigram_frac_tokens(toks: Column) -> Column:
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    best = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(1).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(1)
                * F.length(x),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    stream_chars = F.length(F.array_join(toks, " "))
    # count x length over-counts OVERLAPPING occurrences ('a a a' has
    # two 'a a' bigrams sharing the middle token: 6 covered chars in
    # a 5-char stream) — clamp so the metric honors its [0,1]
    # "fraction covered" contract; the oracle applies the same least()
    return F.round(
        F.least(best / F.greatest(stream_chars, F.lit(1)), F.lit(1.0)), 6
    )


def gopher_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, metrics..., gopher_pass) — flags are computed from the
    ROUNDED metrics so both engines sit on the same side of every
    threshold boundary.

    The token array is projected ONCE and every metric reads the
    column: inlining tokens() into each metric re-evaluates the
    split per reference (~10 per row across the five rules). A
    multiply-referenced non-cheap alias survives CollapseProject."""
    tokd = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    mtl = F.round(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        / F.greatest(F.size(toks), F.lit(1)),
        6,
    )
    out = tokd.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        mtl.alias("mean_token_len"),
        dup_token_frac_tokens(toks).alias("dup_token_frac"),
        top_bigram_frac_tokens(toks).alias("top_bigram_frac"),
        alpha_word_frac_tokens(toks).alias("alpha_word_frac"),
    )
    passed = (
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_tokens") <= MAX_TOKENS)
        & (F.col("mean_token_len") >= MIN_MEAN_TOKEN_LEN)
        & (F.col("mean_token_len") <= MAX_MEAN_TOKEN_LEN)
        & (F.col("dup_token_frac") <= MAX_DUP_TOKEN_FRAC)
        & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC)
        & (F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC)
    )
    return out.select("*", passed.alias("gopher_pass"))
