"""Text analysis for training-data pipelines: token stats, quality
scoring, language ID, fingerprinting.

Everything here is a pure Column expression (JVM, codegen'd) except
`lang_id_udf`, which is a pandas UDF over Arrow batches (character
n-gram profile heuristic — genuinely needs per-string Python, kept
vectorized batch-wise).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
]


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[^\w\s]", "")
    return F.round(
        (F.length(col) - F.length(stripped))
        / F.greatest(F.length(col), F.lit(1)),
        6,
    )


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    stops = F.filter(
        toks, lambda t: t.isin(STOPWORDS)
    )
    return F.round(F.size(stops) / F.greatest(F.size(toks), F.lit(1)), 6)


def mean_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane mean
    token length, low punctuation, some stopwords (prose-ness).
    Deterministic and SQL-portable (oracle replicates it)."""
    n = token_count(col)
    len_ok = F.when((n >= 10) & (n <= 5000), 1.0).otherwise(0.3)
    mtl = mean_token_len(col)
    mtl_ok = F.when((mtl >= 3.0) & (mtl <= 12.0), 1.0).otherwise(0.4)
    punct_ok = F.when(punct_ratio(col) <= 0.2, 1.0).otherwise(0.5)
    stop_ok = F.when(stopword_ratio(col) >= 0.05, 1.0).otherwise(0.6)
    return F.round((len_ok * 0.3 + mtl_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.2), 6)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        char_count(c).alias("n_chars"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        mean_token_len(c).alias("mean_token_len"),
        quality_score(c).alias("quality_score"),
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text — the canonical exact-dedup key."""
    return F.md5(F.regexp_replace(F.trim(F.lower(col)), r"\s+", " "))


# BPE-ish token estimate: words + punctuation marks + long-word splits
def token_estimate(col: Column) -> Column:
    """Approximate LLM token count: one per ~4 chars of word text
    plus one per punctuation symbol — cheap, portable, good enough
    for budget accounting."""
    word_chars = F.length(F.regexp_replace(col, r"[^\w]", ""))
    puncts = F.length(F.regexp_replace(col, r"[\w\s]", ""))
    return (F.ceil(word_chars / 4) + puncts).cast("bigint")


_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"th", "he", "in", "er", "an", "re", "on", "at", " t", "e "},
    "es": {"de", "la", "os", "el", "en", "ue", "ci", "a ", "o ", " d"},
    "fr": {"le", "de", "es", "en", "on", "nt", "ou", "e ", " l", "ai"},
    "de": {"en", "er", "ch", "de", "ei", "ie", "in", "un", " d", "n "},
    "zh": set(),  # CJK detected by codepoint range, not bigrams
}


@pandas_udf(T.StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """Character-bigram profile language guesser (vectorized batch;
    the per-string work is a tiny Python loop over already-batched
    Arrow data — the classic heuristic, not per-row UDF dispatch)."""

    def guess(t: str) -> str:
        if not t:
            return "und"
        if any("一" <= ch <= "鿿" for ch in t[:200]):
            return "zh"
        t2 = t[:500].lower()
        bigrams = [t2[i : i + 2] for i in range(len(t2) - 1)]
        if not bigrams:
            return "und"
        best, best_hits = "und", 0
        for lang, prof in _LANG_PROFILES.items():
            if not prof:
                continue
            hits = sum(1 for b in bigrams if b in prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    return texts.map(guess)
