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
    """Per-document text metrics in ONE pass over a projected token
    array (inlining tokens() into each metric re-evaluates the split
    per reference — see quality.gopher_quality); quality_score is
    derived from the already-rounded metric COLUMNS, which is exactly
    the per-text helper's arithmetic."""
    c = F.col(text_col)
    tokd = df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        punct_ratio(c).alias("punct_ratio"),
        tokens(c).alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    stops = F.filter(toks, lambda t: t.isin(STOPWORDS))
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    base = tokd.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.col("n_chars"),
        F.col("punct_ratio"),
        F.round(F.size(stops) / F.greatest(n, F.lit(1)), 6).alias(
            "stopword_ratio"
        ),
        F.round(total / F.greatest(n, F.lit(1)), 6).alias("mean_token_len"),
    )
    len_ok = F.when(
        (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 5000), 1.0
    ).otherwise(0.3)
    mtl_ok = F.when(
        (F.col("mean_token_len") >= 3.0) & (F.col("mean_token_len") <= 12.0),
        1.0,
    ).otherwise(0.4)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    stop_ok = F.when(F.col("stopword_ratio") >= 0.05, 1.0).otherwise(0.6)
    return base.select(
        "*",
        F.round(
            len_ok * 0.3 + mtl_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.2, 6
        ).alias("quality_score"),
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


_LANGID_STATE: dict = {}


def guess_language(t: str) -> str:
    """Language ID for one string: Unicode-script decision first
    (zh/ja/ko/ar/he/el/th/hi + cyrillic ru/uk split), then classic
    Cavnar-Trenkle out-of-place trigram-rank distance against the
    18 Latin-script profiles in langid_data.py, with distinctive-
    orthography bonuses (ã->pt, ß->de, ...) to separate close
    relatives."""
    from collections import Counter

    from vector_spark.dataops.langid_data import (
        DISTINCTIVE_CHARS,
        FUNCTION_WORDS,
        RU_CHARS,
        SCRIPT_RANGES,
        TRIGRAM_PROFILES,
        UK_CHARS,
    )

    if "prof_ranks" not in _LANGID_STATE:
        _LANGID_STATE["prof_ranks"] = {
            lang: {g: r for r, g in enumerate(grams)}
            for lang, grams in TRIGRAM_PROFILES.items()
        }
    prof_ranks = _LANGID_STATE["prof_ranks"]
    TOP_K = 40
    MISSING = TOP_K  # out-of-place penalty for absent trigrams
    CHAR_BONUS = 2 * MISSING

    if not t:
        return "und"
    head = t[:400]
    # full-head script census: kana/hangul outrank ideographs (range
    # list order), ja/ko text mixes kanji/hanja freely
    script_hits: dict[str, int] = {}
    latin_alpha = 0
    for ch in head:
        cp = ord(ch)
        if ch.isalpha() and cp < 0x250:  # Latin incl. extended
            latin_alpha += 1
            continue
        for lo, hi, lang in SCRIPT_RANGES:
            if lo <= cp <= hi:
                script_hits[lang] = script_hits.get(lang, 0) + 1
                break
    # a quoted Greek letter or one Cyrillic name must not override a
    # Latin-script document: the non-Latin census wins only when it's
    # a real presence next to the Latin content, not a stray glyph
    total_script = sum(script_hits.values())
    if script_hits and total_script < max(3, latin_alpha // 5):
        script_hits = {}
    if script_hits:
        for _, _, lang in SCRIPT_RANGES:  # priority order
            if script_hits.get(lang):
                if lang != "ru":
                    return lang
                low = head.lower()
                uk = sum(1 for c in low if c in UK_CHARS)
                ru = sum(1 for c in low if c in RU_CHARS)
                return "uk" if uk > ru else "ru"
    low = " " + head.lower() + " "
    grams = Counter(low[i : i + 3] for i in range(len(low) - 2))
    if not grams:
        return "und"
    doc_top = [g for g, _ in grams.most_common(TOP_K)]
    bonus: Counter = Counter()
    for c in low:
        langs = DISTINCTIVE_CHARS.get(c)
        if langs:
            for lang in langs:
                bonus[lang] += CHAR_BONUS / len(langs)
    # word-level evidence: function words separate close relatives
    # (fr/it, no/da/sv) whose trigram profiles overlap heavily. A
    # word shared by k languages splits its weight k ways (same rule
    # as DISTINCTIVE_CHARS) so shared Scandinavian forms never tip
    # the scale toward the wrong sibling.
    if "word_langs" not in _LANGID_STATE:
        inv: dict[str, list[str]] = {}
        for lang, ws in FUNCTION_WORDS.items():
            for w in ws:
                inv.setdefault(w, []).append(lang)
        _LANGID_STATE["word_langs"] = inv
    word_langs = _LANGID_STATE["word_langs"]
    words = low.replace("'", " ").replace("’", " ").split()
    WORD_BONUS = CHAR_BONUS // 2
    wbonus: Counter = Counter()
    for w in words:
        langs = word_langs.get(w.strip(".,;:!?()\"«»"))
        if langs:
            for lang in langs:
                wbonus[lang] += WORD_BONUS / len(langs)
    for lang, b in wbonus.items():
        bonus[lang] += min(b, 8 * CHAR_BONUS)
    best, best_score = "und", float("inf")
    for lang, ranks in prof_ranks.items():
        dist = sum(
            abs(i - ranks[g]) if g in ranks else MISSING
            for i, g in enumerate(doc_top)
        )
        score = dist - min(bonus.get(lang, 0), 18 * CHAR_BONUS)
        if score < best_score:
            best, best_score = lang, score
    return best


@pandas_udf(T.StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """guess_language over Arrow batches — the per-string work is a
    tight loop over already-batched data, never per-row UDF
    dispatch."""
    return texts.map(guess_language)


def ordered_struct(order_col, text_expr: Column) -> Column:
    """(o, t) struct for order-sensitive collect+join: collect_list
    carries NO order guarantee, so the sort key rides along."""
    return F.struct(F.col(order_col).alias("o"), text_expr.alias("t"))


def join_sorted(collected: Column, sep: str) -> Column:
    """Join the texts of a collected array<struct<o,t>> in o-order:
    array_sort keys on the leading struct field. The single home of
    the sorted-collect-join idiom (conversation fingerprints, turn
    repair, context windows, pack assembly)."""
    return F.array_join(
        F.transform(F.array_sort(collected), lambda s: s["t"]), sep
    )


# BPE-ish pre-tokenizer (GPT-2 style, simplified to RE2-safe syntax:
# no lookahead, so DuckDB's regexp_extract_all replays it verbatim):
# contraction suffixes, space-prefixed letter runs, space-prefixed
# digit runs, space-prefixed punctuation runs, residual whitespace
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[a-zA-Z]+"
    r"| ?[0-9]+"
    r"| ?[^a-zA-Z0-9\s]+"
    r"|\s+"
)


def bpe_ish_token_count(col: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer — the budget unit
    an LLM pipeline actually bills in, minus the merge table (merges
    only split finer, so this upper-bounds piece count per word run
    while tracking it far better than chars/4)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)).cast(
        "int"
    )
