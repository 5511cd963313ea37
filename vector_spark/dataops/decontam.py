"""Benchmark decontamination: flag training documents that share any
word n-gram with a held-out evaluation/benchmark set (the GPT-3 /
PaLM decontamination procedure — exact n-gram collision against the
benchmark, applied before training).

Scale shape: the benchmark side is SMALL by definition (eval suites
are thousands of documents, the corpus is billions), so its distinct
shingle set is **broadcast** — the corpus side never shuffles for the
probe; candidate counting is a map-side hash-join plus a partial
aggregate keyed on doc_id. At 100 TB this stage runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.dataops.text import tokens


def token_shingles(tok_col: Column, n: int = 5) -> Column:
    """Distinct word n-grams from an already-projected token-array
    column. Guarded: Spark's sequence() descends when stop < start,
    so short docs get an explicit empty array.

    The token array must be a column of its own projection — inlining
    the tokenization here replicates its subtree per gram element
    (O(len^2) splitting; measured 6x on the sf0.1 documents table).
    A multiply-referenced non-cheap alias survives CollapseProject
    and is evaluated once per row."""
    size = F.size(tok_col)
    grams = F.transform(
        F.sequence(F.lit(1), size - (n - 1)),
        lambda i: F.array_join(F.slice(tok_col, i, n), " "),
    )
    return F.array_distinct(
        F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def shingles(col: Column, n: int = 5) -> Column:
    """Distinct word n-grams of the lowercased token stream. Prefer
    projecting tokens() to a column and calling token_shingles — this
    single-expression form embeds the tokenization once per reference
    (see token_shingles docstring)."""
    return token_shingles(tokens(col), n)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(id, n_hits, contaminated) for every corpus document.

    n_hits = number of distinct corpus-document n-grams that occur
    anywhere in the benchmark set; contaminated = n_hits >= 1.
    Zero-hit documents are kept (left join) so the output is a
    complete per-document verdict, not just the positives.
    """
    bench_shingles = (
        benchmark.select(tokens(F.col(text_col)).alias("_toks"))
        .select(F.explode(token_shingles(F.col("_toks"), n)).alias("shingle"))
        .distinct()
    )
    corpus_shingles = corpus.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col), F.explode(token_shingles(F.col("_toks"), n)).alias("shingle")
    )
    hits = (
        corpus_shingles.join(F.broadcast(bench_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
