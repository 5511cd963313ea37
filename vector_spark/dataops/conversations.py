"""Conversation-level dataops over the transcripts payload —
whole-conversation rollups for training-data curation: exact
conversation dedup (order-sensitive content fingerprint + canonical
election) and per-conversation shape statistics.

Both are single-shuffle groupBy(conv_id) plans. The per-group
collect_list in the fingerprint is bounded by conversation LENGTH
(turns per conversation), never by corpus size — the safe kind of
per-key state at 100 TB, same contract as the reduce operator's
merge strategies (src/transforms/reduce/mod.rs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ASCII unit separator: cannot appear in the transcript text (the
# derivation is printable), so the turn join is injection-free
_US = "\x1f"


def conversation_fingerprints(
    df: DataFrame,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Exact conversation dedup: (conv_id, n_turns, fingerprint,
    canonical_id, is_dup).

    The fingerprint is md5 over the turn texts joined in turn order
    (order-SENSITIVE: two conversations with the same turns in a
    different order are different conversations). Canonical election
    is min(conv_id) per fingerprint — deterministic, so an SQL
    oracle reproduces every label. Two shuffles: the groupBy(conv)
    rollup and the per-fingerprint window.
    """
    per_conv = df.groupBy(F.col(key_col).alias("conv_id")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(order_col).alias("o"),
                                F.col(text_col).alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                _US,
            )
        ).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint")
    return per_conv.select(
        "conv_id",
        "n_turns",
        "fingerprint",
        F.min("conv_id").over(w).alias("canonical_id"),
        (F.col("conv_id") != F.min("conv_id").over(w)).alias("is_dup"),
    )


def conversation_stats(parsed: DataFrame) -> DataFrame:
    """Per-conversation shape statistics for curation filters:
    (conv_id, n_turns, n_user, n_assistant, n_tool_turns, n_errors,
    total_chars, latency_sum, duration_s).

    Input is the PARSED transcripts frame (level / latency_ms
    available). One shuffle: a single groupBy(conv_id) with partial
    aggregation — every metric is an algebraic aggregate, nothing
    collects.
    """
    return (
        parsed.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
            F.sum((F.col("role") == "assistant").cast("long")).alias(
                "n_assistant"
            ),
            F.sum(
                (F.col("tool").isNotNull() & (F.col("tool") != "none")).cast(
                    "long"
                )
            ).alias("n_tool_turns"),
            F.sum((F.col("level") == "ERROR").cast("long")).alias("n_errors"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum("latency_ms").alias("latency_sum"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("duration_s"),
        )
    )
