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

from vector_spark.dataops.text import join_sorted, ordered_struct

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
            join_sorted(
                F.collect_list(ordered_struct(order_col, F.col(text_col))),
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


def pack_conversations(
    df: DataFrame,
    budget: int = 1024,
    n_shards: int = 8,
    key_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Conversation-boundary-preserving token packing: assign whole
    conversations to ``budget``-token training sequences —
    (conv_id, shard, n_turns, conv_tokens, pack_id, pack_pos).

    SFT packing must never split a conversation across sequences,
    so the packable unit is the CONVERSATION: per-conv token totals
    roll up first (one groupBy), then the contiguous-fill rule from
    pack_documents (pack_id = floor(exclusive-cumsum / budget))
    runs per md5-derived shard in conv_id order. Shards are
    independent — at 100 TB packing parallelizes across n_shards
    windows with no global coordination, and n_shards scales with
    the cluster, not the data. Two shuffles total (rollup + shard
    window); per-key state is one running sum.
    """
    if n_shards <= 0:
        # % 0 is NULL in non-ANSI Spark: every row would land in one
        # NULL shard partition with corpus-wide pack ids — fail loudly
        raise ValueError("n_shards must be positive")
    from vector_spark.dataops.dedup import token_int
    from vector_spark.dataops.packing import contiguous_fill
    from vector_spark.dataops.text import tokens

    per_conv = df.groupBy(F.col(key_col).alias("conv_id")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.size(tokens(F.col(text_col))))
        .cast("bigint")
        .alias("conv_tokens"),
    )
    sharded = per_conv.withColumn(
        "shard",
        (
            token_int(F.concat(F.lit("pack:"), F.col("conv_id"))) % n_shards
        ).cast("int"),
    )
    return contiguous_fill(
        sharded, "shard", "conv_id", "conv_tokens", budget
    ).select(
        "conv_id", "shard", "n_turns", "conv_tokens", "pack_id", "pack_pos"
    )


def conversation_quality(df: DataFrame) -> DataFrame:
    """Per-conversation curation heuristics over raw transcripts:
    (conv_id, n_turns, n_role_repeats, starts_with_user,
    ends_with_assistant, n_blank, assistant_chars, user_chars,
    char_ratio, quality_ok).

    The transcript-shape signals chat-SFT filters actually gate on:
    adjacent same-role turns (role-alternation violations, via one
    lag window), who opens / closes the conversation (min_by /
    max_by on the unique turn_idx), blank turns, and the
    assistant:user volume ratio. The lag window and the rollup
    share the conv_id key, so the window's exchange is reused by
    the final groupBy — one shuffle, all-algebraic aggregates.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.lag("role").over(w).alias("_prev_role"),
    )
    # coalesce length(NULL) per row: a conversation of only NULL-text
    # assistant turns must sum to 0, not NULL (else char_ratio and any
    # downstream gate comparing it silently evaluates to NULL)
    _len0 = F.coalesce(F.length("text"), F.lit(0))
    a_chars = F.sum(
        F.when(F.col("role") == "assistant", _len0).otherwise(F.lit(0))
    ).cast("bigint")
    u_chars = F.sum(
        F.when(F.col("role") == "user", _len0).otherwise(F.lit(0))
    ).cast("bigint")
    agg = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        # coalesce per row: a 1-turn conversation's lag is all-NULL and
        # a bare sum of NULLs is NULL, not 0
        F.sum(
            F.coalesce(
                (F.col("role") == F.col("_prev_role")).cast("long"), F.lit(0)
            )
        ).alias("n_role_repeats"),
        (F.min_by("role", "turn_idx") == "user").alias("starts_with_user"),
        (F.max_by("role", "turn_idx") == "assistant").alias(
            "ends_with_assistant"
        ),
        # same coalesce as n_role_repeats: NULL text rows must count
        # as 0 (matching the oracle's CASE ... ELSE 0), not poison the
        # sum into NULL
        F.sum(
            F.coalesce(
                (F.length(F.trim(F.col("text"))) == 0).cast("long"), F.lit(0)
            )
        ).alias("n_blank"),
        a_chars.alias("assistant_chars"),
        u_chars.alias("user_chars"),
    )
    return agg.select(
        "*",
        (
            F.col("assistant_chars").cast("double")
            / F.greatest(F.col("user_chars"), F.lit(1)).cast("double")
        ).alias("char_ratio"),
        (
            (F.col("n_role_repeats") == 0)
            & F.col("starts_with_user")
            & F.col("ends_with_assistant")
            & (F.col("n_blank") == 0)
        ).alias("quality_ok"),
    )


def repair_conversations(
    df: DataFrame,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    sep: str = _US,
) -> DataFrame:
    """Merge consecutive same-role turns into one turn and re-index
    densely — the standard chat-data repair before SFT formatting:
    (conv_id, turn_idx, role, text, n_merged, first_src_turn).

    Gaps-and-islands: a running sum over a role-change indicator
    labels each maximal same-role run (one lag + one cumulative-sum
    window, same conv_id exchange), then a groupBy(conv_id, segment)
    joins the run's texts in turn order with the 0x1f separator
    (not producible by the derivation, so the merge is reversible).
    Per-group state is bounded by run length <= conversation
    length — safe at any corpus size. The merged turn keeps the
    run's FIRST source turn_idx for lineage; the new dense index is
    segment-1 (segments are contiguous from the running sum).
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    # two projections because window functions cannot nest: lag first,
    # then the running sum over the materialized change indicator —
    # both windows share (conv_id, turn_idx), one exchange total
    marked = df.select(
        F.col(key_col).alias("conv_id"),
        F.col(order_col).alias("_src_idx"),
        "role",
        "text",
        F.when(
            F.lag("role").over(w).isNull()
            | (F.lag("role").over(w) != F.col("role")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_chg"),
    )
    w2 = Window.partitionBy("conv_id").orderBy("_src_idx")
    seg = marked.select(
        "conv_id",
        "_src_idx",
        "role",
        "text",
        F.sum("_chg")
        .over(w2.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_seg"),
    )
    return (
        seg.groupBy("conv_id", "_seg")
        .agg(
            F.max("role").alias("role"),
            join_sorted(
                F.collect_list(ordered_struct("_src_idx", F.col("text"))),
                sep,
            ).alias("text"),
            F.count(F.lit(1)).cast("bigint").alias("n_merged"),
            F.min("_src_idx").alias("first_src_turn"),
        )
        .select(
            "conv_id",
            (F.col("_seg") - 1).cast("int").alias("turn_idx"),
            "role",
            "text",
            "n_merged",
            "first_src_turn",
        )
    )


def template_replies(
    df: DataFrame,
    role: str = "assistant",
    min_uses: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate / canned-reply detection over one role's turns:
    (fingerprint, n_uses, n_convs, first_use).

    Transcript corpora are full of templated assistant replies
    (canned refusals, greeting stubs, tool-error strings); training
    on them at frequency teaches the template, so curation pipelines
    surface any reply text used >= min_uses times. One filter + one
    groupBy on the normalized-text md5 (single shuffle of the one
    role's turns only). first_use is the lexicographic minimum of
    'conv_id:turn_idx(zero-padded)' — a deterministic exemplar the
    SQL oracle reproduces without arg-min tie ambiguity.
    """
    turns = df.filter(F.col("role") == role)
    use_key = F.concat(
        F.col("conv_id"),
        F.lit(":"),
        F.lpad(F.col("turn_idx").cast("string"), 6, "0"),
    )
    return (
        turns.groupBy(
            F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_uses"),
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
            F.min(use_key).alias("first_use"),
        )
        .filter(F.col("n_uses") >= min_uses)
    )


def sft_pairs(df: DataFrame) -> DataFrame:
    """Mine (prompt, response) training pairs from transcripts: each
    assistant turn whose immediately-preceding turn is a user turn
    yields one SFT example — (conv_id, turn_idx, prompt, response).

    The canonical transcripts-to-training-data extraction. One lag
    window over (conv_id, turn_idx), then a filter — single shuffle,
    zero joins; the pair is materialized from adjacent rows only, so
    the op streams at any corpus size.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        df.select(
            "conv_id",
            "turn_idx",
            "role",
            F.col("text").alias("response"),
            F.lag("role").over(w).alias("_prev_role"),
            F.lag("text").over(w).alias("prompt"),
        )
        .filter(
            (F.col("role") == "assistant") & (F.col("_prev_role") == "user")
        )
        .select("conv_id", "turn_idx", "prompt", "response")
    )


def context_windows(
    df: DataFrame, k: int = 4, sep: str = _US
) -> DataFrame:
    """Sliding-context construction: for every assistant turn, the up
    to ``k`` preceding turns rendered as 'role: text' lines —
    (conv_id, turn_idx, context_len, context, response).

    How multi-turn SFT rows are actually built: the model's target
    is the assistant turn, its input is the bounded conversation
    prefix. The frame is ROWS BETWEEN -k AND -1 over one window
    (single shuffle); the collected structs re-sort by turn_idx
    before joining, because collect_list over a window frame carries
    no order guarantee. Per-row state is bounded by k, not by
    conversation or corpus size.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, -1)
    )
    ctx = F.collect_list(
        ordered_struct("turn_idx", F.concat_ws(": ", "role", "text"))
    ).over(w)
    return (
        df.select(
            "conv_id",
            "turn_idx",
            "role",
            F.col("text").alias("response"),
            F.size(ctx).alias("context_len"),
            join_sorted(ctx, sep).alias("context"),
        )
        .filter(F.col("role") == "assistant")
        .select("conv_id", "turn_idx", "context_len", "context", "response")
    )


def tool_transitions(df: DataFrame) -> DataFrame:
    """Tool-call sequence mining: (prev_tool, next_tool,
    n_transitions, n_convs) over consecutive tool-bearing turns.

    What agent-trace analytics runs to find common tool chains
    (search -> python, python -> python, ...): filter to real tool
    calls ('none' and NULL are not calls), lag within the
    conversation in turn order, and count each ordered pair. The
    transition pairs a tool call with the PREVIOUS tool call in the
    same conversation, skipping non-tool turns in between — the
    standard order-k=1 Markov transition count.

    One window shuffle on conv_id; the pair rollup's key space is
    |tools|^2, so the groupBy partial-aggregates to almost nothing
    before its exchange. count_distinct(conv_id) is the only
    expensive aggregate and is Spark's two-phase distinct expand —
    still bounded by the pair key space at 100 TB.
    """
    calls = df.filter(
        F.col("tool").isNotNull() & (F.col("tool") != "none")
    ).select("conv_id", "turn_idx", "tool")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = calls.select(
        "conv_id",
        F.lag("tool").over(w).alias("prev_tool"),
        F.col("tool").alias("next_tool"),
    ).filter(F.col("prev_tool").isNotNull())
    return pairs.groupBy("prev_tool", "next_tool").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.count_distinct("conv_id").cast("bigint").alias("n_convs"),
    )


def turn_latency(df: DataFrame) -> DataFrame:
    """Inter-turn response latency per role transition: (prev_role,
    role, n_gaps, avg_secs, max_secs, p50_secs).

    The agent-operations question "how long does the assistant take
    to answer a user turn" over the whole corpus: per conversation
    lag(ts) in turn order, then one small-keyspace rollup keyed by
    the (prev_role -> role) transition. Gap arithmetic is integer
    microseconds (unix_micros both engines: epoch_us in DuckDB) so
    the aggregate is exact; p50 is the exact interpolating
    percentile — sortable inside each tiny group because the key
    space is |roles|^2, NOT corpus-sized. One window shuffle plus
    one partial-agg exchange.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # ts arrives TIMESTAMP_NTZ from parquet; unix_micros wants
    # TIMESTAMP. The cast's zone shift is constant, so GAPS are
    # unaffected and the oracle's epoch_us deltas match exactly.
    t = df.select(
        "conv_id",
        "turn_idx",
        "role",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
    )
    gaps = t.select(
        F.lag("role").over(w).alias("prev_role"),
        "role",
        (F.col("_us") - F.lag("_us").over(w)).alias("_gap_us"),
    ).filter(F.col("prev_role").isNotNull())
    return gaps.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        (F.avg("_gap_us") / F.lit(1e6)).alias("avg_secs"),
        (F.max("_gap_us") / F.lit(1e6)).cast("double").alias("max_secs"),
        (F.percentile("_gap_us", F.lit(0.5)) / F.lit(1e6)).alias("p50_secs"),
    )


def retry_loops(parsed: DataFrame, min_len: int = 2) -> DataFrame:
    """Error-retry run detection over PARSED transcripts: maximal
    runs of contiguous turns in one conversation where the SAME real
    tool is called and every call is level ERROR — (conv_id, tool,
    start_turn, end_turn, run_len), runs shorter than ``min_len``
    dropped.

    The agent-trace pathology detector: an agent stuck re-invoking a
    failing tool turn after turn. Gaps-and-islands like
    repair_conversations: filter to eligible turns (real tool +
    ERROR), mark a new run when the turn is not adjacent to its
    predecessor (turn_idx is dense, so adjacency == diff 1) or the
    tool changed, running-sum the marks into run ids, and roll each
    run up. Both windows and the groupBy share the conv_id key — the
    filter drops ~90%+ of rows BEFORE the window shuffle, and
    per-run state is bounded by run length <= conversation length.
    """
    eligible = parsed.filter(
        F.col("tool").isNotNull()
        & (F.col("tool") != "none")
        & (F.col("level") == "ERROR")
    ).select("conv_id", "turn_idx", "tool")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    marked = eligible.select(
        "conv_id",
        "turn_idx",
        "tool",
        F.when(
            F.lag("turn_idx").over(w).isNull()
            | (F.col("turn_idx") - F.lag("turn_idx").over(w) != 1)
            | (F.lag("tool").over(w) != F.col("tool")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new_run"),
    )
    runs = marked.select(
        "conv_id",
        "turn_idx",
        "tool",
        F.sum("_new_run")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_run"),
    )
    return (
        runs.groupBy("conv_id", "_run", "tool")
        .agg(
            F.min("turn_idx").alias("start_turn"),
            F.max("turn_idx").alias("end_turn"),
            F.count(F.lit(1)).cast("bigint").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_len)
        .select("conv_id", "tool", "start_turn", "end_turn", "run_len")
    )
