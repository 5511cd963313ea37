"""Streaming runner — the flagship pipeline over Structured Streaming.

Sources (SURVEY.md §2.5 starred set):
* `demo_logs_stream` — the demo_logs generator
  (src/sources/demo_logs.rs:37-40): a `rate` stream whose value
  counter is expression-synthesized into the same transcript lines
  the batch fixtures use (deterministic in the counter).
* `file_transcripts_stream` — the file source
  (src/sources/file.rs:73-111): `readStream` over a parquet/text
  directory; Spark's streaming file listing + checkpoint replaces
  Vector's fingerprint/position checkpointer
  (lib/file-source/src/checkpointer.rs:43-76).
* kafka would be `spark.readStream.format("kafka")` — config-only
  here (no broker in the sandbox).

The transform bodies are the SAME functions the batch runner uses
(parse_transcripts, enrich_transcripts, route_single_pass) — one
operator library, two executors. Event-time watermarks + tumbling
windows upgrade Vector's processing-time flush ticks
(src/transforms/aggregate.rs:124-131, no late-data handling).

Sink fan-out: `foreachBatch` writes every route's slice per
micro-batch — the one place Catalyst can't plan the multi-write for
us (SURVEY.md §4 item 2); with a checkpointLocation the pipeline is
kill-and-resume safe: each micro-batch writes under an
`_epoch=<id>` partition with dynamic partition overwrite, so a
replayed epoch rewrites itself instead of appending duplicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.enrich import enrich_transcripts
from vector_spark.functions import parse_transcripts
from vector_spark.operators.route import route_single_pass
from vector_spark.transcripts import LEXICON


#: the exact row shape spark's kafka source produces — the contract
#: every kafka-fed pipeline codes against
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source (src/sources/kafka.rs:67-95): consumer-group
    offsets, auto_offset_reset and commit gating map to Spark's
    kafka source options + checkpointing (offsets commit only after
    the sink write — the same ack-gated contract, but exactly-once).
    No broker exists in this sandbox; `kafka_shaped_stream` below
    produces the identical row shape from files so the downstream
    pipeline (decode value -> transcripts) is contract-tested end to
    end without a broker."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    return reader.load()


def kafka_shaped_stream(
    spark: SparkSession, path: str, topic: str = "transcripts"
) -> DataFrame:
    """File-backed stream with the kafka source's EXACT schema: each
    input row becomes (key=conv_id bytes, value=json bytes, topic,
    partition, offset, timestamp, timestampType). Swapping this for
    kafka_stream() changes nothing downstream — that is the contract
    the test pins."""
    raw = spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    ).parquet(path)
    return raw.select(
        F.encode("conv_id", "utf-8").alias("key"),
        F.encode(
            F.to_json(
                F.struct("conv_id", "turn_idx", "role", "text", "tool", "ts")
            ),
            "utf-8",
        ).alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int").alias("partition"),
        (F.col("turn_idx").cast("long")).alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def decode_kafka_transcripts(kafka_df: DataFrame) -> DataFrame:
    """value bytes -> transcripts rows (the json deserializer leg of
    the kafka source): works identically on kafka_stream and
    kafka_shaped_stream output."""
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    return kafka_df.select(
        F.from_json(F.decode("value", "utf-8"), schema).alias("e")
    ).select("e.*")


def demo_logs_stream(
    spark: SparkSession, rows_per_second: int = 1000, n_convs: int = 97
) -> DataFrame:
    """Synthetic transcript stream off the rate source; the line
    format matches the batch fixtures so the same parse stage runs."""
    lex = F.array(*[F.lit(w) for w in LEXICON])
    levels = F.array(*[F.lit(x) for x in
                       ["INFO", "WARN", "ERROR", "DEBUG", "INFO",
                        "ERROR", "INFO", "WARN", "INFO", "INFO"]])
    roles = F.when(F.col("value") % 20 < 9, "user") \
        .when(F.col("value") % 20 < 18, "assistant") \
        .when(F.col("value") % 20 == 18, "system").otherwise("tool")
    tools = F.when(
        (F.col("value") % 20 >= 9) & (F.col("value") % 20 != 18),
        F.element_at(F.array(F.lit("search"), F.lit("python"),
                             F.lit("browser"), F.lit("none")),
                     (F.col("value") % 4 + 1).cast("int")),
    )
    text = F.concat(
        F.when(F.col("value") % 47 == 0, F.lit("")).otherwise(
            F.concat(F.lit("["),
                     F.element_at(levels, (F.col("value") % 10 + 1).cast("int")),
                     F.lit("] "))
        ),
        F.lit("reqid="),
        F.lpad(F.lower(F.hex(F.col("value") * 2654435761 % 4294967296)), 8, "0"),
        F.lit(" latency_ms="), (F.col("value") % 997).cast("string"),
        F.lit(" msg="),
        F.element_at(lex, (F.col("value") % 24 + 1).cast("int")),
    )
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.format_string("conv-%08d", (F.col("value") % n_convs)).alias("conv_id"),
            (F.col("value") / n_convs).cast("int").alias("turn_idx"),
            roles.alias("role"),
            text.alias("text"),
            tools.alias("tool"),
            F.col("timestamp").alias("ts"),
        )
    )


def file_transcripts_stream(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Streaming file source over a parquet directory of transcript
    rows (the file-tail source analogue; new files are discovered and
    checkpointed by Spark)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def streaming_aggregate(
    routed: DataFrame, watermark: str = "10 minutes", interval: str = "1 hour"
) -> DataFrame:
    """Per-sink windowed aggregate with a watermark — the event-time
    upgrade of aggregate.rs's flush ticks; late rows beyond the
    watermark are dropped deterministically instead of 'whenever the
    next tick happens'."""
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(
            F.col("_route").alias("sink"), "role",
            F.window("ts", interval).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum("latency_ms").alias("latency_ms_sum"),
        )
        .select("sink", "role", F.col("w.start").alias("window_start"),
                "turns", "latency_ms_sum")
    )


def run_streaming_flagship(
    spark: SparkSession,
    source: DataFrame,
    out_dir: str,
    routes: dict | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
) -> dict:
    """parse -> enrich -> route -> per-sink writes, streaming.

    foreachBatch fan-out: each micro-batch is routed once
    (route_single_pass, single scan) and appended to per-sink parquet
    dirs partitioned by role; per-sink routed-row counts accumulate
    in `counts` (EventsSent telemetry). Returns {'query', 'counts'}.
    With trigger_once (availableNow) the call drains the source and
    blocks until done — the batch-equivalence tests rely on that.
    """
    from vector_spark.runner_batch import flagship_routes

    conds = routes or flagship_routes()
    parsed = parse_transcripts(source)
    enriched = enrich_transcripts(spark, parsed)
    routed = route_single_pass(enriched, conds)

    counts: dict[str, int] = {}
    seen_epochs: set[int] = set()

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        """Idempotent per epoch: rows land under an `_epoch=<id>`
        partition with DYNAMIC partition overwrite, so a micro-batch
        replayed after a crash (parquet written, checkpoint commit
        lost) rewrites its own partitions instead of appending
        duplicates — exactly-once output, matching the checkpoint's
        epoch replay contract."""
        batch_df.persist()
        try:
            # write FIRST, every delivery: a replayed epoch must be
            # allowed to REWRITE its partition (a guard that skips the
            # whole body would leave a half-written _epoch partition
            # from a failed attempt on disk forever). The dynamic
            # overwrite makes the rewrite idempotent.
            (
                batch_df.withColumn("_epoch", F.lit(epoch_id))
                .repartition("_route", "role")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_epoch", "_route", "role")
                .parquet(os.path.join(out_dir, "routed"))
            )
            # counts accumulate ONCE per epoch (EventsSent telemetry),
            # and only after a successful write
            if epoch_id not in seen_epochs:
                for row in (
                    batch_df.groupBy("_route")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                ):
                    counts[row["_route"]] = (
                        counts.get(row["_route"], 0) + row["n"]
                    )
                seen_epochs.add(epoch_id)
        finally:
            batch_df.unpersist()

    writer = routed.writeStream.foreachBatch(write_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if trigger_once:
        query.awaitTermination()
    return {"query": query, "counts": counts}
