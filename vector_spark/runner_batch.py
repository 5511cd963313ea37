"""Batch runner — the flagship parse -> enrich -> route -> aggregate
pipeline, plus checkpoint-resumable multi-sink writes.

This is the end-to-end shape BASELINE.json names: transcripts scan
-> vectorized regex parse (Arrow/pandas batch) -> broadcast dim
enrich -> conditional fan-out route -> per-sink partitioned writes +
windowed aggregates, with explicit repartitioning before the fan-out
write and per-stage lineage metrics.

Scale notes (the parts Catalyst does NOT insert for us, SURVEY §4):
* one explicit `repartition(role, tool)` before the partitionBy
  write so each output partition is written by few tasks instead of
  every task writing every partition (small-files + memory blowup at
  1000 executors otherwise); AQE handles the rest.
* the aggregate uses (conv_id-free) low-cardinality keys so no
  salting is needed; `salted_aggregate` covers per-conv_id hot keys.
* checkpoint/resume: each sink write lands under
  out_dir/<sink>/ with an atomic _SUCCESS-gated commit; `resume=True`
  skips sinks whose commit marker exists — idempotent re-runs.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.conditions import check_fields
from vector_spark.enrich import enrich_transcripts
from vector_spark.functions import parse_transcripts, parse_transcripts_native
from vector_spark.metrics import StageClock, partition_lineage
from vector_spark.operators.route import route_single_pass
from vector_spark.transcripts import load_transcripts

# FIXTURES.md F3 route table
def flagship_routes() -> dict:
    return {
        "assistant_tool": check_fields(
            role__eq="assistant", tool__neq="none", tool__exists=True
        ),
        "errors": check_fields(level__eq="ERROR"),
        "human_long": check_fields(role__eq="user") & (F.length("text") > 120),
    }


#: target on-heap bytes per fan-out write task; parquet input bytes
#: expand roughly 3x into row form + route-clone overhead
_FANOUT_TARGET_BYTES = 64 * 1024 * 1024
_PARQUET_EXPANSION = 3


def _scan_bytes(df: DataFrame) -> int | None:
    """Compressed on-disk bytes of the frame's file-source scans
    (driver-side listing — no job). None for non-file sources."""
    import os

    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file plans
        return None
    total = 0
    for f in files:
        path = f[5:] if f.startswith("file:") else f
        try:
            total += os.path.getsize(path)
        except OSError:
            continue
    return total or None


def repartition_for_fanout(
    routed: DataFrame,
    salt_buckets: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Explicit repartition before the partitionBy fan-out write
    (SURVEY §4 item 2 — Catalyst won't insert this).

    Keying the shuffle on (_route, role) alone caps write parallelism
    at |route|x|role| (~10) tasks — a 1000-executor cluster would
    idle. Adding a conv_id-hash salt spreads each (route, role) slice
    over up to `salt_buckets` tasks.

    Sizing (round-3 fix): BOTH knobs derive from an input-volume
    estimate, not core count alone. Round 2's fixed salt=32 /
    partitions=max(64, 4*cores) fixed 30M-row write scaling
    (0.67 -> 0.87-0.97 efficiency) but taxed small inputs 3x: at
    sf0.1 it wrote 462 files instead of 122 and the write leg took
    12-17 s instead of ~4 s — a small-files penalty large inputs
    amortize and small ones don't. Now:

      num_partitions = clamp(row_bytes / 64 MB, 2, 4*cores)
      salt_buckets   = num_partitions

    so a 20 MB sf0.1 input writes ~2 tasks x ~15 dirs = ~30 files,
    while a 6 GB scaling input still fans out to 4*cores tasks with
    dirs x salt ≈ 15 x partitions combos hashing ~15-per-task (even
    load; the biggest directory alone can span every task, capping
    any straggler at ~one target partition). On a real cluster the
    same rule holds: partitions ∝ bytes until the executor-core
    ceiling, salt ∝ partitions."""
    import math

    spark = routed.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if num_partitions is None:
        scan = _scan_bytes(routed)
        if scan is None:
            num_partitions = max(64, 4 * cores)  # conservative legacy
        else:
            est_rows_bytes = scan * _PARQUET_EXPANSION
            num_partitions = min(
                max(2, math.ceil(est_rows_bytes / _FANOUT_TARGET_BYTES)),
                4 * cores,
            )
    if salt_buckets is None:
        salt_buckets = num_partitions
    salt = F.pmod(F.xxhash64("conv_id"), F.lit(salt_buckets))
    return routed.repartition(
        num_partitions, F.col("_route"), F.col("role"), salt
    )


def build_flagship(
    spark: SparkSession, sf_dir: str, use_pandas_parse: bool = True
) -> DataFrame:
    """Logical plan of the full pipeline: routed + enriched rows,
    tagged with `_route`. One scan, one explode, two broadcast joins."""
    t = load_transcripts(spark, sf_dir)
    parse = parse_transcripts if use_pandas_parse else parse_transcripts_native
    parsed = parse(t)
    enriched = enrich_transcripts(spark, parsed)
    return route_single_pass(enriched, flagship_routes())


def flagship_aggregate(routed: DataFrame) -> DataFrame:
    """Per-sink windowed aggregate (Vector aggregate/log_to_metric):
    counts + latency sum per (route, role, hour window)."""
    return (
        routed.groupBy(
            F.col("_route").alias("sink"),
            "role",
            F.window("ts", "1 hour").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum("latency_ms").alias("latency_ms_sum"),
            F.max("latency_ms").alias("latency_ms_max"),
        )
        .select(
            "sink", "role", F.col("w.start").alias("window_start"),
            "turns", "latency_ms_sum", "latency_ms_max",
        )
    )


def run_flagship(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    resume: bool = False,
    lineage: bool = False,
    use_pandas_parse: bool = True,
) -> dict:
    """Execute end-to-end. Returns {'counts': {sink: rows},
    'aggregates': rows, 'metrics': stage timings, ...}. With out_dir,
    writes per-sink parquet partitioned by (role) under
    out_dir/routed/_route=<sink>/ plus the aggregate table, with
    commit markers enabling resume."""
    clock = StageClock()
    routed = build_flagship(spark, sf_dir, use_pandas_parse)

    result: dict = {}
    if out_dir:
        routed_path = os.path.join(out_dir, "routed")
        agg_path = os.path.join(out_dir, "aggregates")
        marker = os.path.join(out_dir, "_COMMITTED")
        if resume and os.path.exists(marker):
            # the resumed result keeps the NORMAL contract keys —
            # aggregate_rows re-read from the committed output (tiny),
            # metrics/lineage recomputed from the committed parquet,
            # never from a re-run of the pipeline
            result["resumed"] = True
            routed = spark.read.parquet(routed_path)
            result["counts"] = {
                r["_route"]: r["rows"]
                for r in routed.groupBy("_route")
                .agg(F.count(F.lit(1)).alias("rows"))
                .collect()
            }
            result["aggregate_rows"] = spark.read.parquet(agg_path).count()
            result["metrics"] = clock.stages
            if lineage:
                result["partition_lineage"] = [
                    r.asDict() for r in partition_lineage(routed).collect()
                ]
            return result
        clock.start("write_routed")
        (
            repartition_for_fanout(routed)
            .write.mode("overwrite")
            .partitionBy("_route", "role")
            .parquet(routed_path)
        )
        clock.stop()
        routed_read = spark.read.parquet(routed_path)
        clock.start("aggregate")
        flagship_aggregate(routed_read).write.mode("overwrite").parquet(agg_path)
        clock.stop()
        with open(marker, "w") as f:
            f.write(json.dumps({"committed_at": time.time()}))
        # the aggregate was just written — read it back (tiny) instead
        # of recomputing the pipeline for counts
        agg_rows = spark.read.parquet(agg_path).collect()
        # counts and lineage come from the COMMITTED parquet, exactly
        # like the resume branch: the ts-window aggregate silently
        # drops NULL-ts rows (TimeWindowing injects isnotnull), so
        # agg-derived counts could disagree with what was written
        routed = routed_read
    else:
        # one pass: the aggregate's per-group `turns` counts roll up
        # to exact per-sink routed-row counts, so a single collect
        # yields both (the old form executed parse->enrich->route
        # twice — once for counts, once for the aggregate)
        clock.start("aggregate")
        agg_rows = flagship_aggregate(routed).collect()
        clock.stop(rows=len(agg_rows))
    if out_dir:
        # count the committed parquet directly (same as resume):
        # identical counts on every run, NULL-ts rows included
        counts = {
            r["_route"]: r["rows"]
            for r in routed.groupBy("_route")
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        }
    else:
        # one-pass mode: counts roll up from the ts-window aggregate —
        # exact whenever ts is non-null (the flagship derivation
        # guarantees it; arbitrary inputs with NULL ts should write
        # through out_dir mode for parquet-exact counts)
        counts = {}
        for r in agg_rows:
            counts[r["sink"]] = counts.get(r["sink"], 0) + r["turns"]
    result["counts"] = counts
    result["aggregate_rows"] = len(agg_rows)
    if lineage:
        result["partition_lineage"] = [
            r.asDict() for r in partition_lineage(routed).collect()
        ]
    result["metrics"] = clock.stages
    return result
