"""SparkSession factory with scale-appropriate defaults.

The reference runs a tokio topology with bounded buffers and
per-transform concurrency (src/topology/builder.rs:60-65); here the
equivalents are AQE, shuffle-partition sizing, and Arrow batching.
Every knob below is chosen for "would survive 100 TB": AQE coalesces
and splits skewed partitions at runtime, Arrow moves pandas-UDF
batches zero-copy, and UTC pins timestamp semantics to the oracle's.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    # shuffle/spill scratch follows TMPDIR: on a cluster every node
    # has its own disks, so single-box benches that leave this on the
    # shared root disk measure disk contention, not the engine
    "spark.local.dir": os.path.join(tempfile.gettempdir(), "spark-local"),
    # correctness-critical: DuckDB oracle timestamps are UTC-naive
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: partition coalescing + skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # duplicate map keys keep the LAST value instead of failing the
    # job: statsd datagrams may legally repeat a tag ('#env:a,env:b')
    # and logfmt's convention is last-wins — the default EXCEPTION
    # policy would kill a 100 TB ingest on one such frame
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    # Arrow is the only sanctioned Python<->JVM path (no per-row UDFs)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # local-mode shuffle sizing; on a cluster this is set per-job
    "spark.sql.shuffle.partitions": str(os.cpu_count() or 8),
    # scan-split sizing for LOCAL scale: the default 128 MB split +
    # 4 MB open-cost packs a ~100 MB multi-file table into ONE scan
    # partition, serializing every narrow pipeline (measured: flat
    # 8->32 core scaling). 8 MB splits + cheap open cost give the
    # scheduler cores x tasks; production at 100 TB keeps the 128 MB
    # default (files there are 100 MB+ each).
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(128 * 1024),
    # straggler mitigation: re-launch tasks running far beyond the
    # stage median — essential on shared/noisy hosts AND on 1000-
    # executor clusters, where one slow node otherwise gates every
    # stage barrier
    "spark.speculation": "true",
    "spark.speculation.multiplier": "1.5",
    "spark.speculation.quantile": "0.75",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


def get_spark(
    app_name: str = "vector-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    master defaults to local[N] where N = $SPARK_GRAFT_CPUS or all
    cores. Under spark-submit pass master="inherit" so the submit
    command's --master wins.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name)
    if master != "inherit":
        builder = builder.master(master)
    confs = dict(DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
