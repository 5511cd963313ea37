"""Per-stage lineage + throughput metrics.

Reference: Vector emits EventsSent/EventsReceived per component edge
(src/topology/builder.rs:25,408-413) into an internal metrics
stream. Rebuild equivalents, in cost order:

* `observe_stage` — `DataFrame.observe` accumulators: rows/bytes per
  named stage, collected as a side effect of the action that was
  already running. ZERO extra scans — this is the default.
* `partition_lineage` — rows per physical partition id (skew
  inspection); one cheap extra aggregate.
* `StageClock` — wall-clock per stage for the bench harness.

All metrics land in a plain DataFrame/record list so the pipeline
can persist them as a metrics table next to its outputs (the
internal_metrics-source analogue).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_stage(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach a named row-count observation; read obs.get after the
    next action on the returned DataFrame."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def partition_lineage(df: DataFrame) -> DataFrame:
    """(partition_id, rows) — the per-partition lineage table."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("partition_id")
    )


@dataclass
class StageClock:
    """Wall-clock + row throughput per named stage."""

    stages: dict[str, dict] = dc_field(default_factory=dict)
    _t0: float | None = None
    _name: str | None = None

    def start(self, name: str) -> None:
        self._name, self._t0 = name, time.perf_counter()

    def stop(self, rows: int | None = None) -> float:
        dt = time.perf_counter() - self._t0
        entry: dict = {"sec": round(dt, 4)}
        if rows is not None:
            entry["rows"] = rows
            entry["rows_per_sec"] = round(rows / dt, 1) if dt > 0 else None
        self.stages[self._name] = entry
        return dt

    def report(self) -> str:
        return json.dumps(self.stages, sort_keys=True)


def internal_metrics_df(
    spark,
    observations: dict[str, "Observation"] | None = None,
    clock: "StageClock | None" = None,
):
    """`internal_metrics` source analogue (src/sources/
    internal_metrics.rs + src/topology/builder.rs EventsSent):
    materialize the session's stage observations and clocks as a
    metric-row DataFrame (name, kind, metric_kind, value, tags, ts)
    feedable to metric_to_log / the statsd/prometheus encoders —
    Vector's self-telemetry loop, Spark-side.

    Call AFTER the observed actions ran (Observation.get blocks until
    its action completes)."""
    from pyspark.sql import types as T

    rows = []
    for name, obs in (observations or {}).items():
        for metric, value in obs.get.items():
            rows.append(
                (
                    f"events_{metric}_total",
                    "counter",
                    "incremental",
                    float(value),
                    {"component_id": name},
                )
            )
    for name, entry in (clock.stages if clock else {}).items():
        rows.append(
            (
                "stage_duration_seconds",
                "gauge",
                "absolute",
                float(entry["sec"]),
                {"component_id": name},
            )
        )
        if entry.get("rows_per_sec") is not None:
            rows.append(
                (
                    "stage_throughput_rows_per_second",
                    "gauge",
                    "absolute",
                    float(entry["rows_per_sec"]),
                    {"component_id": name},
                )
            )
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("metric_kind", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    return df.select("*", F.current_timestamp().alias("ts"))
