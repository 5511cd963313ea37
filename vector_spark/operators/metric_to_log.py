"""metric_to_log transform — serialize metric rows to structured logs.

Reference (src/transforms/metric_to_log.rs:23-37,99-125): a Metric
becomes a log whose field tree mirrors the metric's JSON
serialization (name, namespace, tags.*, counter.value / gauge.value /
..., kind), with the timestamp hoisted to the log-schema timestamp
field and an optional `host_tag` hoisted to host.

Rebuild: the metric stream is a DataFrame with (name, kind, value,
tags map, ts); the log form is a JSON string column plus hoisted
columns — one `to_json(struct(...))` projection, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metric_to_log(
    df: DataFrame,
    name_col: str = "name",
    kind_col: str = "kind",
    value_col: str = "value",
    tags_col: str | None = "tags",
    ts_col: str = "ts",
    host_tag: str | None = None,
) -> DataFrame:
    """(timestamp, host?, message) log rows from metric rows.

    message = JSON object {name, kind, <kind>: {value}, tags}; the
    counter/gauge nesting follows the reference's serialization where
    the MetricValue variant is the field name (metric_to_log.rs:99+).
    """
    # the MetricValue variant name is the JSON key (reference
    # src/transforms/metric_to_log.rs:99-125 serializes the enum with
    # the variant as the field name: counter/gauge/set/distribution/
    # aggregated_histogram/aggregated_summary/sketch)
    kinds = [
        "counter",
        "gauge",
        "set",
        "distribution",
        "aggregated_histogram",
        "aggregated_summary",
        "sketch",
    ]
    value_struct = F.struct(F.col(value_col).alias("value"))
    body = [
        F.col(name_col).alias("name"),
        F.col(kind_col).alias("kind"),
        *[
            F.when(F.col(kind_col) == k, value_struct).alias(k)
            for k in kinds
        ],
    ]
    if tags_col is not None:
        body.append(F.col(tags_col).alias("tags"))
    out = [F.col(ts_col).alias("timestamp")]
    if host_tag is not None and tags_col is not None:
        # hoist the host tag out of the tag map (metric_to_log.rs
        # host_tag option)
        out.append(F.element_at(F.col(tags_col), host_tag).alias("host"))
    out.append(
        F.to_json(F.struct(*body), {"ignoreNullFields": "true"}).alias("message")
    )
    return df.select(*out)
