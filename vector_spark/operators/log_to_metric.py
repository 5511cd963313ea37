"""log_to_metric transform — derive metric points from log events.

Reference (src/transforms/log_to_metric.rs:28-175,286-300): each
config entry emits 0..1 metric per log event — counter (1 or
increment_by_value from a field), gauge (field value), set (field
value as member), histogram/summary (field value as sample) — with
templated name/namespace/tags.

Rebuild: emitting a per-event metric row and aggregating downstream
would shuffle the full fact table once per metric; instead each
MetricSpec compiles to ONE aggregate expression and all specs run in
a single groupBy over (window(ts), tags) — one scan, one shuffle,
map-side partial aggregation. The per-event row form is available as
`explode_metrics` for topologies that genuinely route raw metric
events (it is the slow path and says so).

Counter -> sum / count; gauge -> last-by-order (deterministic
arrival replacement); set -> collect_set size (exact) or
approx_count_distinct (sketch, the 100 TB default); histogram ->
percentile_approx; summary -> min/max/avg/percentiles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class MetricSpec:
    kind: str                      # counter | gauge | set | histogram | summary
    name: str
    field_: str | None = None      # source column (None => count rows)
    condition: Column | None = None  # only measure rows matching this
    order_by: str | None = None    # gauge last-wins order key
    percentiles: tuple = (0.5, 0.9, 0.99)
    approx_set: bool = False

    def exprs(self) -> list[Column]:
        cond = self.condition if self.condition is not None else F.lit(True)
        src = F.when(cond, F.col(self.field_)) if self.field_ else None
        if self.kind == "counter":
            # a counter with no matching rows is 0, not null (the
            # reference emits no metric then; downstream sums treat
            # absence as 0, so coalesce keeps parity)
            if self.field_ is None:
                return [
                    F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(self.name)
                ]
            return [F.coalesce(F.sum(src), F.lit(0)).alias(self.name)]
        if self.kind == "gauge":
            order = F.col(self.order_by) if self.order_by else F.col(self.field_)
            return [F.max_by(src, F.when(cond & src.isNotNull(), order)).alias(self.name)]
        if self.kind == "set":
            if self.approx_set:
                return [F.approx_count_distinct(src).alias(self.name)]
            return [F.count_distinct(src).alias(self.name)]
        if self.kind == "histogram":
            return [
                F.percentile_approx(src, list(self.percentiles)).alias(
                    f"{self.name}_p"
                )
            ]
        if self.kind == "summary":
            return [
                F.min(src).alias(f"{self.name}_min"),
                F.max(src).alias(f"{self.name}_max"),
                F.avg(src).alias(f"{self.name}_avg"),
                F.count(src).alias(f"{self.name}_count"),
            ]
        raise ValueError(f"unknown metric kind {self.kind}")


def log_to_metric(
    df: DataFrame,
    specs: list[MetricSpec],
    tags: list[str],
    interval: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """All specs in one windowed groupBy — single shuffle."""
    aggs: list[Column] = []
    for s in specs:
        aggs.extend(s.exprs())
    return df.groupBy(F.window(ts_col, interval).alias("w"), *tags).agg(*aggs)


def explode_metrics(
    df: DataFrame, specs: list[MetricSpec], tags: list[str], ts_col: str = "ts"
) -> DataFrame:
    """Slow-path per-event metric rows (name, kind, value, tags, ts) —
    the literal reference shape, for routing raw metric streams."""
    rows = []
    for s in specs:
        cond = s.condition if s.condition is not None else F.lit(True)
        value = F.col(s.field_).cast("double") if s.field_ else F.lit(1.0)
        if s.field_:
            # the reference emits NO metric when the source field is
            # missing (log_to_metric.rs TransformError::FieldNotFound)
            # — and the grouped path's aggregates skip nulls, so the
            # two paths must agree. Numeric-cast nulls (e.g. a
            # non-numeric set member) drop the same way: this flat
            # (name, kind, value) shape is numeric by construction.
            cond = cond & value.isNotNull()
        # config kinds histogram/summary EMIT distribution values
        # (log_to_metric.rs -> MetricValue::Distribution with the
        # statistic kind) — the wire kind must be a MetricValue
        # variant name or metric_to_log serializes no value at all
        wire_kind = {"histogram": "distribution", "summary": "distribution"}.get(
            s.kind, s.kind
        )
        if "{{" in s.name:
            # templated metric name ({{ field }} + strftime,
            # log_to_metric.rs render_template) — per-row rendering
            from vector_spark.template import render_template

            name_col = render_template(s.name, ts_col=ts_col)
        else:
            name_col = F.lit(s.name)
        rows.append(
            F.when(
                cond,
                F.struct(
                    name_col.alias("name"),
                    F.lit(wire_kind).alias("kind"),
                    value.alias("value"),
                ),
            )
        )
    tag_cols = [F.col(t) for t in tags]
    return (
        df.select(*tag_cols, F.col(ts_col), F.explode(F.array_compact(F.array(*rows))).alias("m"))
        .select(*tags, ts_col, "m.name", "m.kind", "m.value")
    )
