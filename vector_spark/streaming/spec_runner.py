"""Generic Structured-Streaming executor for pipeline specs — the
streaming twin of pipeline.run_pipeline, so a reference-style config
topology runs as a long-lived stream, not just a batch job.

Stateless transforms (filter / remap / parse_* / route / sample /
enrich) reuse the EXACT batch executors — a filter or a compiled VRL
select is the same Catalyst plan over a streaming DataFrame. Stateful
transforms swap in the applyInPandasWithState kernels
(streaming/stateful.py): dedupe -> per-key LRU, throttle -> GCRA,
reduce -> merge-strategy accumulator with expire timeout. Transforms
whose batch form needs a global sort or unwatermarked aggregation
(tag_cardinality_limit, counter-mode sample, log_to_metric) are
rejected with a clear error instead of failing deep inside Spark.

Sinks each get their own streaming query + checkpoint subdirectory:
blackhole counts per epoch (idempotent against same-process retries),
parquet/file sinks write epoch-partitioned with dynamic overwrite so
a replayed micro-batch rewrites itself (exactly-once output, same
contract as the flagship streaming runner).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.pipeline import (
    TRANSFORMS,
    PipelineContext,
    PipelineError,
    _resolve_inputs,
    compile_condition,
    expand_macros,
    validate_spec,
)

#: batch-only transform types (none left — every implemented
#: transform has a streaming form; kept for future additions)
BATCH_ONLY: set[str] = set()


def _st_dedupe(df: DataFrame, opts: dict, ctx) -> DataFrame:
    from vector_spark.streaming.stateful import streaming_dedupe

    match = opts.get("match")
    if not match:
        raise PipelineError(
            "streaming dedupe needs explicit `match` fields (the "
            "ignore-form needs the full column set, compute it in the "
            "spec)"
        )
    return streaming_dedupe(
        df,
        match=list(match),
        key=list(opts.get("key") or match),
        capacity=opts.get("cache_size", 5000),
    )


def _st_throttle(df: DataFrame, opts: dict, ctx) -> DataFrame:
    from vector_spark.streaming.stateful import streaming_throttle

    key = list(opts.get("key") or [])
    helper_cols = []
    if not key:  # GCRA state is per group; no key -> one global group
        df = df.withColumn("_throttle_key", F.lit(0))
        key, helper_cols = ["_throttle_key"], ["_throttle_key"]
    exclude_col = None
    if "exclude" in opts:
        df = df.withColumn(
            "_throttle_exclude",
            F.coalesce(
                compile_condition(opts["exclude"], df.schema), F.lit(False)
            ),
        )
        exclude_col = "_throttle_exclude"
        helper_cols.append("_throttle_exclude")
    out = streaming_throttle(
        df,
        threshold=opts["threshold"],
        window_secs=opts.get("window_secs", 3600),
        key=key,
        ts_col=opts.get("ts_col", "ts"),
        exclude_col=exclude_col,
    )
    return out.drop(*helper_cols)


def _st_reduce(df: DataFrame, opts: dict, ctx) -> DataFrame:
    from vector_spark.streaming.stateful import streaming_reduce

    group_by = list(opts["group_by"])
    ts_col = opts.get("ts_col", "ts")
    if "strategies" in opts:
        # the batch tuple-form (out -> (strategy, src)) renames output
        # columns, which the stateful kernel cannot express — fail
        # loudly instead of silently reducing with defaults
        raise ValueError(
            "streaming reduce takes merge_strategies (field -> "
            "strategy); the batch-only 'strategies' tuple form is not "
            "supported in streaming specs"
        )
    strategies = dict(opts.get("merge_strategies") or {})
    if not strategies:
        # reference defaults (reduce/mod.rs:52-56): numbers sum,
        # everything else keeps the first value — the same type list
        # as the batch executor (pipeline._t_reduce), decimal included
        for f in df.schema.fields:
            if f.name in group_by or f.name == ts_col or f.name.startswith("_"):
                continue
            tn = f.dataType.typeName()
            strategies[f.name] = (
                "sum"
                if tn in ("long", "integer", "double", "float", "decimal", "short")
                else "discard"
            )
    helper_cols = []
    ends_col = starts_col = None
    if "ends_when" in opts:
        df = df.withColumn(
            "_ends",
            F.coalesce(
                compile_condition(opts["ends_when"], df.schema), F.lit(False)
            ),
        )
        ends_col, helper_cols = "_ends", helper_cols + ["_ends"]
    if "starts_when" in opts:
        df = df.withColumn(
            "_starts",
            F.coalesce(
                compile_condition(opts["starts_when"], df.schema),
                F.lit(False),
            ),
        )
        starts_col = "_starts"
        helper_cols.append("_starts")
    return streaming_reduce(
        df,
        key=group_by,
        strategies=strategies,
        ts_col=ts_col,
        ends_col=ends_col,
        starts_col=starts_col,
        expire_after_ms=opts.get("expire_after_ms"),
    )


def _st_remap(df: DataFrame, opts: dict, ctx) -> DataFrame:
    """remap on a stream: compile tier only. The interpreter fallback
    infers its output schema by SAMPLING the input (driver collect),
    which a streaming frame cannot do — surface that as a clear
    config error instead of Spark's 'must be executed with
    writeStream' deep failure."""
    src = opts.get("source")
    if src and not any(
        k in opts for k in ("reroute_dropped", "drop_on_abort", "drop_on_error")
    ):
        from vector_spark.vrl_lang import VrlCompileError, compile_vrl

        try:
            return compile_vrl(
                df, src,
                enrichment_rows=getattr(ctx, "enrichment_rows", None),
            )
        except VrlCompileError as e:
            raise PipelineError(
                f"streaming remap: program needs the interpreter tier "
                f"({e}) — dynamic VRL is batch-only (the interpreter "
                "infers schemas by sampling)"
            ) from e
    if src:
        raise PipelineError(
            "streaming remap: drop_on_*/reroute_dropped dispatch runs "
            "on the interpreter tier, which is batch-only"
        )
    return TRANSFORMS["remap"](df, opts, ctx)  # assignments/drop form


def _st_sample(df: DataFrame, opts: dict, ctx) -> DataFrame:
    """keyed-hash sample is stateless (the batch executor works on a
    stream); counter mode (the reference default, no key) runs the
    per-group counter state kernel."""
    if opts.get("key") or "hash_expr" in opts:
        return TRANSFORMS["sample"](df, opts, ctx)
    from vector_spark.streaming.stateful import streaming_sample

    helper = []
    df = df.withColumn("_sample_key", F.lit(0))
    helper.append("_sample_key")
    exclude_col = None
    if "exclude" in opts:
        df = df.withColumn(
            "_sample_exclude",
            F.coalesce(
                compile_condition(opts["exclude"], df.schema), F.lit(False)
            ),
        )
        exclude_col = "_sample_exclude"
        helper.append("_sample_exclude")
    out = streaming_sample(
        df, rate=opts["rate"], key=["_sample_key"], exclude_col=exclude_col,
        order_by=opts.get("order_by"),
    )
    return out.drop(*helper)


def _st_log_to_metric(df: DataFrame, opts: dict, ctx) -> DataFrame:
    """Per-event metric rows (the literal reference shape —
    log_to_metric.rs emits one incremental metric per log event;
    aggregation is a downstream transform). The batch executor's
    single-shuffle windowed groupBy is a batch-only optimization."""
    from vector_spark.operators.log_to_metric import MetricSpec, explode_metrics

    specs = [
        MetricSpec(
            kind=s["kind"], name=s["name"], field_=s.get("field"),
            condition=compile_condition(s["condition"], df.schema)
            if "condition" in s else None,
        )
        for s in opts["metrics"]
    ]
    return explode_metrics(
        df, specs=specs, tags=opts.get("tags", []),
        ts_col=opts.get("ts_col", "ts"),
    )


def _st_aggregate(df: DataFrame, opts: dict, ctx) -> DataFrame:
    """aggregate on a stream: the batch executor's windowed merge plus
    an event-time watermark so Spark can finalize windows in append
    mode — the event-time upgrade of aggregate.rs's processing-time
    flush ticks (late rows beyond the watermark drop
    deterministically)."""
    ts_col = opts.get("ts_col", "ts")
    watermark = opts.get("watermark", "10 minutes")
    return TRANSFORMS["aggregate"](
        df.withWatermark(ts_col, watermark), opts, ctx
    )


def _st_tag_cardinality(df: DataFrame, opts: dict, ctx) -> DataFrame:
    from vector_spark.streaming.stateful import streaming_tag_cardinality

    return streaming_tag_cardinality(
        df,
        tag_col=opts["tag"],
        value_limit=opts["value_limit"],
        mode=opts.get("mode", "drop_tag"),
        order_by=opts.get("order_by"),
    )


STREAMING_TRANSFORMS = {
    "remap": _st_remap,
    "dedupe": _st_dedupe,
    "throttle": _st_throttle,
    "reduce": _st_reduce,
    "sample": _st_sample,
    "log_to_metric": _st_log_to_metric,
    "tag_cardinality_limit": _st_tag_cardinality,
    "aggregate": _st_aggregate,
}


def compile_pipeline_streaming(
    ctx: PipelineContext,
    spec: dict,
    source_streams: dict[str, DataFrame],
) -> dict[str, DataFrame | dict[str, DataFrame]]:
    """compile_pipeline for streaming inputs: stateless executors
    shared with batch, stateful ones swapped, fan-out caching off
    (a streaming DataFrame cannot be .cache()d)."""
    validate_spec(spec)
    spec = expand_macros(spec)
    sources = spec.get("sources") or {}
    transforms = spec.get("transforms") or {}
    missing = set(sources) - set(source_streams)
    if missing:
        raise PipelineError(f"no stream provided for sources: {sorted(missing)}")

    outputs: dict[str, DataFrame | dict[str, DataFrame]] = dict(source_streams)
    remaining = dict(transforms)
    while remaining:
        progressed = False
        for name in list(remaining):
            comp = remaining[name]
            deps = {i.split(".", 1)[0] for i in comp.get("inputs", [])}
            if not deps.issubset(outputs):
                continue
            t = comp["type"]
            if t in BATCH_ONLY:
                raise PipelineError(
                    f"{name}: transform type {t!r} needs a global "
                    "sort/aggregate — batch-only (run it downstream on "
                    "the sink output)"
                )
            df = _resolve_inputs(comp["inputs"], outputs)
            fn = STREAMING_TRANSFORMS.get(t) or TRANSFORMS[t]
            opts = comp
            if comp.get("reroute_dropped"):
                opts = {**comp, "_component_name": name}
            outputs[name] = fn(df, opts, ctx)
            del remaining[name]
            progressed = True
        if not progressed:  # pragma: no cover — validate_spec catches cycles
            raise PipelineError(f"unresolvable components: {sorted(remaining)}")
    return outputs


def run_pipeline_streaming(
    ctx: PipelineContext,
    spec: dict,
    source_streams: dict[str, DataFrame],
    out_dir: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
) -> dict[str, Any]:
    """Execute every sink as its own streaming query. Returns
    {sink: result}: blackhole -> row count, parquet/file -> {'path',
    'rows'}, memory -> collected rows (capped). With trigger_once
    (availableNow) the call drains the sources and blocks."""
    spec = expand_macros(spec)
    outputs = compile_pipeline_streaming(ctx, spec, source_streams)
    queries = []
    results: dict[str, Any] = {}
    counters: dict[str, dict] = {}

    for name, comp in (spec.get("sinks") or {}).items():
        df = _resolve_inputs(comp["inputs"], outputs)
        only = comp.get("only_fields")
        if only:
            df = df.select(*only)
        for drop_f in comp.get("except_fields") or []:
            df = df.drop(drop_f)
        kind = comp.get("type", "memory")
        state: dict = {"rows": 0, "collected": [], "epochs": set()}
        counters[name] = state

        if kind == "blackhole":
            def make_bh(st):
                def fb(batch_df: DataFrame, epoch_id: int) -> None:
                    if epoch_id in st["epochs"]:
                        return
                    st["epochs"].add(epoch_id)
                    st["rows"] += batch_df.count()
                return fb
            writer = df.writeStream.foreachBatch(make_bh(state))
        elif kind == "parquet":
            path = comp.get("path") or os.path.join(out_dir, name)
            state["path"] = path

            def make_pq(st, path=None):
                path = path or st["path"]

                def fb(batch_df: DataFrame, epoch_id: int) -> None:
                    if epoch_id in st["epochs"]:
                        return
                    st["epochs"].add(epoch_id)
                    # ONE compute per epoch: write first, then count
                    # the WRITTEN epoch partition (footer-metadata
                    # count, no rescan of the transform chain).
                    # persist() cannot serve here — caching the
                    # incremental plan of a stateful micro-batch trips
                    # attribute rebinding (NoSuchElementException) on
                    # this Spark version.
                    (
                        batch_df.withColumn("_epoch", F.lit(epoch_id))
                        .write.mode("overwrite")
                        .option("partitionOverwriteMode", "dynamic")
                        .partitionBy("_epoch")
                        .parquet(path)
                    )
                    st["rows"] += (
                        batch_df.sparkSession.read.parquet(path)
                        .where(F.col("_epoch") == epoch_id)
                        .count()
                    )
                return fb
            writer = df.writeStream.foreachBatch(make_pq(state))
        elif kind == "file":
            # file sink: the SAME newline-framed encoding codec as the
            # batch runner (pipeline.file_sink_line), written as
            # epoch-partitioned text with idempotent epoch overwrite —
            # one config, identical bytes in batch or stream mode
            from vector_spark.pipeline import file_sink_line

            path = comp.get("path") or os.path.join(out_dir, name)
            state["path"] = path

            def make_txt(st, comp=comp, name=name, path=path):
                def fb(batch_df: DataFrame, epoch_id: int) -> None:
                    if epoch_id in st["epochs"]:
                        return
                    st["epochs"].add(epoch_id)
                    # write once, count the written lines (a re-read
                    # of the OUTPUT, not a recompute of the chain);
                    # see the parquet sink for why persist() is out
                    enc_df, line = file_sink_line(batch_df, comp, name)
                    (
                        enc_df.select(
                            line.alias("value"),
                            F.lit(epoch_id).alias("_epoch"),
                        )
                        .write.mode("overwrite")
                        .option("partitionOverwriteMode", "dynamic")
                        .partitionBy("_epoch")
                        .text(path)
                    )
                    st["rows"] += (
                        batch_df.sparkSession.read.text(
                            os.path.join(path, f"_epoch={epoch_id}")
                        ).count()
                    )
                return fb
            writer = df.writeStream.foreachBatch(make_txt(state))
        elif kind == "memory":
            limit = comp.get("limit", 1000)

            def make_mem(st, limit=limit):
                def fb(batch_df: DataFrame, epoch_id: int) -> None:
                    if epoch_id in st["epochs"]:
                        return
                    st["epochs"].add(epoch_id)
                    # collect ONCE and count from the collected rows:
                    # memory is a debug/test sink (reference console
                    # analogue), and a count + limit pair would run
                    # the chain twice (persist() is unusable on
                    # stateful micro-batch plans — see parquet sink)
                    rows = batch_df.collect()
                    st["rows"] += len(rows)
                    room = limit - len(st["collected"])
                    if room > 0:
                        st["collected"].extend(
                            r.asDict() for r in rows[:room]
                        )
                return fb
            writer = df.writeStream.foreachBatch(make_mem(state))
        else:
            raise PipelineError(f"sink {name}: unsupported streaming type {kind!r}")

        writer = writer.outputMode("append")
        if checkpoint_dir:
            writer = writer.option(
                "checkpointLocation", os.path.join(checkpoint_dir, name)
            )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        queries.append((name, comp, writer.start()))

    for name, comp, q in queries:
        if trigger_once:
            q.awaitTermination()
        kind = comp.get("type", "memory")
        st = counters[name]
        if kind == "blackhole":
            results[name] = st["rows"]
        elif kind in ("parquet", "file"):
            results[name] = {"path": st["path"], "rows": st["rows"]}
        else:
            results[name] = st["collected"]
    if not trigger_once:
        results["_queries"] = [q for _n, _c, q in queries]
    return results
