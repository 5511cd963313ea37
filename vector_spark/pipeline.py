"""Pipeline spec -> validated DAG -> compiled DataFrame plan.

The reference's topology lifecycle (SURVEY.md §3.1): load config
(src/config/loading/mod.rs:135) -> compile with name checks, macro
expansion, graph typecheck and cycle detection
(src/config/compiler.rs:24-145, src/config/graph.rs:185-245) -> build
pieces -> run. Here the same shape compiles to a DAG of DataFrames:

* a spec is a plain dict (JSON/YAML-loadable): named sources,
  transforms (with `inputs`), sinks (with `inputs`).
* validation mirrors graph.rs: unknown names, duplicate names,
  reserved ports, cycles (DFS), sources with inputs.
* compile walks the DAG in topological order; each transform maps to
  a DataFrame combinator from vector_spark.operators; multi-output
  transforms (route) expose named ports referenced as `name.port`
  exactly like Vector (src/transforms/route.rs:62-68).
* a component consumed by more than one downstream edge is cached
  (the Fanout analogue, lib/vector-core/src/fanout.rs) unless
  `cache: false` — recompute is sometimes cheaper at scale than a
  100 TB cache.

Sinks: `memory` returns the DataFrame, `blackhole` counts rows
(src/sinks/blackhole), `console` collects + prints, `parquet` writes
partitioned files (the file sink's template partitioning,
src/sinks/util/partitioner.rs:5-30, as partitionBy columns), each
reporting routed-row counts (EventsSent telemetry,
src/topology/builder.rs:408-413).

A `unit_test` harness mirrors `vector test`
(src/config/unit_test/mod.rs:135-290): inject a DataFrame at any
component (`insert_at`) and extract the output of any component
(`extract_from`) without running real sources/sinks.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.conditions import check_fields, vrl_expr
from vector_spark.enrich import EnrichmentTable
from vector_spark.metrics import observe_stage
from vector_spark.functions import parse_grok, parse_transcripts
from vector_spark.operators.dedupe import dedupe
from vector_spark.operators.filter import filter_events
from vector_spark.operators.log_to_metric import MetricSpec, log_to_metric
from vector_spark.operators.reduce import MergeStrategy, reduce_groups
from vector_spark.operators.route import UNMATCHED, route_single_pass
from vector_spark.operators.sample import sample
from vector_spark.operators.tag_cardinality import tag_cardinality_limit
from vector_spark.operators.throttle import throttle

RESERVED_PORTS = {"_default", UNMATCHED, "dropped"}


# ---------------------------------------------------------------------------
# condition spec -> Column
# ---------------------------------------------------------------------------


def compile_condition(spec: Any, schema=None) -> Column:
    """Condition spec (src/conditions/mod.rs:23-51 analogue):
    str -> raw SQL boolean (the VRL-condition stand-in);
    {"type": "check_fields", **pairs} -> check_fields DSL;
    {"type": "vrl", "source": expr} -> raw SQL boolean;
    {"type": "datadog_search", "source": query} -> Datadog Log
    Search syntax (pass `schema` so absent fields compile to false
    instead of failing analysis)."""
    if isinstance(spec, str):
        return vrl_expr(spec)
    if isinstance(spec, dict):
        kind = spec.get("type", "vrl")
        if kind == "check_fields":
            pairs = {k: v for k, v in spec.items() if k != "type"}
            return check_fields(**pairs)
        if kind == "vrl":
            # real VRL first (vrl_lang compiler, src/conditions/vrl.rs
            # semantics); raw-SQL boolean as the documented fallback so
            # specs may also write Catalyst expressions directly
            if schema is not None:
                try:
                    from vector_spark.vrl_lang import vrl_condition

                    return vrl_condition(schema, spec["source"])
                except Exception:  # noqa: BLE001 - not VRL; try SQL
                    pass
            return vrl_expr(spec["source"])
        if kind == "datadog_search":
            from vector_spark.datadog_search import datadog_search

            return datadog_search(spec["source"], schema)
        if kind in ("is_log", "is_metric", "is_trace"):
            from vector_spark.conditions import is_event_kind

            return is_event_kind(kind.removeprefix("is_"), schema)
    raise ValueError(f"bad condition spec: {spec!r}")


# ---------------------------------------------------------------------------
# transform registry: type -> (df, options, ctx) -> DataFrame | dict[port, DataFrame]
# ---------------------------------------------------------------------------


def _t_filter(df, opts, ctx):
    return filter_events(df, compile_condition(opts["condition"], df.schema))


def _t_remap(df, opts, ctx):
    """remap (src/transforms/remap.rs): three program forms, fastest
    wins —

    * `assignments`/`drop`: declarative SQL expressions (Catalyst).
    * `source`: a VRL program. Tried on the Column compiler first
      (vrl_lang.compile_vrl — stays inside whole-stage codegen); if
      the program uses the dynamic tail the compiler rejects (abort,
      dynamic path coalescing, heterogeneous arrays, ...), falls back
      to the distributed tree-walk interpreter
      (vrl_interp.remap_interp, mapInPandas over Arrow batches).
    * `source` + `reroute_dropped`/`drop_on_*`: always the
      interpreter — only it implements the reference's full abort /
      error dispatch (remap.rs:465-524).
    """
    src = opts.get("source")
    if src:
        from vector_spark.vrl_lang import VrlCompileError, compile_vrl
        from vector_spark.vrl_interp import remap_interp

        dispatch_keys = (
            "reroute_dropped", "drop_on_abort", "drop_on_error"
        )
        needs_dispatch = any(k in opts for k in dispatch_keys)
        if not needs_dispatch:
            try:
                return compile_vrl(
                    df, src,
                    enrichment_rows=getattr(ctx, "enrichment_rows", None),
                )
            except VrlCompileError:
                pass  # dynamic tail -> interpreter slow path
        return remap_interp(
            df,
            src,
            drop_on_abort=opts.get("drop_on_abort", True),
            drop_on_error=opts.get("drop_on_error", False),
            reroute_dropped=opts.get("reroute_dropped", False),
            component_id=opts.get("_component_name", "remap"),
        )
    out = df
    for name, expr in (opts.get("assignments") or {}).items():
        out = out.withColumn(name, F.expr(expr))
    drop = opts.get("drop") or []
    if drop:
        out = out.drop(*drop)
    return out


def _with_dropped(out, opts, name_hint="parser"):
    """reroute_dropped (src/transforms/remap.rs:92-105): expose the
    default output plus a `.dropped` port carrying failed rows with
    dropped-metadata annotations. '' is the unnamed default port."""
    from vector_spark.functions import with_dropped_port

    ok, dropped = with_dropped_port(
        out, component_id=opts.get("_component_name", name_hint)
    )
    return {"": ok, "dropped": dropped}


def _t_parse_regex(df, opts, ctx):
    out = parse_transcripts(df, text_col=opts.get("field", "text"))
    if opts.get("reroute_dropped"):
        return _with_dropped(out, opts)
    return out


def _t_parse_grok(df, opts, ctx):
    out = parse_grok(df, opts["pattern"], text_col=opts.get("field", "text"))
    if opts.get("reroute_dropped"):
        return _with_dropped(out, opts)
    return out


def _t_route(df, opts, ctx):
    conds = {n: compile_condition(c, df.schema) for n, c in opts["routes"].items()}
    tagged = route_single_pass(df, conds)
    # when the route's ports feed more than one downstream edge, each
    # per-port filter would otherwise recompute the whole upstream
    # (parse/enrich) once per consumer — cache the single tagged scan
    # (the fanout.rs caching analogue), honoring `cache: False`
    if opts.get("_fanout_consumers", 0) > 1 and opts.get("cache", True):
        tagged = tagged.cache()
    ports = {n: tagged.filter(F.col("_route") == n).drop("_route") for n in conds}
    ports[UNMATCHED] = tagged.filter(F.col("_route") == UNMATCHED).drop("_route")
    return ports


def _t_sample(df, opts, ctx):
    hash_expr = F.expr(opts["hash_expr"]) if "hash_expr" in opts else None
    exclude = (
        compile_condition(opts["exclude"], df.schema)
        if "exclude" in opts else None
    )
    if opts.get("key") is None and hash_expr is None:
        # Vector's default sample has NO key: counter mode, every
        # rate-th event by arrival (sample.rs:152-166). Arrival order
        # needs an explicit key in batch; ts is the model's default.
        from vector_spark.operators.sample import sample_counter

        order = opts.get("order_by") or (
            "ts" if "ts" in df.columns else None
        )
        if order is None:
            raise PipelineError(
                "sample: keyless counter mode needs an arrival order "
                "— set order_by (no ts column to default to), or give "
                "key/hash_expr for keyed sampling"
            )
        return sample_counter(
            df, rate=opts["rate"], order_by=order, exclude=exclude
        ).drop("sample_rate")
    return sample(df, rate=opts["rate"], key=opts.get("key"),
                  hash_expr=hash_expr, exclude=exclude)


def _t_dedupe(df, opts, ctx):
    match, ignore = opts.get("match"), opts.get("ignore")
    if match is None and ignore is None:
        # reference default (dedupe.rs fill_default_fields_match):
        # match on [timestamp, host, message] — mapped onto the log
        # model's spellings and intersected with what exists
        cols = set(df.columns)
        match = [
            next((c for c in group if c in cols), None)
            for group in (("timestamp", "ts"), ("host",), ("message", "text"))
        ]
        match = [c for c in match if c is not None]
        if not match:
            raise PipelineError(
                "dedupe: no match/ignore given and none of the default "
                "fields (timestamp/ts, host, message/text) exist"
            )
    return dedupe(df, match=match, ignore=ignore,
                  order_by=opts.get("order_by"))


def _t_reduce(df, opts, ctx):
    group_by = list(opts["group_by"])
    order_by = opts.get("order_by", "turn_idx")
    if "strategies" in opts:
        strategies = {
            out: (MergeStrategy(sname), src)
            for out, (sname, src) in opts["strategies"].items()
        }
    else:
        # reference defaults (reduce/mod.rs:52-56): strings/bools ->
        # first value, numbers -> sum, timestamps -> first (+ _end
        # last, only when explicitly requested via merge_strategies)
        strategies = {}
        for f in df.schema.fields:
            if f.name in group_by or f.name == order_by or f.name.startswith("_"):
                continue
            tn = f.dataType.typeName()
            strat = (
                MergeStrategy.SUM
                if tn in ("long", "integer", "double", "float", "decimal", "short")
                else MergeStrategy.FIRST_TS
                if tn.startswith("timestamp")
                else MergeStrategy.DISCARD
            )
            strategies[f.name] = (strat, f.name)
        # explicit merge_strategies overrides REPLACE the default
        # merger entirely (reference: a configured strategy supplants
        # the timestamp-window pair), so apply them BEFORE adding the
        # `<f>_end` = last default — a timestamp field with an
        # explicit strategy must not emit a stray `<f>_end`
        overrides = opts.get("merge_strategies") or {}
        for out, sname in overrides.items():
            strategies[out] = (MergeStrategy(sname), out)
        # the default timestamp strategy also emits `<f>_end` = last
        # (reduce/mod.rs:52-56) — only for fields left on the default
        for f in df.schema.fields:
            if (
                f.dataType.typeName().startswith("timestamp")
                and f.name in strategies
                and f.name not in overrides
            ):
                strategies[f.name + "_end"] = (MergeStrategy.LAST_TS, f.name)
    ends = opts.get("ends_when")
    starts = opts.get("starts_when")
    if ends is not None or starts is not None:
        # transaction semantics (reduce/mod.rs:199-204): sessionize,
        # then reduce each (group, session)
        from vector_spark.operators.reduce import sessionize

        df = sessionize(
            df,
            group_by=group_by,
            order_by=order_by,
            ends_when=compile_condition(ends, df.schema) if ends else None,
            starts_when=compile_condition(starts, df.schema) if starts else None,
        )
        out = reduce_groups(
            df, group_by=group_by + ["_session"], strategies=strategies,
            order_by=order_by,
        )
        return out.drop("_session")
    if "expire_after_ms" in opts:
        # staleness flush (reduce/mod.rs:33,226-241) in batch =
        # event-time gap sessionization, the same translation the
        # streaming runner applies — silently collapsing all sessions
        # into one row per key diverged between the two modes
        from vector_spark.operators.reduce import sessionize_gap

        ts_col = opts.get("ts_col", "ts")
        df = sessionize_gap(
            df,
            group_by=group_by,
            ts_col=ts_col,
            expire_after_ms=opts["expire_after_ms"],
        )
        out = reduce_groups(
            df, group_by=group_by + ["_session"], strategies=strategies,
            order_by=order_by,
        )
        return out.drop("_session")
    return reduce_groups(df, group_by=group_by, strategies=strategies,
                         order_by=order_by)


def _t_throttle(df, opts, ctx):
    # Vector's throttle has no order option (arrival order); the
    # batch rebuild needs an explicit one — default to event time
    # instead of handing Spark an unordered window (AnalysisException
    # for every reference-spelled config)
    order_by = opts.get("order_by") or (
        ["ts"] if "ts" in df.columns else None
    )
    if not order_by:
        raise PipelineError(
            "throttle: batch mode needs an event order — set order_by "
            "(no ts column to default to)"
        )
    return throttle(df, threshold=opts["threshold"],
                    window_secs=opts.get("window_secs", 3600),
                    key=opts.get("key", []), order_by=order_by,
                    exclude=compile_condition(opts["exclude"], df.schema) if "exclude" in opts else None)


def _t_log_to_metric(df, opts, ctx):
    specs = [
        MetricSpec(
            kind=s["kind"], name=s["name"], field_=s.get("field"),
            condition=compile_condition(s["condition"], df.schema) if "condition" in s else None,
        )
        for s in opts["metrics"]
    ]
    return log_to_metric(df, specs=specs, tags=opts.get("tags", []),
                         interval=opts.get("interval", "1 hour"))


def _t_tag_cardinality(df, opts, ctx):
    return tag_cardinality_limit(df, tag_col=opts["tag"],
                                 value_limit=opts["value_limit"],
                                 order_by=opts.get("order_by", "ts"),
                                 mode=opts.get("mode", "drop_tag"))


def _t_aggregate(df, opts, ctx):
    """aggregate (src/transforms/aggregate.rs): merge a metric stream
    over flush intervals — Incremental values add, Absolute values
    last-write-wins (lib/vector-core metric/data.rs:81-131). The
    reference flushes on a processing-time tick (`interval_ms`); the
    rebuild's flush boundary is the event-time window."""
    from vector_spark.operators.aggregate import merge_metric_stream

    if "interval_ms" in opts:
        interval = f"{int(opts['interval_ms'])} milliseconds"
    else:
        interval = opts.get("interval", "1 hour")
    return merge_metric_stream(
        df,
        keys=list(opts.get("group_by") or []),
        interval=interval,
        ts_col=opts.get("ts_col", "ts"),
        metric_kind_col=opts.get("metric_kind_col", "metric_kind"),
        value_col=opts.get("value_col", "value"),
        order_col=opts.get("order_col", "_order"),
    )


def _t_metric_to_log(df, opts, ctx):
    """metric_to_log (src/transforms/metric_to_log.rs): metric rows ->
    log rows with the reference's variant-nested JSON message.
    Stateless — works identically batch and streaming."""
    from vector_spark.operators.metric_to_log import metric_to_log

    return metric_to_log(
        df,
        name_col=opts.get("name_col", "name"),
        kind_col=opts.get("kind_col", "kind"),
        value_col=opts.get("value_col", "value"),
        tags_col=opts.get("tags_col", "tags"),
        ts_col=opts.get("ts_col", "ts"),
        host_tag=opts.get("host_tag"),
    )


def _t_script(df, opts, ctx):
    """lua escape hatch (src/transforms/lua/): the rebuild's script
    language is Python — `process` is a callable injected via the
    spec (configs can't carry code; library callers pass it)."""
    from vector_spark.operators.script import scripted_transform

    fn = opts.get("process")
    if not callable(fn):
        raise PipelineError(
            "script transform needs a callable `process` in the spec "
            "(the Python escape hatch replaces lua; TOML configs "
            "cannot carry code)"
        )
    return scripted_transform(
        df, fn, schema=opts.get("schema"), init=opts.get("init")
    )


def _t_aws_ec2_metadata(df, opts, ctx):
    """aws_ec2_metadata (src/transforms/aws_ec2_metadata.rs): stamp
    driver-fetched instance facts as literal columns. No metadata
    endpoint exists here, so the spec carries the dict (`metadata`);
    `fields` selects which keys to stamp."""
    from vector_spark.enrich import stamp_metadata

    return stamp_metadata(
        df, opts.get("metadata") or {}, fields=opts.get("fields")
    )


def _t_geoip(df, opts, ctx):
    """geoip (src/transforms/geoip.rs): IP-prefix broadcast enrich.
    The prefix dimension comes from a registered enrichment table
    (`database` names it) — the mmdb file becomes a prefix dim."""
    from vector_spark.enrich import ip_prefix_enrich

    table = ctx.enrichment_tables[opts["database"]]
    return ip_prefix_enrich(
        df,
        table.df if hasattr(table, "df") else table,
        ip_col=opts.get("source", "host"),
        prefix_len=opts.get("prefix_len", 16),
    )


def _t_enrich(df, opts, ctx):
    table = ctx.enrichment_tables[opts["table"]]
    return table.lookup(df, how=opts.get("how", "left"))


TRANSFORMS: dict[str, Callable] = {
    "filter": _t_filter,
    "remap": _t_remap,
    "parse_regex": _t_parse_regex,
    "parse_grok": _t_parse_grok,
    "route": _t_route,
    "sample": _t_sample,
    "dedupe": _t_dedupe,
    "reduce": _t_reduce,
    "throttle": _t_throttle,
    "log_to_metric": _t_log_to_metric,
    "tag_cardinality_limit": _t_tag_cardinality,
    "enrich": _t_enrich,
    "aggregate": _t_aggregate,
    "metric_to_log": _t_metric_to_log,
    "script": _t_script,
    "aws_ec2_metadata": _t_aws_ec2_metadata,
    "geoip": _t_geoip,
}


# ---------------------------------------------------------------------------
# spec model + validation (config/graph.rs analogues)
# ---------------------------------------------------------------------------


@dataclass
class PipelineContext:
    spark: SparkSession
    enrichment_tables: dict[str, EnrichmentTable] = dc_field(default_factory=dict)


class PipelineError(ValueError):
    pass


def expand_macros(spec: dict) -> dict:
    """`pipelines` macro expansion (src/transforms/pipelines/mod.rs +
    src/config/compiler.rs:148): a `pipeline` transform with an
    optional entry `filter` and a linear `stages` list expands into
    `<name>_filter` + `<name>_<stage>` chained components, rewiring
    consumers of `<name>` to the last stage — pure config rewriting,
    before validation."""
    transforms = dict(spec.get("transforms") or {})
    macros = {n: c for n, c in transforms.items() if c.get("type") == "pipeline"}
    if not macros:
        return spec
    out_t: dict[str, dict] = {}
    rename: dict[str, str] = {}
    for name, comp in transforms.items():
        if name not in macros:
            out_t[name] = dict(comp)
            continue
        upstream = comp["inputs"]
        if "filter" in comp:
            fname = f"{name}_filter"
            out_t[fname] = {"type": "filter", "inputs": upstream,
                            "condition": comp["filter"]}
            upstream = [fname]
        last = None
        for stage in comp["stages"]:
            sname = f"{name}_{stage['name']}"
            body = {k: v for k, v in stage.items() if k != "name"}
            body["inputs"] = upstream if last is None else [last]
            out_t[sname] = body
            last = sname
        rename[name] = last if last is not None else upstream[0]
    expanded = {
        "sources": spec.get("sources") or {},
        "transforms": out_t,
        "sinks": {n: dict(c) for n, c in (spec.get("sinks") or {}).items()},
    }
    for section in ("transforms", "sinks"):
        for comp in expanded[section].values():
            if "inputs" in comp:
                comp["inputs"] = [rename.get(i, i) for i in comp["inputs"]]
    return expand_macros(expanded)  # nested pipelines expand recursively


def _edges(spec: dict) -> list[tuple[str, str]]:
    """(input_component, consumer) pairs; ports stripped to component."""
    out = []
    for section in ("transforms", "sinks"):
        for name, comp in (spec.get(section) or {}).items():
            for inp in comp.get("inputs", []):
                out.append((inp.split(".", 1)[0], name))
    return out


def validate_spec(spec: dict) -> None:
    """Name uniqueness, known inputs, port validity, source shape,
    cycle detection — the compile-time checks of
    src/config/compiler.rs:24-145 + src/config/graph.rs:185-245."""
    spec = expand_macros(spec)
    sources = spec.get("sources") or {}
    transforms = spec.get("transforms") or {}
    sinks = spec.get("sinks") or {}
    names: list[str] = [*sources, *transforms, *sinks]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise PipelineError(f"duplicate component names: {sorted(dupes)}")
    known = set(names)
    route_ports: dict[str, set[str]] = {
        n: set(c.get("routes", {})) | {UNMATCHED}
        for n, c in transforms.items()
        if c.get("type") == "route"
    }
    # transforms with reroute_dropped expose the default output AND a
    # `.dropped` port (remap.rs reroute_dropped). The assignments-form
    # remap (no `source`) never drops events, so reroute_dropped on it
    # is a config error, not a silent no-op whose `.dropped` port
    # would deliver the full stream.
    for n, c in transforms.items():
        if (
            c.get("reroute_dropped")
            and c.get("type") == "remap"
            and not c.get("source")
        ):
            raise PipelineError(
                f"{n}: reroute_dropped needs a VRL `source` — the "
                "assignments form cannot drop events"
            )
    dropped_ports: set[str] = {
        n
        for n, c in transforms.items()
        if c.get("reroute_dropped")
        and c.get("type") in ("parse_regex", "parse_grok", "remap")
    }
    for section in ("transforms", "sinks"):
        for name, comp in (spec.get(section) or {}).items():
            inputs = comp.get("inputs", [])
            if not inputs:
                raise PipelineError(f"{name}: component has no inputs")
            for inp in inputs:
                base, _, port = inp.partition(".")
                if base not in known:
                    raise PipelineError(f"{name}: unknown input {inp!r}")
                if base in sinks:
                    raise PipelineError(f"{name}: cannot consume a sink {inp!r}")
                if port:
                    if base in dropped_ports:
                        if port != "dropped":
                            raise PipelineError(f"{name}: unknown port {inp!r}")
                    elif base not in route_ports:
                        raise PipelineError(
                            f"{name}: input {inp!r} names a port on a single-output component"
                        )
                    elif port not in route_ports[base]:
                        raise PipelineError(f"{name}: unknown port {inp!r}")
                elif base in route_ports:
                    raise PipelineError(
                        f"{name}: route {base!r} requires an explicit port (e.g. {base}.{UNMATCHED})"
                    )
    for name, comp in sources.items():
        if comp.get("inputs"):
            raise PipelineError(f"{name}: sources cannot have inputs")
    for name, comp in transforms.items():
        if comp.get("type") not in TRANSFORMS:
            raise PipelineError(f"{name}: unknown transform type {comp.get('type')!r}")
        for port in comp.get("routes", {}) or {}:
            if port in RESERVED_PORTS:
                raise PipelineError(f"{name}: route name {port!r} is reserved")
    # cycle detection: DFS over component edges (graph.rs:210-245)
    adj: dict[str, list[str]] = {}
    for frm, to in _edges(spec):
        adj.setdefault(frm, []).append(to)
    WHITE, GRAY, BLACK = 0, 1, 2
    color = dict.fromkeys(known, WHITE)

    def dfs(node: str, path: list[str]) -> None:
        color[node] = GRAY
        for nxt in adj.get(node, []):
            if color[nxt] == GRAY:
                cyc = path[path.index(nxt):] if nxt in path else [nxt]
                raise PipelineError(f"cycle detected: {' -> '.join([*cyc, nxt])}")
            if color[nxt] == WHITE:
                dfs(nxt, [*path, nxt])
        color[node] = BLACK

    for n in known:
        if color[n] == WHITE:
            dfs(n, [n])


# ---------------------------------------------------------------------------
# compile + run
# ---------------------------------------------------------------------------


def _resolve_inputs(
    inputs: list[str], outputs: dict[str, DataFrame | dict[str, DataFrame]]
) -> DataFrame:
    """Multiple inputs merge streams (implicit union, the graph edge
    model of src/config/graph.rs) — unionByName with missing columns
    nulled, matching schemaless event merge."""
    dfs = []
    for inp in inputs:
        base, _, port = inp.partition(".")
        out = outputs[base]
        if isinstance(out, dict):
            # '' is the unnamed default port (reroute_dropped
            # transforms); routes always name an explicit port
            dfs.append(out[port] if port else out[""])
        else:
            if port:
                # silently dropping the suffix would deliver the FULL
                # stream to a consumer that asked for one port
                raise PipelineError(
                    f"input {inp!r}: component {base!r} has no named "
                    f"ports (its output is a single stream)"
                )
            dfs.append(out)
    merged = dfs[0]
    for other in dfs[1:]:
        merged = merged.unionByName(other, allowMissingColumns=True)
    return merged


def compile_pipeline(
    ctx: PipelineContext,
    spec: dict,
    source_frames: dict[str, DataFrame],
    cache_fanout: bool = True,
) -> dict[str, DataFrame | dict[str, DataFrame]]:
    """Compile the validated spec to {component: DataFrame (or port
    dict)}. `source_frames` supplies the DataFrame for every source
    component (the runner owns real I/O; unit tests inject here)."""
    validate_spec(spec)
    spec = expand_macros(spec)
    sources = spec.get("sources") or {}
    transforms = spec.get("transforms") or {}
    missing = set(sources) - set(source_frames)
    if missing:
        raise PipelineError(f"no DataFrame provided for sources: {sorted(missing)}")

    consumers: dict[str, int] = {}
    for frm, _ in _edges(spec):
        consumers[frm] = consumers.get(frm, 0) + 1

    outputs: dict[str, DataFrame | dict[str, DataFrame]] = {}
    for name in sources:
        outputs[name] = source_frames[name]

    remaining = dict(transforms)
    while remaining:
        progressed = False
        for name in list(remaining):
            comp = remaining[name]
            deps = {i.split(".", 1)[0] for i in comp.get("inputs", [])}
            if not deps.issubset(outputs):
                continue
            df = _resolve_inputs(comp["inputs"], outputs)
            opts = comp
            if cache_fanout and comp.get("type") == "route":
                opts = {**comp, "_fanout_consumers": consumers.get(name, 0)}
            if comp.get("reroute_dropped"):
                opts = {**opts, "_component_name": name}
            result = TRANSFORMS[comp["type"]](df, opts, ctx)
            # Fanout: one output feeding N consumers recomputes N times
            # unless cached (fanout.rs analogue); opt out per component
            if (
                cache_fanout
                and consumers.get(name, 0) > 1
                and comp.get("cache", True)
                and not isinstance(result, dict)
            ):
                result = result.cache()
            outputs[name] = result
            del remaining[name]
            progressed = True
        if not progressed:  # pragma: no cover - validate_spec catches cycles
            raise PipelineError(f"unresolvable components: {sorted(remaining)}")
    return outputs


def file_sink_line(df: DataFrame, comp: dict, name: str):
    """File-sink encoding (src/sinks/file + lib/codecs/src/encoding/
    format/): render one string per event per the configured codec.
    Returns (df, line_col) — statsd/prometheus encoders rewrite the
    frame itself (metric-row input), so the caller must use BOTH.
    Shared by the batch runner and the streaming spec runner so one
    config encodes identically in either mode."""
    enc = comp.get("encoding") or {}
    codec = enc.get("codec", "json")
    if codec == "json":
        line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    elif codec == "logfmt":
        from vector_spark.vrl import encode_key_value

        m = F.create_map(
            *[
                x
                for c in df.columns
                for x in (F.lit(c), F.col(c).cast("string"))
            ]
        )
        line = encode_key_value(m)
    elif codec == "text":
        fldn = enc.get("field", "message")
        if fldn not in df.columns:
            raise PipelineError(
                f"{name}: text codec field {fldn!r} not in input"
            )
        line = F.col(fldn).cast("string")
    elif codec == "gelf":
        msg_field = enc.get("field", "message")
        if msg_field not in df.columns:
            raise PipelineError(
                f"{name}: gelf codec needs a {msg_field!r} column"
            )
        gelf_cols = [
            F.lit("1.1").alias("version"),
            (
                F.col("host")
                if "host" in df.columns
                else F.lit("vector-spark")
            ).alias("host"),
            F.col(msg_field).cast("string").alias("short_message"),
        ]
        if "timestamp" in df.columns:
            gelf_cols.append(
                F.col("timestamp")
                .cast("timestamp_ltz")
                .cast("double")
                .alias("timestamp")
            )
        if "level" in df.columns:
            gelf_cols.append(F.col("level").cast("long").alias("level"))
        for c in df.columns:
            if c not in ("host", msg_field, "timestamp", "level"):
                gelf_cols.append(F.col(c).cast("string").alias("_" + c))
        line = F.to_json(F.struct(*gelf_cols))
    elif codec == "statsd":
        # metric-row input shape (src/sinks/statsd.rs)
        from vector_spark.codecs import encode_statsd

        line = F.col("statsd_line")
        df = encode_statsd(df, namespace=enc.get("namespace"))
    elif codec == "prometheus":
        from vector_spark.codecs import encode_prometheus

        line = F.col("prom_line")
        df = encode_prometheus(df, namespace=enc.get("namespace"))
    elif codec == "native_json":
        from vector_spark.codecs import encode_native_json_log

        line = encode_native_json_log(df, enc.get("fields") or df.columns)
    else:
        raise PipelineError(f"{name}: unknown encoding codec {codec!r}")
    return df, line


def run_pipeline(
    ctx: PipelineContext,
    spec: dict,
    source_frames: dict[str, DataFrame],
) -> dict[str, Any]:
    """Execute sinks. Returns {sink: result} where result is the
    DataFrame (memory), row count (blackhole), collected rows
    (console), or {'path', 'rows'} (parquet).

    File-sink line rendering lives in `file_sink_line` so the
    streaming spec runner encodes identically (same config, same
    bytes on disk in either mode)."""
    spec = expand_macros(spec)  # sink inputs may name macro components
    outputs = compile_pipeline(ctx, spec, source_frames)
    results: dict[str, Any] = {}
    for name, comp in (spec.get("sinks") or {}).items():
        df = _resolve_inputs(comp["inputs"], outputs)
        only = comp.get("only_fields")
        if only:  # encoding transformer (src/codecs/encoding/config.rs:155-157)
            df = df.select(*only)
        for drop_f in comp.get("except_fields") or []:
            df = df.drop(drop_f)
        tf = comp.get("timestamp_format")
        if tf:  # encoding transformer TimestampFormat (config.rs:159;
            # lib/vector-core Unix -> epoch seconds, RFC3339 -> UTC text)
            if tf not in ("unix", "rfc3339"):
                raise PipelineError(
                    f"{name}: timestamp_format must be unix|rfc3339"
                )
            for fld in df.schema.fields:
                if fld.dataType.typeName().startswith("timestamp"):
                    col = F.col(fld.name)
                    df = df.withColumn(
                        fld.name,
                        # NTZ needs the LTZ hop before long (UTC session)
                        col.cast("timestamp_ltz").cast("long")
                        if tf == "unix"
                        else F.date_format(
                            col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
                        ),
                    )
        kind = comp.get("type", "memory")
        if kind == "memory":
            results[name] = df
        elif kind == "blackhole":
            results[name] = df.count()
        elif kind == "console":
            # the reference console sink streams; batch collect gets a
            # sanity cap so a misrouted firehose can't OOM the driver
            limit = comp.get("limit", 1000)
            results[name] = [r.asDict() for r in df.limit(limit).collect()]
        elif kind == "file":
            # file sink (src/sinks/file): newline framing + encoding
            # codec (lib/codecs/src/encoding/format/): json / logfmt /
            # text / gelf rendered as one `value` string per event,
            # written with the distributed text writer
            path = comp["path"]
            df, line = file_sink_line(df, comp, name)
            key_tmpl = comp.get("key_template")
            if key_tmpl:
                # KeyPartitioner (src/sinks/util/partitioner.rs:5-30):
                # render the path template per event and write each
                # key's batch to its own directory
                from vector_spark.template import render_template

                out_df = df.select(
                    render_template(
                        key_tmpl, ts_col=comp.get("ts_col", "ts")
                    ).alias("_key"),
                    line.alias("value"),
                )
                writer, obs = observe_stage(out_df, f"sink:{name}")
                writer.write.mode(
                    comp.get("mode", "overwrite")
                ).partitionBy("_key").text(path)
            else:
                out_df = df.select(line.alias("value"))
                writer, obs = observe_stage(out_df, f"sink:{name}")
                writer.write.mode(comp.get("mode", "overwrite")).text(path)
            results[name] = {"path": path, "rows": obs.get["rows"]}
        elif kind == "parquet":
            path = comp["path"]
            # observe the writer input: routed-row count arrives as a
            # side effect of the write action itself (EventsSent
            # telemetry) instead of re-reading the sink output — the
            # old read-back doubled sink I/O at scale
            writer, obs = observe_stage(df, f"sink:{name}")
            partition_by = comp.get("partition_by") or []
            if partition_by:
                writer = writer.repartition(*partition_by)
            w = writer.write.mode(comp.get("mode", "overwrite"))
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(path)
            results[name] = {"path": path, "rows": obs.get["rows"]}
        else:
            raise PipelineError(f"{name}: unknown sink type {kind!r}")
    return results


def unit_test(
    ctx: PipelineContext,
    spec: dict,
    inserts: dict[str, DataFrame],
    extracts: list[str],
) -> dict[str, DataFrame]:
    """`vector test` analogue (src/config/unit_test/mod.rs:135-290):
    inject DataFrames at named components (replacing their real
    inputs) and extract any component's output. Components upstream
    of every insert point are not executed."""
    spec = expand_macros(spec)
    transforms = spec.get("transforms") or {}
    # keep only components downstream of an insert point (the real
    # sources and anything upstream of the injection are not run)
    downstream: dict[str, list[str]] = {}
    for frm, to in _edges(spec):
        downstream.setdefault(frm, []).append(to)
    reachable: set[str] = set()
    frontier = list(inserts)
    while frontier:
        node = frontier.pop()
        for nxt in downstream.get(node, []):
            if nxt not in reachable:
                reachable.add(nxt)
                frontier.append(nxt)
    # a kept transform may have a mix of inputs: some downstream of an
    # insert point, some from non-inserted upstream components that
    # were pruned away. Keep only the surviving inputs (the reference
    # unit-test framework runs such transforms on the injected data
    # alone, src/config/unit_test/mod.rs); error only if none remain.
    survivors = reachable | set(inserts)
    kept: dict[str, dict] = {}
    for name, comp in transforms.items():
        if name not in reachable or name in inserts:
            continue
        inputs = [
            i for i in comp.get("inputs", [])
            if i.split(".", 1)[0] in survivors
        ]
        if not inputs:
            raise PipelineError(
                f"{name}: no inputs reachable from insert points"
            )
        kept[name] = {**comp, "inputs": inputs}
    pruned = {
        "sources": {name: {} for name in inserts},
        "transforms": kept,
        "sinks": {},
    }
    # rewire: a transform listed in inserts becomes a source
    outputs = compile_pipeline(ctx, pruned, dict(inserts), cache_fanout=False)
    out: dict[str, DataFrame] = {}
    for ex in extracts:
        base, _, port = ex.partition(".")
        res = outputs[base]
        out[ex] = res[port] if isinstance(res, dict) else res
    return out
