"""Reference-style config front door: load a `vector`-shaped TOML /
JSON / YAML config, map it onto the pipeline spec, and run it — the
"switch your config over" path for a reference user.

Covers the reference's config surface the rebuild supports:
* `[sources.*]` demo_logs / file / stdin (others: pass DataFrames via
  `source_frames` — the documented adapter pattern for push sources)
* `[transforms.*]` every implemented transform type; option spellings
  mapped from the reference's (`fields.match` -> `match`,
  `route.<name>` -> `routes`, Vector 0.24 `pipelines` expanded to the
  route/chain/union form)
* `[sinks.*]` passthrough to run_pipeline's sink executor (console /
  blackhole / memory / file with encoding codecs / parquet)
* `[[tests]]` — the `vector test` harness (src/config/unit_test/):
  insert events at named components, assert output conditions with
  the reference's pass semantics (every condition must hold for at
  least one extracted event; `no_outputs_from` must be empty).

The event/schema builders here are also what tests/test_behavior.py
uses to replay the reference's own behavior-test TOMLs.
"""

from __future__ import annotations

import json
import os
import re
import tomllib
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# config loading
# ---------------------------------------------------------------------------


def load_config(src: str) -> dict:
    """Parse a config from a path or literal text. TOML first (the
    reference's native format), then JSON, then YAML if a parser is
    importable."""
    is_path = len(src) < 4096 and "\n" not in src and os.path.exists(src)
    if not is_path and src.endswith((".toml", ".json", ".yaml", ".yml")):
        # a config-extension name that doesn't exist is a mistyped
        # path — say so, instead of feeding the filename to the TOML
        # parser and failing with an opaque parse error
        raise FileNotFoundError(f"config file not found: {src}")
    if is_path:
        text = open(src).read()
        if src.endswith(".json"):
            return json.loads(text)
        if src.endswith((".yaml", ".yml")):
            return _load_yaml(text)
        return tomllib.loads(text)
    try:
        return tomllib.loads(src)
    except Exception:
        pass
    try:
        return json.loads(src)
    except Exception:
        pass
    return _load_yaml(src)


def _load_yaml(text: str) -> dict:
    try:
        import yaml  # optional — not baked into every image
    except ImportError as e:  # pragma: no cover
        raise ValueError(
            "config is neither TOML nor JSON, and no YAML parser is "
            "available"
        ) from e
    return yaml.safe_load(text)


# ---------------------------------------------------------------------------
# schema inference + event building (shared with tests/test_behavior.py)
# ---------------------------------------------------------------------------


def _merge_type(a, b):
    if a is None:
        return b
    if b is None or a == b:
        return a
    if {a.typeName(), b.typeName()} <= {"long", "double"}:
        return T.DoubleType()
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        names = list(
            dict.fromkeys([f.name for f in a.fields] + [f.name for f in b.fields])
        )
        af = {f.name: f.dataType for f in a.fields}
        bf = {f.name: f.dataType for f in b.fields}
        return T.StructType(
            [T.StructField(n, _merge_type(af.get(n), bf.get(n))) for n in names]
        )
    return T.StringType()


def infer_type(v) -> T.DataType:
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, dict):
        return T.StructType([T.StructField(k, infer_type(x)) for k, x in v.items()])
    if isinstance(v, list):
        et = None
        for x in v:
            et = _merge_type(et, infer_type(x))
        return T.ArrayType(et or T.StringType())
    return T.StringType()


def schema_of_rows(rows: list[dict]) -> T.StructType:
    merged: dict[str, T.DataType] = {}
    order: list[str] = []
    for r in rows:
        for k, v in r.items():
            if k not in merged:
                order.append(k)
            merged[k] = _merge_type(merged.get(k), infer_type(v))
    return T.StructType([T.StructField(k, merged[k]) for k in order])


def _to_row(v, dt):
    if v is None:
        return None
    if isinstance(dt, T.StructType):
        v = v if isinstance(v, dict) else {}
        return tuple(_to_row(v.get(f.name), f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return [_to_row(x, dt.elementType) for x in v]
    if isinstance(dt, T.DoubleType) and isinstance(v, int):
        return float(v)
    if isinstance(dt, T.StringType) and not isinstance(v, str):
        return json.dumps(v) if isinstance(v, (dict, list)) else str(v)
    return v


def path_segments(key: str) -> list:
    """Vector event-path keys: dot-separated segments, segments may be
    double-quoted (literal, may contain dots) or carry [i] indices."""
    segs: list = []
    i, n = 0, len(key)
    while i < n:
        if key[i] == '"':
            j = key.index('"', i + 1)
            segs.append(key[i + 1 : j])
            i = j + 1
        elif key[i] == ".":
            i += 1
        elif key[i] == "[":
            j = key.index("]", i)
            segs.append(int(key[i + 1 : j]))
            i = j + 1
        else:
            m = re.match(r'[^."\[]+', key[i:])
            segs.append(m.group(0))
            i += len(m.group(0))
    return segs


def _set_path(out, segs: list, value):
    head = segs[0]
    if len(segs) == 1:
        if isinstance(head, int):
            while len(out) <= head:
                out.append(None)
            out[head] = value
        else:
            out[head] = value
        return
    child_default: list | dict = [] if isinstance(segs[1], int) else {}
    if isinstance(head, int):
        while len(out) <= head:
            out.append(None)
        if out[head] is None:
            out[head] = child_default
        _set_path(out[head], segs[1:], value)
    else:
        _set_path(out.setdefault(head, child_default), segs[1:], value)


def fold_paths(fields: dict) -> dict:
    """log_fields keys are Vector event paths (`a."b.c"`, `arr[0]`)
    -> fold into nested dicts/lists."""
    out: dict = {}
    for k, v in fields.items():
        _set_path(out, path_segments(k), v)
    return out


def normalize_test_inputs(test: dict) -> list[dict]:
    """`[[tests.inputs]]` entries -> [{insert_at, log_fields}]: the
    log_fields / raw `value` / metric shorthands of the reference
    unit-test framework (src/config/unit_test/mod.rs input kinds)."""
    raw = test.get("inputs") or ([test["input"]] if "input" in test else [])
    out = []
    for i in raw:
        fields = i.get("log_fields")
        if fields is None and "metric" in i:
            fields = i["metric"]
        if fields is None and "value" in i:
            fields = {"message": i["value"]}
        out.append({"insert_at": i["insert_at"], "log_fields": fields or {}})
    return out


def build_event_frames(
    spark: SparkSession, inputs: list[dict]
) -> dict[str, DataFrame]:
    """One DataFrame per insert point, rows in arrival order (_seq);
    every event gets the unit-test source's ingest timestamp."""
    by_point: dict[str, list[dict]] = {}
    for i in inputs:
        by_point.setdefault(i["insert_at"], []).append(
            fold_paths(i["log_fields"])
        )
    frames = {}
    for point, rows in by_point.items():
        schema = schema_of_rows(rows)
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_seq", T.LongType())]
        )
        data = [
            tuple(_to_row(r.get(f.name), f.dataType) for f in schema.fields[:-1])
            + (i,)
            for i, r in enumerate(rows)
        ]
        df = spark.createDataFrame(data, schema)
        if "timestamp" not in df.columns:
            df = df.withColumn(
                "timestamp",
                F.timestamp_seconds(F.lit(1700000000) + F.col("_seq")),
            )
        frames[point] = df
    return frames


# ---------------------------------------------------------------------------
# reference config options -> pipeline-spec options
# ---------------------------------------------------------------------------


def _ident(c):
    return c


def map_transform(
    name: str,
    comp: dict,
    map_condition: Callable = _ident,
    base_dir: str | None = None,
) -> dict:
    """One reference transform table -> our spec component. Option
    spellings that differ are translated; everything else passes
    through to the transform executor."""
    t = comp.get("type")
    out = {"type": t, "inputs": list(comp.get("inputs") or [])}
    if t == "remap":
        if "source" in comp:
            out["source"] = comp["source"]
        else:  # remap `file = ...`: program text lives next to the config
            path = comp["file"]
            if base_dir and not os.path.isabs(path):
                path = os.path.join(base_dir, path)
            out["source"] = open(path).read()
        for k in ("drop_on_error", "drop_on_abort", "reroute_dropped"):
            if k in comp:
                out[k] = comp[k]
    elif t == "filter":
        out["condition"] = map_condition(comp["condition"])
    elif t == "route":
        out["routes"] = {
            n: map_condition(c) for n, c in (comp.get("route") or {}).items()
        }
    elif t == "dedupe":
        fields = comp.get("fields") or {}
        out["match"] = fields.get("match")
        out["ignore"] = fields.get("ignore")
        out["order_by"] = comp.get("order_by") or ["_seq"]
    elif t == "reduce":
        out["group_by"] = comp.get("group_by") or []
        out["order_by"] = comp.get("order_by") or "_seq"
        if "ends_when" in comp:
            out["ends_when"] = map_condition(comp["ends_when"])
        if "starts_when" in comp:
            out["starts_when"] = map_condition(comp["starts_when"])
        if "merge_strategies" in comp:
            out["merge_strategies"] = comp["merge_strategies"]
        if "expire_after_ms" in comp:
            out["expire_after_ms"] = comp["expire_after_ms"]
    elif t in ("sample", "throttle"):
        out.update(
            {
                k: v
                for k, v in comp.items()
                if k not in ("type", "inputs", "key_field")
            }
        )
        if "key_field" in comp:
            # Vector's key_field (sample.rs/throttle.rs) is a field
            # name or a simple '{{ field }}' template; the executors
            # take `key` (sample: one column, throttle: key list)
            kf = str(comp["key_field"]).strip()
            m = re.fullmatch(r"\{\{\s*([\w.@]+)\s*\}\}", kf)
            field = m.group(1) if m else kf
            out["key"] = field if t == "sample" else [field]
    else:
        out.update(
            {k: v for k, v in comp.items() if k not in ("type", "inputs")}
        )
    return out


def expand_pipelines(
    name: str,
    comp: dict,
    map_condition: Callable = _ident,
    base_dir: str | None = None,
) -> dict[str, dict]:
    """Vector 0.24 `pipelines` (src/transforms/pipelines/mod.rs): each
    sub-pipeline is a filter GATE — matching events run its transform
    chain, non-matching events BYPASS it, and both rejoin before the
    next sub-pipeline. Expand to route + chain + implicit-union."""
    out: dict[str, dict] = {}
    cur = list(comp.get("inputs") or [])
    for sub in comp.get("logs") or []:
        sname = f"{name}__{sub['name']}"
        prev = cur
        if "filter" in sub:
            rname = f"{sname}_gate"
            out[rname] = {
                "type": "route",
                "inputs": cur,
                "routes": {"hit": map_condition(sub["filter"])},
            }
            prev = [f"{rname}.hit"]
            bypass = [f"{rname}._unmatched"]
        else:
            bypass = []
        for j, t in enumerate(sub.get("transforms") or []):
            tname = f"{sname}_t{j}"
            out[tname] = {
                **map_transform(tname, t, map_condition, base_dir),
                "inputs": prev,
            }
            prev = [tname]
        cur = prev + bypass
    out[name] = {"type": "remap", "source": "", "inputs": cur}
    return out


def spec_from_config(
    cfg: dict,
    map_condition: Callable = _ident,
    base_dir: str | None = None,
) -> dict:
    """Whole reference config -> pipeline spec (sources and sinks pass
    through; transforms option-mapped; `pipelines` expanded)."""
    transforms: dict[str, dict] = {}
    for name, comp in (cfg.get("transforms") or {}).items():
        if comp.get("type") == "pipelines":
            transforms.update(
                expand_pipelines(name, comp, map_condition, base_dir)
            )
        else:
            transforms[name] = map_transform(
                name, comp, map_condition, base_dir
            )
    return {
        "sources": {
            n: dict(c) for n, c in (cfg.get("sources") or {}).items()
        },
        "transforms": transforms,
        "sinks": {n: dict(c) for n, c in (cfg.get("sinks") or {}).items()},
    }


def load_enrichment_tables(
    cfg: dict, base_dir: str | None = None
) -> dict[str, list[dict]]:
    """`[enrichment_tables.*]` -> row lists. File-backed CSV tables
    (src/enrichment_tables/file.rs) are read and schema-cast; a table
    already given as a row list passes through (test convenience)."""
    import csv

    out: dict[str, list[dict]] = {}
    for tname, tcfg in (cfg.get("enrichment_tables") or {}).items():
        if isinstance(tcfg, list):
            out[tname] = tcfg
            continue
        path = tcfg["file"]["path"]
        if base_dir and not os.path.isabs(path):
            # normpath keeps '../shared/table.csv' meaning "one level
            # up from the config file" (lstrip would eat the '..')
            path = os.path.normpath(os.path.join(base_dir, path))
        with open(path, newline="") as cf:
            rows = list(csv.DictReader(cf))
        for col, typ in (tcfg.get("schema") or {}).items():
            for r in rows:
                if typ == "integer":
                    r[col] = int(r[col])
                elif typ == "float":
                    r[col] = float(r[col])
        out[tname] = rows
    return out


# ---------------------------------------------------------------------------
# running configs
# ---------------------------------------------------------------------------


def _decode_kw(spark: SparkSession, dec: dict, include: str | None) -> dict:
    """Extra decode_frame kwargs from a `decoding` block. json needs a
    schema: an explicit DDL string (`decoding.schema = "a string, n
    int"`) wins; otherwise infer it from the files once (batch AND
    streaming read the same inferred shape, so both modes agree)."""
    if dec.get("codec") != "json":
        return {}
    ddl = dec.get("schema")
    if ddl:
        from pyspark.sql.types import _parse_datatype_string

        return {"schema": _parse_datatype_string(ddl)}
    if include:
        # include may be Vector's array spelling — spark.read.json
        # accepts both a str and a list of paths; str() would mangle
        # the list into a literal "['...']" path
        return {"schema": spark.read.json(include).schema}
    raise ValueError("json decoding needs `schema` or a file include")


def build_source_frames(
    spark: SparkSession,
    cfg: dict,
    sf_dir: str | None = None,
    source_frames: dict[str, DataFrame] | None = None,
    listeners: dict | None = None,
) -> dict[str, DataFrame]:
    """DataFrames for each `[sources.*]` entry. demo_logs uses the
    deterministic generators (needs sf_dir); `file` reads text lines
    and applies `decoding.codec`; `socket`/`http` take a drained
    sources_net listener via `listeners[name]` and apply the config's
    `framing` + `decoding` blocks; anything else must be supplied via
    `source_frames` (the adapter pattern for push sources)."""
    from vector_spark.sources import (
        apply_framing,
        decode_frame,
        demo_logs_batch,
    )

    frames = dict(source_frames or {})
    for name, comp in (cfg.get("sources") or {}).items():
        if name in frames:
            continue
        t = comp.get("type")
        if t == "demo_logs":
            if sf_dir is None:
                raise ValueError(f"source {name}: demo_logs needs sf_dir")
            frames[name] = demo_logs_batch(
                spark, sf_dir, comp.get("format", "apache_common")
            )
        elif t == "file":
            include = comp.get("include")
            if not include:
                raise ValueError(f"source {name}: file needs `include`")
            df = spark.read.text(include).withColumnRenamed("value", "line")
            dec = comp.get("decoding") or {}
            frames[name] = decode_frame(
                df, dec.get("codec", "bytes"),
                **_decode_kw(spark, dec, include),
            )
        elif t == "stdin":
            # batch stdin: the config carries the lines (`lines` key)
            # or the caller injects via source_frames
            lines = comp.get("lines")
            if lines is None:
                raise ValueError(
                    f"source {name}: stdin needs `lines` in the config "
                    "or a DataFrame via source_frames"
                )
            df = spark.createDataFrame([(ln,) for ln in lines], "line string")
            codec = (comp.get("decoding") or {}).get("codec", "bytes")
            frames[name] = decode_frame(df, codec)
        elif t in ("socket", "http", "syslog"):
            lst = (listeners or {}).get(name)
            if lst is None:
                raise ValueError(
                    f"source {name}: type {t!r} needs a drained "
                    "sources_net listener via `listeners` (the bounded "
                    "ingress edge; at cluster scale, land to a "
                    "directory and use a `file` source instead)"
                )
            raw = lst.to_df(spark)
            dec = comp.get("decoding") or {}
            if "frame" in raw.columns:  # udp: datagram IS the frame
                framed = raw.withColumn(
                    "frame", F.col("frame").cast("string")
                )
            else:
                default = (
                    "octet_counting" if t == "syslog"
                    else "newline_delimited"
                )
                framed = apply_framing(
                    raw, comp.get("framing") or default
                )
            if t == "syslog":
                from vector_spark.sources import parse_syslog

                frames[name] = parse_syslog(framed, line_col="frame")
            else:
                frames[name] = decode_frame(
                    framed, dec.get("codec", "bytes"), line_col="frame",
                    **_decode_kw(spark, dec, None),
                )
        elif t == "exec":
            from vector_spark.sources import exec_source

            frames[name] = exec_source(
                spark,
                command=list(comp["command"]),
                include_stderr=comp.get("include_stderr", False),
                working_directory=comp.get("working_directory"),
            )
        else:
            raise ValueError(
                f"source {name}: type {t!r} has no batch reader here — "
                "pass a DataFrame via source_frames (adapter pattern)"
            )
    return frames


def build_enrichment_objects(
    spark: SparkSession, cfg: dict, rows: dict[str, list[dict]]
) -> dict:
    """EnrichmentTable objects for the spec transform types `enrich`
    and `geoip` (ctx.enrichment_tables), from the same loaded rows the
    VRL get_enrichment_table_record path uses. The join key comes from
    the table config's `key` (list or string; default: the first
    column — Vector resolves keys per-lookup, so a table used only by
    geoip/VRL never needs one)."""
    from vector_spark.enrich import EnrichmentTable

    out = {}
    for tname, tcfg in (cfg.get("enrichment_tables") or {}).items():
        tbl_rows = rows.get(tname) or []
        if not tbl_rows:
            continue
        df = spark.createDataFrame(tbl_rows)
        key = None
        if isinstance(tcfg, dict):
            key = tcfg.get("key") or (tcfg.get("file") or {}).get("key")
        if isinstance(key, str):
            key = [key]
        if not key:
            key = [list(tbl_rows[0].keys())[0]]
        case_sensitive = True
        if isinstance(tcfg, dict):
            case_sensitive = tcfg.get("case_sensitive", True)
        out[tname] = EnrichmentTable(
            df, key=key, name=tname, case_sensitive=case_sensitive
        )
    return out


def _load_ctx_enrichment(ctx, spark, cfg, base_dir) -> None:
    if not cfg.get("enrichment_tables"):
        return
    ctx.enrichment_rows = load_enrichment_tables(cfg, base_dir)
    ctx.enrichment_tables = build_enrichment_objects(
        spark, cfg, ctx.enrichment_rows
    )


def _load_cfg(
    config: str | dict, base_dir: str | None = None
) -> tuple[dict, str | None]:
    """Shared front door for run_config/run_config_tests/
    run_config_streaming: parse `config` (path or literal/dict) and
    derive base_dir from a path when the caller didn't supply one."""
    if isinstance(config, str):
        if base_dir is None and "\n" not in config and os.path.exists(config):
            base_dir = os.path.dirname(os.path.abspath(config))
        return load_config(config), base_dir
    return config, base_dir


def run_config(
    spark: SparkSession,
    config: str | dict,
    sf_dir: str | None = None,
    source_frames: dict[str, DataFrame] | None = None,
    listeners: dict | None = None,
) -> dict[str, Any]:
    """Load + run a reference-style config end-to-end; returns the
    per-sink results exactly like run_pipeline. `listeners` supplies
    drained sources_net listeners for socket/http/syslog sources."""
    from vector_spark.pipeline import PipelineContext, run_pipeline

    cfg, base_dir = _load_cfg(config)
    spec = spec_from_config(cfg, base_dir=base_dir)
    frames = build_source_frames(
        spark, cfg, sf_dir, source_frames, listeners=listeners
    )
    ctx = PipelineContext(spark)
    _load_ctx_enrichment(ctx, spark, cfg, base_dir)
    return run_pipeline(ctx, spec, frames)


def run_config_tests(
    spark: SparkSession,
    config: str | dict,
    map_condition: Callable = _ident,
    base_dir: str | None = None,
) -> dict[str, list[str]]:
    """`vector test` (src/config/unit_test/mod.rs:135-290): run every
    `[[tests]]` block; returns {test_name: [error strings]} — empty
    list = pass. Pass semantics per unit_test_components.rs:150-180:
    each output condition must hold for >=1 extracted event;
    `no_outputs_from` components must emit nothing. A test that
    errors (e.g. a documented typed-column divergence) records the
    exception instead of aborting the remaining tests."""
    cfg, base_dir = _load_cfg(config, base_dir)
    results: dict[str, list[str]] = {}
    for test in cfg.get("tests") or []:
        try:
            results[test["name"]] = _run_one_test(
                spark, cfg, test, map_condition, base_dir
            )
        except Exception as e:
            results[test["name"]] = [f"{type(e).__name__}: {str(e)[:300]}"]
    return results


def _run_one_test(
    spark: SparkSession,
    cfg: dict,
    test: dict,
    map_condition: Callable,
    base_dir: str | None,
) -> list[str]:
    from vector_spark.pipeline import (
        PipelineContext,
        compile_condition,
        unit_test,
    )

    inputs = normalize_test_inputs(test)
    frames = build_event_frames(spark, inputs)
    transforms: dict[str, dict] = {}
    for name, comp in (cfg.get("transforms") or {}).items():
        if comp.get("type") == "pipelines":
            transforms.update(expand_pipelines(name, comp, map_condition))
            continue
        mapped = map_transform(name, comp, map_condition, base_dir)
        if name in frames:
            # the reference feeds the inserted component itself;
            # our unit_test injects sources — rewire
            mapped["inputs"] = [f"__in_{name}"]
        transforms[name] = mapped
    spec = {"sources": {}, "transforms": transforms, "sinks": {}}
    inserts = {f"__in_{p}": df for p, df in frames.items()}
    outputs_spec = test.get("outputs") or []
    no_outputs = test.get("no_outputs_from") or []
    extracts = [o["extract_from"] for o in outputs_spec] + list(no_outputs)

    ctx = PipelineContext(spark)
    _load_ctx_enrichment(ctx, spark, cfg, base_dir)
    got = unit_test(ctx, spec, inserts, extracts)

    errors: list[str] = []
    for o in outputs_spec:
        df = got[o["extract_from"]].cache()
        if df.count() == 0:
            errors.append(f"{o['extract_from']}: no events received")
            continue
        for cond in o.get("conditions") or []:
            c = compile_condition(map_condition(cond), df.schema)
            if df.filter(F.coalesce(c, F.lit(False))).count() == 0:
                errors.append(f"{o['extract_from']}: condition failed {cond}")
    for comp in no_outputs:
        if got[comp].count() != 0:
            errors.append(f"{comp}: expected no outputs")
    return errors


def run_config_streaming(
    spark: SparkSession,
    config: str | dict,
    out_dir: str,
    checkpoint_dir: str | None = None,
    source_streams: dict[str, DataFrame] | None = None,
    trigger_once: bool = True,
) -> dict[str, Any]:
    """Streaming twin of run_config: `[sources.file]` entries become
    readStream file sources (schema inferred from the existing data);
    other source types must be supplied as streams (adapter pattern).
    Sinks run under streaming/spec_runner.py's per-sink queries with
    epoch-idempotent writes."""
    from vector_spark.pipeline import PipelineContext
    from vector_spark.streaming.spec_runner import run_pipeline_streaming

    cfg, base_dir = _load_cfg(config)
    spec = spec_from_config(cfg, base_dir=base_dir)
    streams = dict(source_streams or {})
    for name, comp in (cfg.get("sources") or {}).items():
        if name in streams:
            continue
        if comp.get("type") != "file":
            raise ValueError(
                f"source {name}: type {comp.get('type')!r} has no "
                "streaming reader here — pass it via source_streams"
            )
        include = comp.get("include")
        if not include:
            raise ValueError(f"source {name}: file needs `include`")
        if isinstance(include, (list, tuple)):
            # Vector's include is an array; readStream.load takes one
            # path — accept the 1-element spelling, reject the rest
            # loudly (endswith/isdir probes on a stringified list are
            # silently false)
            if len(include) != 1:
                raise ValueError(
                    f"source {name}: streaming file source takes ONE "
                    f"include path, got {len(include)}"
                )
            include = include[0]
        codec = (comp.get("decoding") or {}).get("codec")
        is_parquet = str(include).endswith(".parquet") or (
            # a directory is a parquet table only if it holds parquet
            # parts — an explicit decoding codec, or text files in the
            # dir, means the batch-identical text reader
            codec is None
            and os.path.isdir(str(include))
            and any(
                f.endswith(".parquet")
                for f in os.listdir(str(include))
            )
        )
        if is_parquet:
            schema = spark.read.parquet(include).schema
            streams[name] = (
                spark.readStream.schema(schema).parquet(include)
            )
        else:
            from vector_spark.sources import decode_frame

            raw = (
                spark.readStream.format("text")
                .load(include)
                .withColumnRenamed("value", "line")
            )
            # same decoding.codec as the batch front door — pure
            # Column expressions, so it applies to streaming frames
            dec = comp.get("decoding") or {}
            streams[name] = decode_frame(
                raw, codec or "bytes", **_decode_kw(spark, dec, include)
            )
    ctx = PipelineContext(spark)
    _load_ctx_enrichment(ctx, spark, cfg, base_dir)
    return run_pipeline_streaming(
        ctx, spec, streams, out_dir,
        checkpoint_dir=checkpoint_dir, trigger_once=trigger_once,
    )
