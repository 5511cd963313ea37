"""Pipeline spec compiler tests — the config/graph.rs analogue checks
(validation, cycles, ports) plus end-to-end spec execution and the
`vector test` inject/extract harness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF
from vector_spark.enrich import role_dim
from vector_spark.pipeline import (
    PipelineContext,
    PipelineError,
    compile_pipeline,
    run_pipeline,
    unit_test,
    validate_spec,
)

SPEC = {
    "sources": {"transcripts": {"type": "parquet"}},
    "transforms": {
        "parse": {"type": "parse_regex", "inputs": ["transcripts"], "field": "text"},
        "enrich": {
            "type": "enrich", "inputs": ["parse"], "table": "role_dim",
        },
        "split": {
            "type": "route",
            "inputs": ["enrich"],
            "routes": {
                "errors": {"type": "check_fields", "level__eq": "ERROR"},
                "assistant": "role = 'assistant'",
            },
        },
        "err_metrics": {
            "type": "log_to_metric",
            "inputs": ["split.errors"],
            "metrics": [{"kind": "counter", "name": "errors"}],
            "tags": ["role"],
        },
    },
    "sinks": {
        "err_out": {"type": "memory", "inputs": ["err_metrics"]},
        "rest": {"type": "blackhole", "inputs": ["split._unmatched", "split.assistant"]},
    },
}


def _ctx(spark):
    return PipelineContext(spark, enrichment_tables={"role_dim": role_dim(spark)})


def test_validate_rejects_unknown_input(spark):
    bad = {"sources": {}, "transforms": {
        "f": {"type": "filter", "inputs": ["nope"], "condition": "1=1"}}}
    with pytest.raises(PipelineError, match="unknown input"):
        validate_spec(bad)


def test_validate_rejects_cycle(spark):
    bad = {
        "sources": {"s": {}},
        "transforms": {
            "a": {"type": "filter", "inputs": ["s", "b"], "condition": "1=1"},
            "b": {"type": "filter", "inputs": ["a"], "condition": "1=1"},
        },
    }
    with pytest.raises(PipelineError, match="cycle"):
        validate_spec(bad)


def test_validate_rejects_reserved_route_name(spark):
    bad = {
        "sources": {"s": {}},
        "transforms": {
            "r": {"type": "route", "inputs": ["s"],
                  "routes": {"_unmatched": "1=1"}},
        },
    }
    with pytest.raises(PipelineError, match="reserved"):
        validate_spec(bad)


def test_validate_requires_port_on_route_consumer(spark):
    bad = {
        "sources": {"s": {}},
        "transforms": {
            "r": {"type": "route", "inputs": ["s"], "routes": {"x": "1=1"}},
            "f": {"type": "filter", "inputs": ["r"], "condition": "1=1"},
        },
    }
    with pytest.raises(PipelineError, match="explicit port"):
        validate_spec(bad)


def test_spec_end_to_end(spark, transcripts):
    results = run_pipeline(_ctx(spark), SPEC, {"transcripts": transcripts})
    err = results["err_out"]
    # error counter per (window, role) is positive everywhere it exists
    rows = err.collect()
    assert rows and all(r["errors"] >= 0 for r in rows)
    assert results["rest"] > 0
    # routed disjointness: errors port + assistant port + unmatched
    # cover every parsed row at least once (route clones multi-match)
    outputs = compile_pipeline(_ctx(spark), SPEC, {"transcripts": transcripts})
    parsed_n = outputs["parse"].count()
    split = outputs["split"]
    port_n = sum(split[p].count() for p in split)
    assert port_n >= parsed_n


def test_unit_test_harness(spark, transcripts):
    """vector-test analogue: inject at `enrich` (skipping the real
    parse stage), extract the route ports."""
    fake = transcripts.limit(50).withColumn("level", F.lit("ERROR"))
    out = unit_test(_ctx(spark), SPEC, inserts={"enrich": fake},
                    extracts=["split.errors", "split._unmatched"])
    assert out["split.errors"].count() == 50
    assert out["split._unmatched"].count() == 0


def test_multi_input_union(spark, transcripts):
    spec = {
        "sources": {"a": {}, "b": {}},
        "transforms": {
            "merged": {"type": "filter", "inputs": ["a", "b"],
                       "condition": "turn_idx >= 0"},
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["merged"]}},
    }
    small = transcripts.limit(10)
    res = run_pipeline(PipelineContext(spark), spec, {"a": small, "b": small})
    assert res["out"] == 20


def test_sink_timestamp_format(spark, transcripts):
    """Encoding transformer timestamp_format (config.rs:159): unix ->
    epoch seconds, rfc3339 -> UTC text; non-timestamp columns pass
    through untouched."""
    spec = {
        "sources": {"transcripts": {"type": "parquet"}},
        "transforms": {},
        "sinks": {
            "unix": {
                "type": "memory", "inputs": ["transcripts"],
                "only_fields": ["conv_id", "ts"],
                "timestamp_format": "unix",
            },
            "rfc": {
                "type": "memory", "inputs": ["transcripts"],
                "only_fields": ["conv_id", "ts"],
                "timestamp_format": "rfc3339",
            },
        },
    }
    out = run_pipeline(_ctx(spark), spec, {"transcripts": transcripts})
    u = out["unix"].first()
    r = out["rfc"].first()
    assert dict(out["unix"].dtypes)["ts"] == "bigint" and u.ts > 1_000_000_000
    assert dict(out["rfc"].dtypes)["ts"] == "string"
    assert r.ts.endswith("Z") and "T" in r.ts

    bad = dict(spec, sinks={"s": {
        "type": "memory", "inputs": ["transcripts"], "timestamp_format": "nope",
    }})
    with pytest.raises(PipelineError):
        run_pipeline(_ctx(spark), bad, {"transcripts": transcripts})


def test_file_sink_codecs(spark, tmp_path):
    """file sink (src/sinks/file) with json/logfmt/text/gelf encoding
    codecs: newline-framed encoded events, round-trippable."""
    import json as _json

    df = spark.createDataFrame(
        [("h1", "hello world", 3), ("h2", "bye", 5)],
        "host string, message string, level long",
    )
    spec = {
        "sources": {"logs": {"type": "parquet"}},
        "sinks": {
            "j": {"type": "file", "inputs": ["logs"],
                  "path": str(tmp_path / "j"),
                  "encoding": {"codec": "json"}},
            "l": {"type": "file", "inputs": ["logs"],
                  "path": str(tmp_path / "l"),
                  "encoding": {"codec": "logfmt"}},
            "t": {"type": "file", "inputs": ["logs"],
                  "path": str(tmp_path / "t"),
                  "encoding": {"codec": "text"}},
            "g": {"type": "file", "inputs": ["logs"],
                  "path": str(tmp_path / "g"),
                  "encoding": {"codec": "gelf"}},
        },
    }
    res = run_pipeline(PipelineContext(spark), spec, {"logs": df})
    assert all(res[k]["rows"] == 2 for k in "jltg")

    jlines = [
        _json.loads(r["value"])
        for r in spark.read.text(str(tmp_path / "j")).collect()
    ]
    assert {j["host"] for j in jlines} == {"h1", "h2"}

    tlines = {r["value"] for r in spark.read.text(str(tmp_path / "t")).collect()}
    assert tlines == {"hello world", "bye"}

    llines = {r["value"] for r in spark.read.text(str(tmp_path / "l")).collect()}
    assert 'host=h1 level=3 message="hello world"' in llines

    glines = [
        _json.loads(r["value"])
        for r in spark.read.text(str(tmp_path / "g")).collect()
    ]
    by_host = {g["host"]: g for g in glines}
    assert by_host["h1"]["version"] == "1.1"
    assert by_host["h1"]["short_message"] == "hello world"
    assert by_host["h1"]["level"] == 3
    # gelf round-trip through the decoder
    from vector_spark.sources import decode_gelf

    dec = decode_gelf(
        spark.read.text(str(tmp_path / "g")).withColumnRenamed(
            "value", "line"
        )
    )
    rows = {r["host"]: r for r in dec.collect()}
    assert rows["h2"]["message"] == "bye"
    assert rows["h2"]["_decode_error"] is False


def test_spec_metric_to_log_and_script(spark):
    """spec types metric_to_log (reference variant-nested message) and
    script (the Python lua escape hatch, callable injected by library
    callers)."""
    from pyspark.sql import functions as F

    from vector_spark.pipeline import PipelineContext, run_pipeline

    metrics = spark.createDataFrame(
        [("hits", "counter", 2.0, {"h": "w1"})],
        "name string, kind string, value double, tags map<string,string>",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1700000000)))

    def double_value(batch):
        batch = batch.copy()
        batch["value"] = batch["value"] * 2
        return batch

    spec = {
        "sources": {"in": {"type": "memory"}},
        "transforms": {
            "boosted": {"type": "script", "inputs": ["in"],
                        "process": double_value},
            "logs": {"type": "metric_to_log", "inputs": ["boosted"]},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["logs"]}},
    }
    out = run_pipeline(PipelineContext(spark), spec, {"in": metrics})
    rows = out["out"].collect()
    assert len(rows) == 1
    import json

    msg = json.loads(rows[0]["message"])
    assert msg["name"] == "hits"
    assert msg["counter"]["value"] == 4.0  # script ran before the log


def test_spec_script_requires_callable(spark):
    import pytest

    from vector_spark.pipeline import PipelineContext, PipelineError, run_pipeline

    df = spark.createDataFrame([(1,)], "x long")
    spec = {
        "sources": {"in": {"type": "memory"}},
        "transforms": {"s": {"type": "script", "inputs": ["in"]}},
        "sinks": {"out": {"type": "memory", "inputs": ["s"]}},
    }
    with pytest.raises(PipelineError, match="callable"):
        run_pipeline(PipelineContext(spark), spec, {"in": df})


def test_spec_geoip_and_metadata(spark):
    """spec types geoip (IP-prefix broadcast enrich off a registered
    enrichment table) and aws_ec2_metadata (literal-stamped facts)."""
    from pyspark.sql import functions as F

    from vector_spark.pipeline import PipelineContext, run_pipeline

    events = spark.createDataFrame(
        [(1, "10.1.9.9"), (2, "10.2.3.4"), (3, "192.168.0.1")],
        "event_id long, host string",
    )
    dim = spark.createDataFrame(
        [(10 * 2**24 + 1 * 2**16, "us-east"),
         (10 * 2**24 + 2 * 2**16, "eu-west")],
        "prefix_int long, region string",
    )

    class _T:  # enrichment-table shim exposing .df
        def __init__(self, df):
            self.df = df

    ctx = PipelineContext(spark)
    ctx.enrichment_tables["geo"] = _T(dim)
    spec = {
        "sources": {"in": {"type": "memory"}},
        "transforms": {
            "located": {"type": "geoip", "inputs": ["in"],
                        "database": "geo", "source": "host"},
            "stamped": {"type": "aws_ec2_metadata", "inputs": ["located"],
                        "metadata": {"az": "use1-a", "instance_id": "i-1"},
                        "fields": ["az"]},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["stamped"]}},
    }
    out = {r["event_id"]: r for r in
           run_pipeline(ctx, spec, {"in": events})["out"].collect()}
    # geoip dim columns join on the /16 prefix
    assert out[1]["region"] == "us-east"
    assert out[2]["region"] == "eu-west"
    assert out[3]["region"] is None  # no matching prefix
    # metadata stamps every row
    assert all(r["az"] == "use1-a" for r in out.values())


def test_sample_keyed_exclude_bypass(spark):
    from pyspark.sql import functions as F

    from vector_spark.operators.sample import sample

    df = spark.createDataFrame(
        [(i, "vip" if i % 10 == 0 else "norm") for i in range(100)],
        "k long, klass string",
    )
    out = sample(df, rate=4, key="k",
                 exclude=F.col("klass") == "vip").collect()
    vips = [r for r in out if r["klass"] == "vip"]
    norm = [r for r in out if r["klass"] == "norm"]
    assert len(vips) == 10  # every excluded row forwarded
    assert all(r["sample_rate"] is None for r in vips)
    assert 0 < len(norm) < 90 and all(r["sample_rate"] == 4 for r in norm)


def test_reduce_expire_after_ms_batch_sessionizes(spark):
    """expire_after_ms must gap-sessionize in batch exactly like the
    streaming runner — not silently collapse each key to one row."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    df = spark.createDataFrame(
        [("h1", at(0), 1), ("h1", at(10), 2), ("h1", at(100), 4),
         ("h2", at(0), 8)],
        "host string, ts timestamp, v long",
    )
    ctx = PipelineContext(spark)
    spec = {
        "sources": {"s": {"type": "mem"}},
        "transforms": {
            "r": {
                "type": "reduce", "inputs": ["s"], "group_by": ["host"],
                "order_by": "ts", "expire_after_ms": 30000,
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["r"]}},
    }
    outs = compile_pipeline(ctx, spec, {"s": df})
    rows = sorted(
        ((r.host, r.v) for r in outs["r"].collect())
    )
    # h1 splits into two sessions at the 90s gap: sums 3 and 4
    assert rows == [("h1", 3), ("h1", 4), ("h2", 8)]


def test_throttle_spec_defaults_order_to_ts(spark, transcripts):
    ctx = PipelineContext(spark)
    spec = {
        "sources": {"s": {"type": "mem"}},
        "transforms": {
            "t": {"type": "throttle", "inputs": ["s"], "threshold": 2,
                  "window_secs": 3600},
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["t"]}},
    }
    outs = compile_pipeline(ctx, spec, {"s": transcripts.limit(200)})
    assert outs["t"].count() > 0  # no AnalysisException on unordered window


def test_sample_spec_keyless_counter_mode(spark, transcripts):
    ctx = PipelineContext(spark)
    spec = {
        "sources": {"s": {"type": "mem"}},
        "transforms": {
            "smp": {"type": "sample", "inputs": ["s"], "rate": 7},
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["smp"]}},
    }
    n = 210
    outs = compile_pipeline(ctx, spec, {"s": transcripts.limit(n)})
    assert outs["smp"].count() == n // 7  # every 7th by ts


def test_dedupe_spec_default_fields(spark, transcripts):
    ctx = PipelineContext(spark)
    spec = {
        "sources": {"s": {"type": "mem"}},
        "transforms": {"d": {"type": "dedupe", "inputs": ["s"]}},
        "sinks": {"out": {"type": "blackhole", "inputs": ["d"]}},
    }
    dup = transcripts.limit(50)
    outs = compile_pipeline(ctx, spec, {"s": dup.union(dup)})
    # default match (ts, text) collapses the duplicated half
    assert outs["d"].count() == 50


def test_reroute_dropped_requires_vrl_source(spark):
    spec = {
        "sources": {"s": {"type": "mem"}},
        "transforms": {
            "m": {"type": "remap", "inputs": ["s"],
                  "assignments": {"a": "1"}, "reroute_dropped": True},
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["m.dropped"]}},
    }
    with pytest.raises(PipelineError, match="source"):
        validate_spec(spec)


def test_port_on_single_output_component_rejected(spark, transcripts):
    ctx = PipelineContext(spark)
    spec = {
        "sources": {"s": {"type": "mem"}},
        "transforms": {
            "f": {"type": "filter", "inputs": ["s"],
                  "condition": "role = 'user'"},
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["f.dropped"]}},
    }
    with pytest.raises(PipelineError):
        compile_pipeline(ctx, spec, {"s": transcripts.limit(10)})
