"""Generic streaming spec executor (streaming/spec_runner.py): the
same pipeline spec produces the same per-sink results batch and
streaming, stateful transforms swap to their applyInPandasWithState
kernels, and batch-only transforms are rejected clearly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF
from vector_spark.pipeline import PipelineContext, PipelineError, run_pipeline
from vector_spark.streaming.spec_runner import (
    compile_pipeline_streaming,
    run_pipeline_streaming,
)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    from vector_spark.transcripts import load_transcripts

    d = str(tmp_path / "in")
    load_transcripts(spark, SF).coalesce(2).write.parquet(d)
    return d


def _stream(spark, d):
    from vector_spark.streaming.runner import file_transcripts_stream

    return file_transcripts_stream(spark, d)


def _spec():
    return {
        "sources": {"in": {"type": "file"}},
        "transforms": {
            "parsed": {
                "type": "remap",
                "inputs": ["in"],
                "source": '.text_len = length!(.text)',
            },
            "split": {
                "type": "route",
                "inputs": ["parsed"],
                "routes": {
                    "user": {"type": "vrl", "source": '.role == "user"'},
                    "bot": {"type": "vrl", "source": '.role == "assistant"'},
                },
            },
        },
        "sinks": {
            "user_out": {"type": "blackhole", "inputs": ["split.user"]},
            "bot_out": {"type": "blackhole", "inputs": ["split.bot"]},
        },
    }


def test_streaming_matches_batch_counts(spark, stream_dir, tmp_path):
    batch = run_pipeline(
        PipelineContext(spark), _spec(), {"in": spark.read.parquet(stream_dir)}
    )
    got = run_pipeline_streaming(
        PipelineContext(spark),
        _spec(),
        {"in": _stream(spark, stream_dir)},
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert got["user_out"] == batch["user_out"] > 0
    assert got["bot_out"] == batch["bot_out"] > 0


def test_streaming_parquet_sink_epoch_partitioned(spark, stream_dir, tmp_path):
    spec = _spec()
    spec["sinks"] = {
        "bot_out": {"type": "parquet", "inputs": ["split.bot"]},
    }
    got = run_pipeline_streaming(
        PipelineContext(spark),
        spec,
        {"in": _stream(spark, stream_dir)},
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    landed = spark.read.parquet(got["bot_out"]["path"])
    assert landed.count() == got["bot_out"]["rows"] > 0
    assert "_epoch" in landed.columns


def test_streaming_stateful_dedupe(spark, stream_dir, tmp_path):
    spec = {
        "sources": {"in": {"type": "file"}},
        "transforms": {
            "uniq": {
                "type": "dedupe",
                "inputs": ["in"],
                "match": ["conv_id", "role"],
            },
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["uniq"]}},
    }
    got = run_pipeline_streaming(
        PipelineContext(spark),
        spec,
        {"in": _stream(spark, stream_dir)},
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    # exactly one row per distinct (conv_id, role) pair survives
    want = (
        spark.read.parquet(stream_dir)
        .select("conv_id", "role").distinct().count()
    )
    assert got["out"] == want


def test_streaming_reduce_ends_when(spark, tmp_path):
    """reduce through the spec runner: ends_when condition compiled
    and precomputed, merge strategies mapped, flushed groups emitted;
    unterminated groups stay pending (reference in-flight
    transactions — same contract the kernel-level test pins)."""
    src_path = str(tmp_path / "in")
    pdf = spark.createDataFrame(
        [("c1", 1, "hello", 10), ("c1", 2, "DONE", 20), ("c1", 3, "tail", 5),
         ("c2", 1, "solo", 7)],
        "conv_id string, ts long, msg string, latency long",
    )
    pdf.write.parquet(src_path)
    spec = {
        "sources": {"in": {"type": "file"}},
        "transforms": {
            "conv": {
                "type": "reduce",
                "inputs": ["in"],
                "group_by": ["conv_id"],
                "ts_col": "ts",
                "merge_strategies": {"msg": "concat", "latency": "sum"},
                "ends_when": {"type": "vrl", "source": '.msg == "DONE"'},
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["conv"], "limit": 100}},
    }
    stream = spark.readStream.schema(pdf.schema).parquet(src_path)
    got = run_pipeline_streaming(
        PipelineContext(spark),
        spec,
        {"in": stream},
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    rows = {r["conv_id"]: r for r in got["out"]}
    assert list(rows) == ["c1"]  # c2 + c1's tail stay pending
    assert rows["c1"]["msg"] == "hello DONE"
    assert rows["c1"]["latency"] == 30.0 and rows["c1"]["n"] == 2


def test_streaming_tag_cardinality(spark, tmp_path):
    """tag_cardinality_limit as a stream — the reference's literal
    first-N-distinct HashSet semantics, stateful across micro-batches:
    the first 2 distinct roles pass, later values lose the tag."""
    src_path = str(tmp_path / "in")
    rows = [(i, ["alpha", "beta", "gamma", "delta"][min(i // 3, 3)])
            for i in range(12)]
    spark.createDataFrame(rows, "seq long, role string") \
        .coalesce(1).write.parquet(src_path)
    spec = {
        "sources": {"in": {"type": "file"}},
        "transforms": {
            "capped": {
                "type": "tag_cardinality_limit",
                "inputs": ["in"],
                "tag": "role",
                "value_limit": 2,
                "order_by": "seq",
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["capped"], "limit": 100}},
    }
    stream = spark.readStream.schema("seq long, role string").parquet(src_path)
    got = run_pipeline_streaming(
        PipelineContext(spark), spec, {"in": stream},
        out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ck"),
    )
    out = sorted(got["out"], key=lambda r: r["seq"])
    assert len(out) == 12  # drop_tag keeps every event
    assert [r["role"] for r in out[:6]] == ["alpha"] * 3 + ["beta"] * 3
    assert all(r["role"] is None for r in out[6:])  # over the limit


def test_run_config_streaming_end_to_end(spark, stream_dir, tmp_path):
    """A reference-style TOML config runs as a STREAM: file source ->
    compiled remap -> route -> per-sink queries, counts equal to the
    batch run of the same config."""
    import textwrap

    from vector_spark.config import run_config, run_config_streaming

    toml = textwrap.dedent(f"""
        [sources.in]
          type = "file"
          include = "{stream_dir}"

        [transforms.tagged]
          type = "remap"
          inputs = ["in"]
          source = '.text_len = length!(.text)'

        [transforms.split]
          type = "route"
          inputs = ["tagged"]
          [transforms.split.route.user]
            type = "vrl"
            source = '.role == "user"'

        [sinks.users]
          type = "blackhole"
          inputs = ["split.user"]

        [sinks.rest]
          type = "blackhole"
          inputs = ["split._unmatched"]
    """)
    streamed = run_config_streaming(
        spark, toml, out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    # batch twin of the same config: read the same dir as a table
    batch = run_config(
        spark, toml,
        source_frames={"in": spark.read.parquet(stream_dir)},
    )
    assert streamed["users"] == batch["users"] > 0
    assert streamed["rest"] == batch["rest"] > 0


def test_streaming_counter_sample(spark, tmp_path):
    """Counter-mode sample as a stream: every rate-th non-excluded
    event kept in arrival order; excluded events bypass without
    consuming the counter and carry NULL sample_rate."""
    src_path = str(tmp_path / "in")
    rows = [(i, "keepall" if i % 10 == 3 else "normal") for i in range(40)]
    spark.createDataFrame(rows, "seq long, klass string") \
        .coalesce(1).write.parquet(src_path)
    spec = {
        "sources": {"in": {"type": "file"}},
        "transforms": {
            "sampled": {
                "type": "sample",
                "inputs": ["in"],
                "rate": 5,
                "order_by": "seq",
                "exclude": {"type": "vrl", "source": '.klass == "keepall"'},
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["sampled"], "limit": 100}},
    }
    stream = (
        spark.readStream.schema("seq long, klass string")
        .parquet(src_path)
    )
    got = run_pipeline_streaming(
        PipelineContext(spark), spec, {"in": stream},
        out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ck"),
    )
    out = sorted(got["out"], key=lambda r: r["seq"])
    excluded = [r for r in out if r["klass"] == "keepall"]
    sampled = [r for r in out if r["klass"] == "normal"]
    assert len(excluded) == 4  # every excluded row passes through
    assert all(r["sample_rate"] is None for r in excluded)
    # 36 normal rows at rate 5 -> ranks 0,5,...,35 kept = 8 rows
    assert len(sampled) == 8
    assert all(r["sample_rate"] == 5 for r in sampled)


def test_streaming_log_to_metric_per_event(spark, stream_dir, tmp_path):
    """log_to_metric on a stream emits the literal reference shape:
    one incremental metric row per matching log event."""
    spec = {
        "sources": {"in": {"type": "file"}},
        "transforms": {
            "metrics": {
                "type": "log_to_metric",
                "inputs": ["in"],
                "metrics": [
                    {"kind": "counter", "name": "turns_total"},
                ],
                "tags": ["role"],
            },
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["metrics"]}},
    }
    got = run_pipeline_streaming(
        PipelineContext(spark), spec, {"in": _stream(spark, stream_dir)},
        out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ck"),
    )
    assert got["out"] == spark.read.parquet(stream_dir).count()


def test_streaming_aggregate_watermark(spark, tmp_path):
    """aggregate as a spec type, batch and stream: Incremental sums,
    Absolute last-wins; the stream finalizes windows via watermark (a
    straggler event advances the watermark past the asserted
    window)."""
    src_path = str(tmp_path / "in")
    base = 1_700_000_000
    rows = [
        # one incremental series and one absolute series in window 0
        ("hits", "incremental", 1.0, base + 10, 1),
        ("hits", "incremental", 2.0, base + 20, 2),
        ("temp", "absolute", 20.0, base + 30, 3),
        ("temp", "absolute", 21.5, base + 40, 4),
        # straggler an hour later: pushes the watermark past window 0
        ("hits", "incremental", 1.0, base + 7200, 5),
    ]
    spark.createDataFrame(
        rows, "name string, metric_kind string, value double, epoch long, _order long"
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch") \
        .coalesce(1).write.parquet(src_path)
    spec = {
        "sources": {"in": {"type": "file"}},
        "transforms": {
            "agg": {
                "type": "aggregate",
                "inputs": ["in"],
                "group_by": ["name"],
                "interval": "1 hour",
                "watermark": "1 minute",
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["agg"], "limit": 100}},
    }
    schema = spark.read.parquet(src_path).schema
    stream = spark.readStream.schema(schema).parquet(src_path)
    got = run_pipeline_streaming(
        PipelineContext(spark), spec, {"in": stream},
        out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ck"),
    )
    emitted = {r["name"]: r for r in got["out"]}
    assert emitted["hits"]["value"] == 3.0  # incremental adds
    assert emitted["temp"]["value"] == 21.5  # absolute last-wins
    # batch twin over the same spec agrees on the finalized window
    batch = run_pipeline(
        PipelineContext(spark),
        {**spec, "sinks": {"out": {"type": "memory", "inputs": ["agg"]}}},
        {"in": spark.read.parquet(src_path)},
    )
    w0 = {
        r["name"]: r
        for r in batch["out"].collect()
        if r["w"]["start"].timestamp() <= base + 10 < r["w"]["end"].timestamp()
    }
    assert w0["hits"]["value"] == 3.0 and w0["temp"]["value"] == 21.5
