"""pipelines-macro expansion + scripted (lua-analogue) transform."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from vector_spark.pipeline import PipelineContext, expand_macros, run_pipeline


def test_expand_macros_shapes():
    spec = {
        "sources": {"s": {}},
        "transforms": {
            "p": {
                "type": "pipeline",
                "inputs": ["s"],
                "filter": "role = 'user'",
                "stages": [
                    {"name": "clean", "type": "remap",
                     "assignments": {"t2": "upper(text)"}},
                    {"name": "keep", "type": "filter",
                     "condition": "turn_idx >= 0"},
                ],
            },
            "after": {"type": "filter", "inputs": ["p"], "condition": "1=1"},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["p"]}},
    }
    flat = expand_macros(spec)
    t = flat["transforms"]
    assert set(t) == {"p_filter", "p_clean", "p_keep", "after"}
    assert t["p_filter"]["inputs"] == ["s"]
    assert t["p_clean"]["inputs"] == ["p_filter"]
    assert t["p_keep"]["inputs"] == ["p_clean"]
    # consumers of the macro rewire to its last stage
    assert t["after"]["inputs"] == ["p_keep"]
    assert flat["sinks"]["out"]["inputs"] == ["p_keep"]


def test_pipeline_macro_end_to_end(spark, transcripts):
    spec = {
        "sources": {"t": {}},
        "transforms": {
            "users_only": {
                "type": "pipeline",
                "inputs": ["t"],
                "filter": "role = 'user'",
                "stages": [
                    {"name": "up", "type": "remap",
                     "assignments": {"loud": "upper(text)"}},
                ],
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["users_only"]}},
    }
    res = run_pipeline(PipelineContext(spark), spec, {"t": transcripts.limit(100)})
    rows = res["out"].collect()
    assert rows and all(r["role"] == "user" for r in rows)
    assert all(r["loud"] == r["text"].upper() for r in rows)


def test_scripted_transform(spark, transcripts):
    from vector_spark.operators.script import scripted_transform

    def proc(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[pdf["turn_idx"] % 2 == 0].copy()
        out["text"] = out["text"].str[:10]
        return out

    small = transcripts.limit(50)
    out = scripted_transform(small, proc)
    rows = out.collect()
    assert all(r["turn_idx"] % 2 == 0 for r in rows)
    assert all(len(r["text"]) <= 10 for r in rows)


def test_scripted_transform_with_state(spark, transcripts):
    from vector_spark.operators.script import scripted_transform

    def init():
        return {"seen": 0}

    def proc(pdf: pd.DataFrame, state: dict) -> pd.DataFrame:
        state["seen"] += len(pdf)
        return pdf.assign(batch_offset=state["seen"])

    schema = transcripts.limit(1).withColumn(
        "batch_offset", F.lit(0).cast("long")
    ).schema
    out = scripted_transform(transcripts.limit(20), proc, schema=schema, init=init)
    assert out.count() == 20


def test_stamp_metadata(spark, transcripts):
    from vector_spark.enrich import stamp_metadata

    meta = {"region": "us-east-1", "instance_id": "i-123", "ami_id": "ami-9"}
    out = stamp_metadata(transcripts.limit(5), meta, fields=["region", "instance_id"])
    rows = out.collect()
    assert all(r["region"] == "us-east-1" and r["instance_id"] == "i-123" for r in rows)
    assert "ami_id" not in out.columns
