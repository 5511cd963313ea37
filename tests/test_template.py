"""Template rendering (src/template.rs): {{ field }} interpolation +
strftime specs as one Catalyst expression, and its two consumers —
KeyPartitioner-style file-sink paths and templated metric names."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_spark.template import (
    TemplateError,
    render_template,
    template_fields,
)


def _df(spark):
    return spark.createDataFrame(
        [
            ("web", "a1", dt.datetime(2024, 3, 5, 14, 30, 9)),
            ("api", "b2", dt.datetime(2024, 12, 31, 23, 59, 59)),
        ],
        "app string, id string, ts timestamp",
    )


def test_template_fields():
    assert template_fields("x-{{ app }}-{{id}}-%Y") == ["app", "id"]


def test_render_fields_and_strftime(spark):
    out = _df(spark).select(
        render_template("logs-{{ app }}/%Y-%m-%d/{{ id }}.log").alias("k")
    ).collect()
    assert {r["k"] for r in out} == {
        "logs-web/2024-03-05/a1.log",
        "logs-api/2024-12-31/b2.log",
    }


def test_render_epoch_and_literals(spark):
    out = _df(spark).select(
        render_template("t=%s app={{ app }}").alias("k")
    ).collect()
    ks = {r["k"] for r in out}
    assert "t=1709649009 app=web" in ks  # 2024-03-05T14:30:09Z


def test_render_quoted_literal_text(spark):
    # 'T' and 'at' are pattern letters in Java formats — must be
    # quoted by the converter, not interpreted
    out = _df(spark).select(
        render_template("at %YT%H").alias("k")
    ).collect()
    assert "at 2024T14" in {r["k"] for r in out}


def test_unsupported_spec_raises():
    with pytest.raises(TemplateError):
        render_template("%Q")


def test_file_sink_key_template(spark, tmp_path):
    from vector_spark.pipeline import PipelineContext, run_pipeline

    spec = {
        "sources": {"logs": {"type": "parquet"}},
        "sinks": {
            "out": {
                "type": "file",
                "inputs": ["logs"],
                "path": str(tmp_path / "out"),
                "encoding": {"codec": "text", "field": "id"},
                "key_template": "{{ app }}-%Y-%m",
            },
        },
    }
    res = run_pipeline(
        PipelineContext(spark), spec, {"logs": _df(spark)}
    )
    assert res["out"]["rows"] == 2
    back = spark.read.text(str(tmp_path / "out")).collect()
    assert {r["value"] for r in back} == {"a1", "b2"}
    import os

    dirs = {
        d for d in os.listdir(tmp_path / "out") if d.startswith("_key=")
    }
    assert dirs == {"_key=web-2024-03", "_key=api-2024-12"}


def test_templated_metric_name(spark):
    from vector_spark.operators.log_to_metric import (
        MetricSpec,
        explode_metrics,
    )

    df = _df(spark)
    out = explode_metrics(
        df,
        [MetricSpec(kind="counter", name="requests_{{ app }}")],
        tags=["id"],
    ).collect()
    assert {r["name"] for r in out} == {"requests_web", "requests_api"}


def test_escaped_percent_before_s(spark):
    import datetime

    from vector_spark.template import render_template

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 0),)], "ts timestamp"
    )
    # '%%s' is the literal text '%s' (strftime eats %% first), NOT an
    # escaped '%' followed by epoch seconds
    got = df.select(render_template("a%%sb", "ts").alias("v")).collect()[0].v
    assert got == "a%sb"
    # a real %s still splices epoch seconds
    got2 = df.select(render_template("t=%s", "ts").alias("v")).collect()[0].v
    assert got2 == "t=1704067200"
