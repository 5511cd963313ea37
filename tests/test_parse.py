"""Parse stage: vectorized pandas-UDF regex vs pure-JVM regexp_extract
must agree exactly; malformed rows produce nulls + _parse_error
(the dropped-port analogue, reference src/transforms/remap.rs:92-105).
"""

from __future__ import annotations

import pandas as pd

from vector_spark.functions import (
    grok_to_regex,
    parse_grok,
    parse_transcripts,
    parse_transcripts_native,
)


def test_pandas_vs_native_parity(transcripts):
    cols = ["conv_id", "turn_idx", "level", "req_id", "latency_ms", "msg", "_parse_error"]
    a = (
        parse_transcripts(transcripts)
        .select(*cols)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    b = (
        parse_transcripts_native(transcripts)
        .select(*cols)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_malformed_rows_flagged(parsed):
    pdf = parsed.toPandas()
    bad = pdf[pdf._parse_error]
    assert len(bad) > 0
    assert bad.level.isna().all()
    assert bad.req_id.isna().all()
    assert bad.latency_ms.isna().all()
    good = pdf[~pdf._parse_error]
    assert good.level.isin(["INFO", "WARN", "ERROR", "DEBUG"]).all()
    assert good.req_id.str.fullmatch("[0-9a-f]{8}").all()
    assert (good.latency_ms >= 0).all()


def test_grok_compile():
    rx = grok_to_regex("%{LOGLEVEL:level} %{INT:code} %{GREEDYDATA:rest}")
    assert "(?P<level>" in rx and "(?P<code>" in rx and "(?P<rest>" in rx


def test_parse_grok_end_to_end(spark):
    df = spark.createDataFrame(
        [("INFO 200 all good",), ("WARN 500 uh oh",), ("garbage",)], ["text"]
    )
    out = parse_grok(
        df, "^%{LOGLEVEL:level} %{INT:code} %{GREEDYDATA:rest}$"
    ).toPandas()
    ok = out[~out._parse_error].sort_values("code")
    assert ok.level.tolist() == ["INFO", "WARN"]
    assert ok.rest.tolist() == ["all good", "uh oh"]
    assert out._parse_error.sum() == 1
