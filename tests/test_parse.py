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


def test_grok_library_all_patterns_compile_re2():
    """Every library pattern (incl. recursive composites) must compile
    under both Python re (driver validation) and Arrow RE2 (executor
    path) with named groups only."""
    import re as _re

    import pyarrow as pa
    import pyarrow.compute as pc

    from vector_spark.functions import GROK_PATTERNS, grok_to_regex_typed

    assert len(GROK_PATTERNS) >= 70
    for name in GROK_PATTERNS:
        rx, _ = grok_to_regex_typed("%%{%s:x}" % name)
        compiled = _re.compile(rx)
        assert compiled.groups == len(compiled.groupindex), name
        pc.extract_regex(pa.array([], type=pa.string()), rx)  # RE2 probe


def test_grok_composite_patterns_match():
    """Composite library patterns extract the classic fields from
    real-shaped log lines (grok crate vocabulary, parse_grok.rs)."""
    import re as _re

    from vector_spark.functions import grok_to_regex_typed

    rx, _ = grok_to_regex_typed("%{COMBINEDAPACHELOG}")
    m = _re.match(
        rx,
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
        '"http://ref.example/" "Mozilla/5.0 (X11)"',
    )
    assert m and m.group("clientip") == "127.0.0.1"
    assert m.group("verb") == "GET" and m.group("response") == "200"
    assert m.group("referrer") == '"http://ref.example/"'

    rx, _ = grok_to_regex_typed("%{SYSLOGBASE} %{GREEDYDATA:message}")
    m = _re.match(
        rx, "Oct 11 22:14:15 mymachine su[230]: 'su root' failed"
    )
    assert m and m.group("logsource") == "mymachine"
    assert m.group("program") == "su" and m.group("pid") == "230"

    rx, _ = grok_to_regex_typed("%{IP:ip}")
    assert _re.fullmatch(rx, "2001:db8::1")
    assert _re.fullmatch(rx, "192.168.0.1")
    assert not _re.fullmatch(rx, "999.1.1.1")


def test_grok_type_suffix_casts(spark):
    """%{NUMBER:x:int} / :float logstash type suffixes cast extracted
    columns (long/double) after RE2 extraction."""
    df = spark.createDataFrame([("a 42 3.5",), ("b 7 0.25",)], ["text"])
    out = parse_grok(
        df, r"^%{WORD:tag} %{NUMBER:n:int} %{NUMBER:f:float}$"
    )
    types = dict(out.dtypes)
    assert types["n"] == "bigint" and types["f"] == "double"
    pdf = out.orderBy("tag").toPandas()
    assert pdf.n.tolist() == [42, 7] and pdf.f.tolist() == [3.5, 0.25]


def test_grok_alias_sanitization():
    """Dotted/bracketed aliases (logstash field paths) map to legal
    RE2 group names."""
    from vector_spark.functions import grok_to_regex_typed

    rx, _ = grok_to_regex_typed("%{INT:response.time} %{INT:[@meta][x]}")
    assert "(?P<response_time>" in rx and "(?P<meta_x>" in rx


def test_uncapture_bare_groups():
    """Bare capture groups become non-capturing; named groups,
    escaped parens, and char-class parens are untouched."""
    from vector_spark.functions import _uncapture, grok_to_regex

    assert _uncapture(r"(a|b)") == r"(?:a|b)"
    assert _uncapture(r"(?P<x>a)(b)") == r"(?P<x>a)(?:b)"
    assert _uncapture(r"\(literal\)") == r"\(literal\)"
    assert _uncapture(r"[()]+(x)") == r"[()]+(?:x)"
    assert _uncapture(r"(?:already)") == r"(?:already)"
    # alternation grok: the whole pattern must compile RE2-clean with
    # only named groups
    import re as _re

    rx = grok_to_regex("(%{TIMESTAMP_ISO8601:ts}|%{LOGLEVEL:level})")
    compiled = _re.compile(rx)
    assert compiled.groups == len(compiled.groupindex)
