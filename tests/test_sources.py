"""Source codec tests: framing + deserializers, demo_logs parse
roundtrips (full value-level roundtrips are oracle-checked via
apache_parse / syslog_parse in tools/check_oracles.py)."""

from __future__ import annotations

from pyspark.sql import types as T

from tests.conftest import SF
from vector_spark.sources import (
    demo_logs_batch,
    parse_common_log,
    parse_syslog,
    read_jsonl,
    read_lines,
    read_logfmt,
)


def test_read_lines(spark, tmp_path):
    p = tmp_path / "lines.log"
    p.write_text("alpha\nbravo\ncharlie\n")
    df = read_lines(spark, str(p))
    assert [r["line"] for r in df.collect()] == ["alpha", "bravo", "charlie"]


def test_read_jsonl(spark, tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n{"a": 3}\n')
    schema = T.StructType([
        T.StructField("a", T.LongType()), T.StructField("b", T.StringType()),
    ])
    rows = read_jsonl(spark, str(p), schema).orderBy("a").collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, "x"), (2, "y"), (3, None)]


def test_read_logfmt(spark, tmp_path):
    p = tmp_path / "app.logfmt"
    p.write_text("level=info msg=started port=8080\nlevel=error msg=boom\n")
    rows = read_logfmt(spark, str(p)).collect()
    assert rows[0]["fields"]["level"] == "info"
    assert rows[0]["fields"]["port"] == "8080"
    assert rows[1]["fields"]["msg"] == "boom"


def test_demo_logs_parse_clean(spark):
    """Every generated line parses without error for all formats."""
    ap = parse_common_log(demo_logs_batch(spark, SF, "apache_common"))
    assert ap.filter("_parse_error").count() == 0
    sl = parse_syslog(demo_logs_batch(spark, SF, "syslog"))
    assert sl.filter("_parse_error").count() == 0
    js = demo_logs_batch(spark, SF, "json")
    assert js.filter("line NOT LIKE '{%'").count() == 0


def test_syslog_priority_decomposition(spark):
    rows = (
        parse_syslog(demo_logs_batch(spark, SF, "syslog"))
        .select("facility", "severity")
        .distinct()
        .collect()
    )
    # pri = 8 + event_id%16 in [8, 23] -> facility 1-2, severity 0-7
    assert all(r["facility"] in (1, 2) for r in rows)
    assert all(0 <= r["severity"] <= 7 for r in rows)


def test_decode_gelf_strict(spark):
    """gelf.rs strictness: version must be 1.1, host/short_message
    required, _id dropped, invalid additional names flag the row."""
    from vector_spark.sources import decode_gelf

    lines = [
        # valid, with additional fields and an _id to drop
        '{"version":"1.1","host":"h1","short_message":"ok",'
        '"timestamp":1600000000.5,"level":3,"_app":"web","_id":"x"}',
        # wrong version
        '{"version":"1.0","host":"h1","short_message":"old"}',
        # missing host
        '{"version":"1.1","short_message":"nohost"}',
        # invalid additional name (space)
        '{"version":"1.1","host":"h1","short_message":"bad",'
        '"_bad name":"x"}',
        # not json
        'not json at all',
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    out = decode_gelf(df).collect()
    assert [r["_decode_error"] for r in out] == [
        False, True, True, True, True,
    ]
    ok = out[0]
    assert ok["message"] == "ok" and ok["host"] == "h1"
    assert ok["additional"] == {"_app": "web"}  # _id filtered
    assert ok["level"] == 3
    assert ok["timestamp"].microsecond == 500000


def test_frame_character_delimited(spark):
    from vector_spark.sources import frame_character_delimited

    df = spark.createDataFrame([("a;bb;ccc;",), ("x;y",)], "content string")
    got = [r.frame for r in frame_character_delimited(df, ";").collect()]
    assert got == ["a", "bb", "ccc", "x", "y"]
    # max_length DISCARDS oversized frames entirely
    # (character_delimited.rs: "Any frames longer than max_length
    # bytes will be discarded entirely")
    got2 = [r.frame for r in frame_character_delimited(df, ";", max_length=2).collect()]
    assert got2 == ["a", "bb", "x", "y"]


def test_frame_octet_counting(spark):
    from vector_spark.sources import frame_octet_counting

    # RFC6587: "<len> <data>" repeated; non-conforming falls back to
    # newline; incomplete tail dropped
    df = spark.createDataFrame(
        [("5 hello5 world",), ("plain line\n3 foo99 short",)],
        "content string",
    )
    got = [r.frame for r in frame_octet_counting(df).collect()]
    assert got == ["hello", "world", "plain line", "foo"]


def test_frame_length_delimited(spark):
    import struct
    from vector_spark.sources import frame_length_delimited

    # framing/length_delimited.rs decode_frame test vector:
    # \x00\x00\x00\x0bhello world -> "hello world"; trailing junk ignored
    buf = struct.pack(">I", 11) + b"hello world" + struct.pack(">I", 3) + b"abc" + b"\x00\x00"
    df = spark.createDataFrame([(bytearray(buf),)], "content binary")
    got = [bytes(r.frame) for r in frame_length_delimited(df).collect()]
    assert got == [b"hello world", b"abc"]


def test_host_metrics_source(spark):
    from vector_spark.sources import host_metrics_source

    m = host_metrics_source(spark)
    rows = m.collect()
    names = {r.name for r in rows}
    assert {"cpu_seconds_total", "memory_total_bytes", "load1",
            "network_receive_bytes_total"} <= names
    cpu = [r for r in rows if r.name == "cpu_seconds_total"]
    assert {r.tags["mode"] for r in cpu} == {"user", "nice", "system", "idle"}
    assert all(r.metric_kind == "incremental" for r in cpu)
    mem = next(r for r in rows if r.name == "memory_total_bytes")
    assert mem.value > 1e9 and mem.metric_kind == "absolute"
    # feeds the exposition encoder end-to-end
    from vector_spark.codecs import encode_prometheus
    assert encode_prometheus(m).count() == len(rows)


def test_internal_logs_source(spark):
    import logging
    from vector_spark.sources import internal_logs_source

    handler, snapshot = internal_logs_source(spark)
    log = logging.getLogger("vector_spark.test_internal")
    log.setLevel(logging.INFO)
    log.addHandler(handler)
    try:
        log.info("pipeline started")
        log.warning("slow stage %s", "parse")
    finally:
        log.removeHandler(handler)
    df = snapshot()
    rows = {r.message: r for r in df.collect()}
    assert "pipeline started" in rows and rows["slow stage parse"].level == "WARNING"


def test_frame_octet_counting_counts_bytes_not_chars(spark):
    from vector_spark.sources import frame_octet_counting

    # 'héllo' = 5 chars but 6 UTF-8 octets: the RFC6587 prefix counts
    # OCTETS, so a char-sliced cursor would grab 'héllo4' and garble
    # every later frame
    buf = "6 héllo5 world"
    df = spark.createDataFrame([(buf,)], "content string")
    frames = [
        r.frame for r in frame_octet_counting(df).select("frame").collect()
    ]
    assert frames == ["héllo", "world"]


def test_multiline_leading_orphan_is_own_event(spark):
    from vector_spark.sources import assemble_multiline_lines

    df = spark.createDataFrame(
        [("f", 0, "cont"), ("f", 1, "START a"), ("f", 2, "x")],
        "file string, line_no int, line string",
    )
    out = sorted(
        assemble_multiline_lines(
            df, r"^START", mode="halt_before",
            file_col="file", line_no_col="line_no", line_col="line",
        ).collect(),
        key=lambda r: r.first_line,
    )
    # the pre-marker orphan is its OWN event, not merged into the
    # first marked one; ids stay dense from 0
    assert [(r.event_idx, r.event) for r in out] == [
        (0, "cont"), (1, "START a\nx"),
    ]
    # no-orphan file still starts at 0
    df2 = spark.createDataFrame(
        [("g", 0, "START a"), ("g", 1, "x")],
        "file string, line_no int, line string",
    )
    out2 = assemble_multiline_lines(
        df2, r"^START", mode="halt_before",
        file_col="file", line_no_col="line_no", line_col="line",
    ).collect()
    assert [(r.event_idx, r.event) for r in out2] == [(0, "START a\nx")]


def test_exec_source_stamps_pid(spark):
    from vector_spark.sources import exec_source

    rows = exec_source(
        spark, ["sh", "-c", "echo out1; echo err1 >&2"],
        include_stderr=True,
    ).collect()
    assert {r.stream for r in rows} == {"stdout", "stderr"}
    assert all(r.pid is not None and r.pid > 0 for r in rows)
