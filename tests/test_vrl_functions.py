"""VRL stdlib surface tests — one assertion per mapped function
family, mirroring the reference's golden-file corpus style
(lib/vrl/tests/tests/: '# object:' input -> '# result:' expected)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark import vrl


@pytest.fixture(scope="module")
def row(spark):
    def run(col):
        return spark.range(1).select(col.alias("v")).collect()[0]["v"]

    return run


def test_string_functions(row):
    assert row(vrl.truncate(F.lit("hello world"), 5)) == "hello"
    assert row(vrl.truncate(F.lit("hello world"), 5, suffix=True)) == "hello..."
    assert row(vrl.slice_(F.lit("abcdef"), 1, 4)) == "bcd"
    assert row(vrl.find(F.lit("abcdef"), "cd")) == 2
    assert row(vrl.find(F.lit("abcdef"), "zz")) == -1
    assert row(vrl.match_(F.lit("error 42"), r"\d+"))
    assert row(vrl.match_any(F.lit("warn"), ["^err", "^warn"]))
    assert row(vrl.replace(F.lit("a-b-c"), "-", "+")) == "a+b+c"
    assert row(vrl.join(F.array(F.lit("a"), F.lit("b")), ",")) == "a,b"
    assert row(vrl.strlen(F.lit("héllo"))) == 5


def test_codec_functions(row):
    assert row(vrl.encode_base64(F.lit("hi"))) == "aGk="
    assert row(vrl.decode_base64(F.lit("aGk="))) == "hi"
    assert row(vrl.encode_percent(F.lit("a b&c"))) == "a%20b%26c"
    assert row(vrl.decode_percent(F.lit("a%20b%26c"))) == "a b&c"
    assert row(vrl.md5_(F.lit("abc"))) == "900150983cd24fb0d6963f7d28e17f72"
    # reference default variant is SHA3-512 (sha3.rs compile())
    assert row(vrl.sha3_(F.lit("abc"), "SHA3-256")) == (
        "3a985da74fe225b2045c172d6bd390bd855f086e3e9d525b46bfe24511431532"
    )
    logfmt = vrl.encode_logfmt(
        F.create_map(F.lit("b"), F.lit("2"), F.lit("a"), F.lit("1"))
    )
    assert row(logfmt) == "a=1 b=2"


def test_coercion_functions(row):
    assert row(vrl.to_bool(F.lit("yes"))) is True
    assert row(vrl.to_bool(F.lit("0"))) is False
    assert row(vrl.to_bool(F.lit("maybe"))) is None
    assert row(vrl.parse_int(F.lit("ff"), base=16)) == 255
    assert row(vrl.format_int(F.lit(255), base=16)) == "ff"


def test_parse_duration(row):
    from vector_spark.functions import parse_duration_ms

    assert row(parse_duration_ms(F.lit("250ms"))) == 250.0
    assert row(parse_duration_ms(F.lit("3s"))) == 3000.0
    assert row(parse_duration_ms(F.lit("2m"))) == 120000.0


def test_encode_json_contract(row):
    # pin the serde contract: NULL serializes to the literal string
    # 'null' (encode_json.rs: serde_json::to_string(Value::Null)),
    # NOT SQL-NULL pass-through — a deliberate divergence from the
    # pre-r4 behavior, matching the reference
    assert row(vrl.encode_json(F.lit(None))) == "null"
    assert row(vrl.encode_json(F.lit("a\"b"))) == '"a\\"b"'
    assert row(vrl.encode_json(F.lit(True))) == "true"
    assert row(vrl.encode_json(F.lit(1.5))) == "1.5"


def test_collection_functions(row):
    arr = F.array(F.lit("a"), F.lit(None).cast("string"), F.lit(""), F.lit("b"))
    assert row(vrl.compact(arr)) == ["a", "b"]
    assert row(vrl.unique(F.array(F.lit(1), F.lit(1), F.lit(2)))) == [1, 2]
    t = row(vrl.tally(F.array(F.lit("x"), F.lit("y"), F.lit("x"))))
    assert t == {"x": 2, "y": 1}
    assert row(vrl.tally_value(F.array(F.lit("x"), F.lit("y"), F.lit("x")), F.lit("x"))) == 2
    merged = vrl.merge(
        F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)),
        F.create_map(F.lit("b"), F.lit(9)),
    )
    assert row(merged) == {"a": 1, "b": 9}


def test_net_functions(row):
    assert row(vrl.ip_aton(F.lit("10.0.0.1"))) == 167772161
    assert row(vrl.ip_ntoa(F.lit(167772161))) == "10.0.0.1"
    assert row(vrl.ip_cidr_contains("10.0.0.0/8", F.lit("10.1.2.3")))
    assert not row(vrl.ip_cidr_contains("10.0.0.0/8", F.lit("11.1.2.3")))
    assert row(vrl.parse_url(F.lit("https://x.io/p?q=1"), "HOST")) == "x.io"
    assert row(vrl.parse_query_string(F.lit("a=1&b=2"))) == {"a": "1", "b": "2"}


def test_registry_coverage():
    # every registry entry is callable; surface count tracks SURVEY §2.4
    assert len(vrl.FUNCTIONS) >= 60
    assert all(callable(f) for f in vrl.FUNCTIONS.values())


def test_metric_to_log_roundtrip(spark):
    from vector_spark.operators.metric_to_log import metric_to_log

    df = spark.createDataFrame(
        [("req_total", "counter", 3.0, {"host": "h1"}, "2024-01-01 00:00:00"),
         ("mem", "gauge", 0.5, {"host": "h2"}, "2024-01-01 00:00:01")],
        "name string, kind string, value double, tags map<string,string>, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = metric_to_log(df, host_tag="host").collect()
    assert [r["host"] for r in out] == ["h1", "h2"]
    import json

    m0 = json.loads(out[0]["message"])
    assert m0["name"] == "req_total" and m0["counter"] == {"value": 3.0}
    assert "gauge" not in m0
    m1 = json.loads(out[1]["message"])
    assert m1["gauge"] == {"value": 0.5} and "counter" not in m1


def test_ip_prefix_enrich(spark):
    from vector_spark.enrich import ip_prefix_enrich

    facts = spark.createDataFrame(
        [("10.3.7.9",), ("10.200.0.1",)], "ip string"
    )
    dim = spark.sql(
        "SELECT 10 * 16777216 + id * 65536 AS prefix_int, "
        "concat('region-', id) AS region FROM range(8)"
    )
    out = {r["ip"]: r["region"]
           for r in ip_prefix_enrich(facts, dim, "ip", 16).collect()}
    assert out == {"10.3.7.9": "region-3", "10.200.0.1": None}
