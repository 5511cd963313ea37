"""Case-insensitive + wildcard enrichment (round 3).

Reference: lib/enrichment/src/lib.rs:32-35 (Case), index build with
case option at src/enrichment_tables/file.rs:190-194; wildcard
conditions extend the Equals/BetweenDates set in later public Vector
releases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.enrich import EnrichmentTable


def _dim(spark):
    return spark.createDataFrame(
        [("Search", "retrieval"), ("PYTHON", "compute")],
        "tool string, family string",
    )


def test_case_insensitive_lookup(spark):
    dim = EnrichmentTable(_dim(spark), ["tool"], case_sensitive=False)
    facts = spark.createDataFrame(
        [("sEaRcH",), ("python",), ("browser",)], "tool string"
    )
    rows = {r.tool: r.family for r in dim.lookup(facts).collect()}
    # fact key keeps ITS case; dim attributes returned as stored
    assert rows == {"sEaRcH": "retrieval", "python": "compute", "browser": None}


def test_case_sensitive_lookup_misses(spark):
    dim = EnrichmentTable(_dim(spark), ["tool"], case_sensitive=True)
    facts = spark.createDataFrame([("search",), ("Search",)], "tool string")
    rows = {r.tool: r.family for r in dim.lookup(facts).collect()}
    assert rows == {"search": None, "Search": "retrieval"}


def test_unique_key_respects_case_mode(spark):
    df = spark.createDataFrame([("A", 1), ("a", 2)], "k string, v int")
    EnrichmentTable(df, ["k"], case_sensitive=True).assert_unique_key()
    with pytest.raises(ValueError, match="duplicate keys"):
        EnrichmentTable(df, ["k"], case_sensitive=False).assert_unique_key()


def test_wildcard_lookup(spark):
    pat = spark.createDataFrame(
        [("err*", "error-ish"), ("*out", "timeouts"), ("w?rn", "warn")],
        "pattern string, label string",
    )
    dim = EnrichmentTable(pat, key=[], name="pats")
    facts = spark.createDataFrame(
        [("error",), ("timeout",), ("warn",), ("ok",), ("w%rn",)],
        "msg string",
    )
    got = {
        (r.msg, r.label)
        for r in dim.lookup_wildcard(facts, "msg", "pattern").collect()
    }
    assert got == {
        ("error", "error-ish"),
        ("timeout", "timeouts"),
        ("warn", "warn"),
        ("w%rn", "warn"),  # ? matches any one char, including %
        ("ok", None),
    }


def test_wildcard_literal_percent_escaped(spark):
    """A literal % in the glob pattern must NOT act as a LIKE
    wildcard after translation."""
    pat = spark.createDataFrame([("100%*", "pct")], "pattern string, label string")
    dim = EnrichmentTable(pat, key=[], name="pats")
    facts = spark.createDataFrame(
        [("100% done",), ("1000 done",)], "msg string"
    )
    got = {
        (r.msg, r.label)
        for r in dim.lookup_wildcard(facts, "msg", "pattern").collect()
    }
    assert got == {("100% done", "pct"), ("1000 done", None)}


def test_wildcard_case_insensitive(spark):
    pat = spark.createDataFrame([("ERR*", "e")], "pattern string, label string")
    dim = EnrichmentTable(pat, key=[], case_sensitive=False)
    facts = spark.createDataFrame([("error",)], "msg string")
    assert dim.lookup_wildcard(facts, "msg", "pattern").collect()[0].label == "e"


def test_values_df_backslash_and_between_case_fold(spark):
    import datetime

    from vector_spark.enrich import EnrichmentTable, _values_df
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("path", T.StringType()),
    ])
    dim = _values_df(spark, [("a", r"C:\temp"), ("b", "x\\ny")], schema)
    rows = {r.k: r.path for r in dim.collect()}
    # backslashes survive the VALUES literal (no \t -> TAB mangling)
    assert rows["a"] == r"C:\temp" and rows["b"] == "x\\ny"

    t0 = datetime.datetime(2024, 1, 1)
    dim2 = spark.createDataFrame(
        [("WEB01", t0, t0 + datetime.timedelta(days=1), "dc1")],
        "host string, frm timestamp, thru timestamp, dc string",
    )
    table = EnrichmentTable(dim2, ["host"], "t", case_sensitive=False)
    facts = spark.createDataFrame(
        [("web01", t0 + datetime.timedelta(hours=1))],
        "host string, ts timestamp",
    )
    out = table.lookup_between(facts, "ts", "frm", "thru").collect()[0]
    assert out.dc == "dc1"  # case-insensitive key honored in range path
