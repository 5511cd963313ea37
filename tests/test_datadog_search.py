"""datadog_search condition golden tests: the reference's own
(query, pass_event, fail_event) triples
(src/conditions/datadog_search.rs get_checks(), harvested by
tools/harvest_datadog_checks.py) run against the Column compiler.

Each event gets its own exact schema (built from the JSON value, the
way the reference's LogEvent carries its own value tree) so
missing-attribute and per-type matching semantics are exercised
faithfully.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_spark.datadog_search import datadog_search

FIXTURES = os.path.join(
    os.path.dirname(__file__), "fixtures", "datadog_checks.json"
)
CHECKS = json.load(open(FIXTURES))


def _dtype(v) -> T.DataType:
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, list):
        inner = _dtype(v[0]) if v else T.StringType()
        return T.ArrayType(inner)
    if isinstance(v, dict):
        return T.StructType(
            [T.StructField(k, _dtype(x)) for k, x in v.items()]
        )
    return T.StringType()


def _df_for(spark, event: dict):
    schema = _dtype(event or {"_empty": "x"})
    data = event or {"_empty": "x"}
    return spark.createDataFrame([data], schema)


@pytest.mark.parametrize(
    "idx",
    range(len(CHECKS)),
    ids=[f"{i}_{c['source'][:40]}" for i, c in enumerate(CHECKS)],
)
def test_datadog_check(spark, idx):
    check = CHECKS[idx]
    for kind, want in (("pass", 1), ("fail", 0)):
        df = _df_for(spark, check[kind])
        cond = F.coalesce(
            datadog_search(check["source"], df.schema), F.lit(False)
        )
        n = df.filter(cond).count()
        assert n == want, (
            f"{check['source']!r} {kind} event {check[kind]!r}: "
            f"matched={n}, expected={want}"
        )


def test_datadog_checks_no_silent_shrink():
    assert len(CHECKS) >= 120, f"fixture shrank to {len(CHECKS)}"


def test_multiterm_keyword_word_boundary():
    from vector_spark.datadog_search import parse_query

    # 'ORbit' is a term, not the OR conjunction
    q = parse_query("foo ORbit")
    assert q.kind == "term" and q.value == "foo ORbit"
    assert parse_query("foo OR bar").kind == "or"


def test_comparison_negative_and_quoted_values():
    from vector_spark.datadog_search import parse_query

    q = parse_query("lat:>-1.5")
    assert q.kind == "compare" and q.value == -1.5
    q2 = parse_query('lat:>="-2"')
    assert q2.kind == "compare" and q2.value == -2


def test_bare_term_no_schema_compiles(spark):
    from vector_spark.datadog_search import datadog_search

    df = spark.createDataFrame(
        [("error here",), ("fine",)], "message string"
    )
    # no schema argument: the '_default_' pseudo-field must be
    # skipped, not emitted as a real column reference
    out = df.filter(datadog_search("error", schema=df.schema)).collect()
    assert len(out) == 1
