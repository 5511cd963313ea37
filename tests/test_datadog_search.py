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
