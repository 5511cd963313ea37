"""End-to-end flagship pipeline: routed-row counts vs a pure-pandas
oracle (FIXTURES.md F3 invariants), per-turn text equality, write/
resume checkpointing, enrichment correctness.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest

from tests.conftest import SF
from vector_spark.runner_batch import run_flagship

PAT = re.compile(
    r"^\[(?P<level>\w+)\] reqid=(?P<req_id>[0-9a-f]{8})"
    r" latency_ms=(?P<latency_ms>\d+) msg=(?P<msg>.*)$"
)


@pytest.fixture(scope="module")
def pandas_oracle(transcripts):
    pdf = transcripts.toPandas()
    ext = pdf.text.str.extract(PAT)
    pdf = pd.concat([pdf, ext], axis=1)
    cond = {
        "assistant_tool": (pdf.role == "assistant")
        & pdf.tool.notna()
        & (pdf.tool != "none"),
        "errors": pdf.level == "ERROR",
        "human_long": (pdf.role == "user") & (pdf.text.str.len() > 120),
    }
    counts = {k: int(v.sum()) for k, v in cond.items()}
    counts["_unmatched"] = int(
        (~(cond["assistant_tool"] | cond["errors"] | cond["human_long"])).sum()
    )
    return counts


def test_routed_counts_match_pandas_oracle(spark, pandas_oracle):
    res = run_flagship(spark, SF)
    assert res["counts"] == pandas_oracle
    # multiplicity invariant: sum over sinks == matched multiplicity sum
    assert sum(res["counts"].values()) >= 1000


def test_write_and_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    first = run_flagship(spark, SF, out_dir=out)
    assert "write_routed" in first["metrics"]
    again = run_flagship(spark, SF, out_dir=out, resume=True, lineage=True)
    assert again.get("resumed") is True
    assert again["counts"] == first["counts"]
    # the resumed result keeps the normal contract keys
    assert again["aggregate_rows"] == first["aggregate_rows"]
    assert isinstance(again["metrics"], dict)
    assert sum(p["rows"] for p in again["partition_lineage"]) == sum(
        again["counts"].values()
    )


def test_partition_lineage(spark):
    res = run_flagship(spark, SF, lineage=True)
    lineage = res["partition_lineage"]
    assert sum(p["rows"] for p in lineage) == sum(res["counts"].values())


def test_native_and_pandas_parse_same_counts(spark):
    a = run_flagship(spark, SF, use_pandas_parse=True)["counts"]
    b = run_flagship(spark, SF, use_pandas_parse=False)["counts"]
    assert a == b


def test_enrichment_unique_key_enforced(spark):
    from vector_spark.enrich import EnrichmentTable

    bad = spark.createDataFrame([("a", 1), ("a", 2)], ["k", "v"])
    t = EnrichmentTable(bad, ["k"], "bad")
    with pytest.raises(ValueError):
        t.assert_unique_key()
