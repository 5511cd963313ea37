"""TableCatalog: parquet fallback roundtrip + Iceberg gating."""

from __future__ import annotations

import pytest

from vector_spark.catalog import TableCatalog, iceberg_available


def test_parquet_roundtrip(spark, transcripts, tmp_path):
    cat = TableCatalog(spark, warehouse=str(tmp_path))
    small = transcripts.limit(100)
    cat.write(small, "t1", partition_by=["role"])
    assert cat.exists("t1")
    assert not cat.exists("nope")
    back = cat.read("t1")
    assert back.count() == 100
    assert set(back.columns) == set(small.columns)


def test_iceberg_gated(spark, tmp_path):
    # sandbox has no Iceberg jar: requesting it must fail loudly, not
    # silently fall back
    if iceberg_available(spark):
        pytest.skip("Iceberg present; gating not applicable")
    with pytest.raises(RuntimeError, match="Iceberg"):
        TableCatalog(spark, iceberg_catalog="ice")


def test_exactly_one_backend(spark, tmp_path):
    with pytest.raises(ValueError):
        TableCatalog(spark)
    with pytest.raises(ValueError):
        TableCatalog(spark, warehouse=str(tmp_path), iceberg_catalog="x")
