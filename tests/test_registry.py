"""Registry contract: every queries() entry is oracle-gated.

Round-2 gap: 15 registered queries silently lacked a driver
correctness row. These tests make a registered-but-ungated query
impossible: every entry must have an oracle_sql() twin (or be
explicitly listed in ROWS_ONLY with a reason), and every oracle must
at least parse and bind in DuckDB against the real table schemas.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_every_query_is_oracle_gated():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    ungated = qs - oracles - entrymod.ROWS_ONLY
    assert not ungated, f"queries with no oracle and no ROWS_ONLY entry: {ungated}"
    # no stale oracle for a query that no longer exists
    assert not oracles - qs, f"oracles for unknown queries: {oracles - qs}"
    # ROWS_ONLY is an explicit exception list, not a dumping ground
    assert entrymod.ROWS_ONLY <= qs
    assert not entrymod.ROWS_ONLY & oracles


def test_oracles_bind_in_duckdb():
    """EXPLAIN every oracle over the real parquet schemas: catches
    dialect/typo/column drift without paying full execution."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, f"oracles failing to bind: {bad}"


@pytest.mark.parametrize("name", ["docs_minhash_lsh", "docs_simhash"])
def test_promoted_lsh_oracles_match(spark, name):
    """The round-3 promotions (deterministic LSH arithmetic) must be
    value-identical cross-engine at sf0.001."""
    import pandas as pd

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    ddf = con.sql(entrymod.oracle_sql()[name]).df()
    assert len(sdf) == len(ddf)

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].round(6)
            elif pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
        return df.sort_values(by=list(df.columns), ignore_index=True)

    pd.testing.assert_frame_equal(norm(sdf), norm(ddf), check_dtype=False)
