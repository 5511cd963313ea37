"""Driver-style oracle checker: run each queries() entry on Spark and
its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]

Set CHECK_ORACLES_JSON=<path> to also write a driver-style
per-query result file ({name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}) — the in-repo full-sweep artifact
(CORRECTNESS_FULL_r{N}.json).
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from vector_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        results[name] = rec
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec["err"] = f"spark: {e}"
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
            rec["oracle_rows"] = len(ddf)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec["err"] = f"duckdb: {e}"
            print(f"FAIL {name}: duckdb error {e}")
            continue
        a, b = normalize(sdf), normalize(ddf)
        rec["schema_match"] = list(a.columns) == list(b.columns)
        rec["rows_match"] = len(a) == len(b)
        if not rec["schema_match"]:
            failures.append(name)
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if not rec["rows_match"]:
            failures.append(name)
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            rec["hash_match"] = True
            print(f"OK   {name}: {len(a)} rows")
        except AssertionError as e:
            rec["hash_match"] = False
            failures.append(name)
            msg = str(e).splitlines()
            print(f"FAIL {name}: values differ: " + " | ".join(msg[:6]))
    print(f"\n{len(failures)} failures: {failures}")
    import json as _json
    import os as _os

    out = _os.environ.get("CHECK_ORACLES_JSON")
    if out:
        with open(out, "w") as f:
            _json.dump(results, f, indent=2)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
