"""Deployment-shape evidence: the flagship job submitted via
``spark-submit --py-files vector_spark.zip`` (the BASELINE.json
cluster form) from a directory that does NOT contain the package —
imports must resolve through the shipped zip, and the per-sink
routed-row counts must match an independent DuckDB oracle.

Runs its own JVM, so it is sequential-by-construction with the
session-scoped fixture: no `spark` fixture is requested here.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _spark_submit() -> str:
    import pyspark

    path = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not os.path.exists(path):
        pytest.skip("pyspark's spark-submit launcher not present")
    return path


def _oracle_counts() -> dict[str, int]:
    """Per-sink routed-row counts straight from DuckDB — no Spark."""
    sys.path.insert(0, REPO)
    from __spark_entry__ import PARSED_CTE, ROUTE_CONDS_SQL, _UNMATCHED_SQL
    from vector_spark.transcripts import TRANSCRIPTS_DUCKDB_CTE

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    conds = dict(ROUTE_CONDS_SQL, _unmatched=_UNMATCHED_SQL)
    sums = ", ".join(
        f'sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS "{name}"'
        for name, cond in conds.items()
    )
    row = con.sql(
        f"WITH transcripts AS ({TRANSCRIPTS_DUCKDB_CTE}), "
        f"parsed AS ({PARSED_CTE}) SELECT {sums} FROM parsed"
    ).fetchone()
    return {name: int(v) for name, v in zip(conds, row)}


def test_spark_submit_pyfiles_deployment(tmp_path):
    # package zip exactly as the jobs/run_flagship.py docstring says
    zip_path = tmp_path / "vector_spark.zip"
    pkg = os.path.join(REPO, "vector_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith((".pyc", ".pyo")) or "__pycache__" in root:
                    continue
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, REPO))

    # the job script runs from tmp_path: its parent dir has NO
    # vector_spark/ checkout, so only --py-files can satisfy imports
    job = tmp_path / "run_flagship.py"
    shutil.copy(os.path.join(REPO, "jobs", "run_flagship.py"), job)

    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # nothing preinstalled points at the repo
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(job),
            "--sf-dir", SF,
            "--master", "inherit",  # job arg: let spark-submit's win
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert json_lines, proc.stdout[-2000:]
    result = json.loads(json_lines[-1])
    assert result["counts"] == _oracle_counts()
