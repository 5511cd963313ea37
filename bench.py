"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the wall-clock seconds of the flagship end-to-end pipeline
(parse -> enrich -> route -> hourly aggregate, including the fan-out
partitioned sink write); `queries` carries per-query seconds for the
headline set. Extra keys (`turns`, `turns_per_sec`) quantify the
BASELINE.json metric "turns/sec end-to-end".

Modes:
  python bench.py                 # full headline run, one JSON line
  python bench.py --flagship-only # flagship timing only (scaling runs)
  python bench.py --scaling       # local[8] vs local[32] subprocesses,
                                  # reports throughput + efficiency
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline subset of __spark_entry__.queries(): every pipeline stage,
# the heavier dataops, and two TPC-H-shaped aggregates
HEADLINE = [
    "parse",
    "enrich",
    "route_counts",
    "aggregate_hourly",
    "reduce_conversations",
    "log_to_metric_hourly",
    "events_sessionize",
    "events_tumbling",
    "q1_pricing",
    "q3_revenue",
    "docs_text_stats",
    "docs_minhash_lsh",
    "ann_topk",
]


def _sf_label(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return base


def _materialize(df) -> None:
    """Force full computation of every column without disk I/O."""
    df.write.format("noop").mode("overwrite").save()


def run_flagship_bench(spark) -> dict:
    """Flagship end-to-end incl. the partitioned fan-out write."""
    from pyspark.sql import functions as F

    from vector_spark.runner_batch import build_flagship, flagship_aggregate

    out_dir = tempfile.mkdtemp(prefix="vector_spark_bench_")
    try:
        t0 = time.perf_counter()
        routed = build_flagship(spark, SF_DIR)
        (
            routed.repartition("_route", "role")
            .write.mode("overwrite")
            .partitionBy("_route", "role")
            .parquet(os.path.join(out_dir, "routed"))
        )
        agg = flagship_aggregate(spark.read.parquet(os.path.join(out_dir, "routed")))
        agg_rows = agg.count()
        sec = time.perf_counter() - t0
        turns = (
            spark.read.parquet(os.path.join(out_dir, "routed"))
            .filter(F.col("_route") != "_unmatched")
            .count()
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "sec": round(sec, 3),
        "turns_routed": turns,
        "aggregate_rows": agg_rows,
        "turns_per_sec": round(turns / sec, 1),
    }


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-bench", master=f"local[{CPUS}]")
    flagship_only = "--flagship-only" in sys.argv

    # JIT/interning warm-up so the first timed query isn't charged
    # for JVM startup
    spark.range(1000).selectExpr("sum(id)").collect()

    flagship = run_flagship_bench(spark)

    result = {
        "metric": "flagship end-to-end parse->enrich->route->aggregate wall sec "
        f"(local[{CPUS}])",
        "value": flagship["sec"],
        "unit": "sec",
        "sf": _sf_label(SF_DIR),
        "turns": flagship["turns_routed"],
        "turns_per_sec": flagship["turns_per_sec"],
        "queries": {"flagship_e2e": flagship["sec"]},
    }

    if not flagship_only:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        for name in HEADLINE:
            t0 = time.perf_counter()
            _materialize(qs[name](spark, SF_DIR))
            result["queries"][name] = round(time.perf_counter() - t0, 3)

    spark.stop()
    print(json.dumps(result))
    return 0


def main_scaling() -> int:
    """Run the flagship at two parallelism levels (N=8, 4N=32) on the
    same input; report throughput at both plus scaling efficiency
    (BASELINE.json: >=0.8 between N and 4N executors)."""
    here = os.path.abspath(__file__)
    runs = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, here, "--flagship-only"],
            env=env, capture_output=True, text=True, check=True,
        )
        runs[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    t8 = runs["8"]["turns_per_sec"]
    t32 = runs["32"]["turns_per_sec"]
    eff = (t32 / t8) / 4.0
    print(json.dumps({
        "metric": "scaling efficiency local[8] -> local[32]",
        "sf": _sf_label(SF_DIR),
        "turns_per_sec_n8": t8,
        "turns_per_sec_n32": t32,
        "speedup": round(t32 / t8, 3),
        "efficiency": round(eff, 3),
        "sec_n8": runs["8"]["value"],
        "sec_n32": runs["32"]["value"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main_scaling() if "--scaling" in sys.argv else main())
