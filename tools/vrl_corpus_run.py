"""Dev harness: run the whole vrl_programs.json corpus in one Spark
session and print pass/skip buckets. Faster feedback than pytest
(shared session, no fixtures)."""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from vector_spark.vrl_lang import VrlCompileError, eval_vrl


import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    'tvp', os.path.join(os.path.dirname(__file__), '..', 'tests',
                        'test_vrl_programs.py'))
_tvp = _ilu.module_from_spec(_spec)
try:
    _spec.loader.exec_module(_tvp)
except Exception:
    pass
same = _tvp.same


def main():
    cases = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "tests",
                          "fixtures", "vrl_programs.json"))
    )
    only = sys.argv[1:] or None
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("OFF")
    passed, compile_skip, runtime_skip, value_skip = [], [], [], []
    for c in cases:
        if only and c["name"] not in only:
            continue
        try:
            got, _ = eval_vrl(spark, c["source"], c["object"])
        except VrlCompileError as e:
            compile_skip.append((c["name"], str(e)[:100]))
            continue
        except Exception as e:
            runtime_skip.append(
                (c["name"], f"{type(e).__name__}: {str(e)[:90]}")
            )
            continue
        if same(got, c["want"]):
            passed.append(c["name"])
        else:
            value_skip.append(
                (c["name"], f"got {got!r} want {c['want']!r}"[:160])
            )
    print(f"PASS {len(passed)}  compile-skip {len(compile_skip)}  "
          f"runtime-skip {len(runtime_skip)}  value-skip {len(value_skip)}")
    for label, rows in (
        ("COMPILE", compile_skip),
        ("RUNTIME", runtime_skip),
        ("VALUE", value_skip),
    ):
        for n, msg in rows:
            print(f"  [{label}] {n}: {msg}")
    spark.stop()


if __name__ == "__main__":
    main()
