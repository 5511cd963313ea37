"""CLI entrypoint — the `vector` binary's surface on Spark:

    python -m vector_spark run  config.toml [--sf-dir DIR] [--master M]
    python -m vector_spark test config.toml            # `vector test`
    python -m vector_spark stream config.toml --out DIR [--checkpoint DIR]

`run` executes the config's topology as a batch job and prints the
per-sink results as one JSON line; `test` runs the `[[tests]]` blocks
with the reference's pass semantics and exits non-zero on failure
(exactly how `vector test` behaves in CI); `stream` drains the
config's file sources through the Structured Streaming executor.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="vector_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="run a config as a batch job")
    run_p.add_argument("config")
    run_p.add_argument("--sf-dir", default=None,
                       help="testdata dir for demo_logs sources")
    run_p.add_argument("--master", default="local[*]")

    test_p = sub.add_parser("test", help="run the config's [[tests]] blocks")
    test_p.add_argument("config")
    test_p.add_argument("--base-dir", default=None,
                        help="base for remap file= / enrichment paths")
    test_p.add_argument("--master", default="local[4]")

    st_p = sub.add_parser("stream", help="run a config as a stream")
    st_p.add_argument("config")
    st_p.add_argument("--out", required=True)
    st_p.add_argument("--checkpoint", default=None)
    st_p.add_argument("--master", default="local[*]")
    st_p.add_argument("--continuous", action="store_true",
                      help="keep running instead of draining once")

    args = p.parse_args(argv)

    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-cli", master=args.master)
    if args.cmd == "run":
        from vector_spark.config import run_config

        out = run_config(spark, args.config, sf_dir=args.sf_dir)
        print(json.dumps(_jsonable(out), default=str))
        return 0
    if args.cmd == "test":
        from vector_spark.config import run_config_tests

        results = run_config_tests(
            spark, args.config, base_dir=args.base_dir
        )
        failed = 0
        for name, errors in results.items():
            status = "passed" if not errors else "FAILED"
            print(f"test {name} ... {status}")
            for e in errors:
                print(f"    {e}")
            failed += bool(errors)
        print(f"{len(results) - failed} passed, {failed} failed")
        return 1 if failed else 0
    if args.cmd == "stream":
        from vector_spark.config import run_config_streaming

        out = run_config_streaming(
            spark, args.config, out_dir=args.out,
            checkpoint_dir=args.checkpoint,
            trigger_once=not args.continuous,
        )
        if args.continuous:  # pragma: no cover — long-running mode
            for q in out.pop("_queries", []):
                q.awaitTermination()
        print(json.dumps(_jsonable(out), default=str))
        return 0
    return 2  # pragma: no cover


def _jsonable(out):
    """Per-sink results -> printable values (DataFrames become row
    counts; memory-sink row lists pass through)."""
    clean = {}
    for k, v in out.items():
        if hasattr(v, "count") and hasattr(v, "schema"):  # DataFrame
            clean[k] = {"rows": v.count()}
        else:
            clean[k] = v
    return clean


if __name__ == "__main__":
    sys.exit(main())
