"""spark-submit entrypoint for the flagship pipeline.

Cluster form (the BASELINE.json deployment shape):

    zip -r vector_spark.zip vector_spark/
    spark-submit --py-files vector_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.session.timeZone=UTC \
        jobs/run_flagship.py --sf-dir s3://bucket/transcripts \
        --out s3://bucket/routed --lineage

Local form (sandbox):

    python jobs/run_flagship.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/flagship_out --lineage

Resumable: re-running with --resume and the same --out skips sinks
whose commit marker exists (runner_batch.run_flagship). Prints one
JSON line of per-sink routed-row counts + stage metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True, help="input table directory")
    ap.add_argument("--out", default=None, help="output dir for sink writes")
    ap.add_argument("--resume", action="store_true",
                    help="skip sinks whose commit marker exists")
    ap.add_argument("--lineage", action="store_true",
                    help="emit per-partition lineage rows")
    ap.add_argument("--master", default=None,
                    help="local[N] (default) or 'inherit' to let "
                         "spark-submit's --master govern")
    ap.add_argument("--native-parse", action="store_true",
                    help="use the pure-JVM regexp parse instead of the "
                         "Arrow/pandas UDF path")
    args = ap.parse_args()

    from vector_spark.runner_batch import run_flagship
    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-flagship", master=args.master)
    result = run_flagship(
        spark,
        args.sf_dir,
        out_dir=args.out,
        resume=args.resume,
        lineage=args.lineage,
        use_pandas_parse=not args.native_parse,
    )
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
