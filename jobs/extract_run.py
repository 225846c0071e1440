"""spark-submit entry point for the extraction pipeline.

Local smoke:
    python jobs/extract_run.py --input pages.parquet --output /tmp/out \\
        --run-id r1 --parallelism 32

Cluster (BASELINE.json:6 "spark-submit --py-files on multi-executor
clusters at N and 4N executors"):
    make dist
    spark-submit --py-files dist/readembedability_spark.zip \\
        --master yarn --num-executors N --executor-cores 4 \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.execution.arrow.maxRecordsPerBatch=512 \\
        --conf spark.speculation=true \\
        jobs/extract_run.py --input lake.db.pages --output s3://…/out \\
        --run-id r1 --parallelism $((N * 4 * 3))
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from readembedability_spark.plans.pipeline import RunConfig, run_extract  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run")
    ap.add_argument("--parallelism", type=int, default=32)
    ap.add_argument("--num-salts", type=int, default=64)
    ap.add_argument("--langs", default=None, help="comma-separated allowlist")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    builder = SparkSession.builder.appName("readembedability-extract")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.speculation", "true")  # straggler re-launch (§4)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    cfg = RunConfig(
        pages_path=args.input,
        out_dir=args.output,
        run_id=args.run_id,
        parallelism=args.parallelism,
        num_salts=args.num_salts,
        langs=args.langs.split(",") if args.langs else None,
        resume=not args.no_resume,
    )
    result = run_extract(spark, cfg)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
