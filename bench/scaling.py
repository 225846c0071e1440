"""Two-parallelism scaling benchmark (BASELINE.md protocol).

Sandbox substitution for the N→4N executor criterion (BASELINE.json:2):
the same job — scan → dedup → salt/repartition → mapInPandas extract →
write — over the same deterministic corpus at local[8] and local[32],
3 runs each, median wall-clock; efficiency = tput32 / (4 × tput8).
Writes BENCH/BASELINE.md.

Usage: python bench/scaling.py [--pages 48000] [--runs 3]
"""

from __future__ import annotations

import argparse
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from readembedability_spark.sources.synth import ensure_corpus  # noqa: E402

CACHE = REPO / ".bench_cache"


def one_run(master_cores: int, pages_path: str, parallelism: int) -> tuple[float, int]:
    from pyspark.sql import SparkSession

    from readembedability_spark.plans.pipeline import RunConfig, run_extract

    spark = (
        SparkSession.builder.master(f"local[{master_cores}]")
        .appName(f"scaling-bench-{master_cores}")
        .config("spark.sql.shuffle.partitions", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="scalebench-")
    try:
        cfg = RunConfig(
            pages_path=pages_path,
            out_dir=out,
            run_id="bench",
            parallelism=parallelism,
            resume=False,
        )
        t0 = time.monotonic()
        res = run_extract(spark, cfg)
        wall = time.monotonic() - t0
        return wall, res["rows_out"]
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=48000)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    corpus = ensure_corpus(CACHE, args.pages)
    print(f"corpus: {corpus}", file=sys.stderr)

    results = {}
    # fixed partition count for both configs: granularity, not parallelism,
    # so the only variable is core count (mirrors executors on a cluster)
    parallelism = 128
    for cores in (8, 32):
        walls = []
        rows = 0
        for r in range(args.runs):
            wall, rows = one_run(cores, str(corpus), parallelism)
            walls.append(wall)
            print(f"local[{cores}] run {r + 1}: {wall:.2f}s ({rows} rows)", file=sys.stderr)
        med = statistics.median(walls)
        results[cores] = {
            "walls": [round(w, 2) for w in walls],
            "median_wall": round(med, 2),
            "rows": rows,
            "pages_per_sec": round(rows / med, 1),
        }

    t8 = results[8]["pages_per_sec"]
    t32 = results[32]["pages_per_sec"]
    eff = t32 / (4 * t8)

    md = f"""# BENCH — scaling protocol results (BASELINE.md §Protocol)

Same job (scan → dedup-latest → salted repartition({parallelism}) →
mapInPandas extract → write parquet partitioned by salt), same input
({args.pages} synthetic pages, seed=42, deterministic), same machine.
Median of {args.runs} runs.

| config | walls (s) | median wall (s) | rows | pages/sec |
|---|---|---|---|---|
| local[8]  | {results[8]['walls']} | {results[8]['median_wall']} | {results[8]['rows']} | {t8} |
| local[32] | {results[32]['walls']} | {results[32]['median_wall']} | {results[32]['rows']} | {t32} |

**Scaling efficiency** = tput32 / (4 × tput8) = {t32} / (4 × {t8}) =
**{eff:.3f}** (acceptance ≥ 0.8 per BASELINE.json:2).
"""
    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(md, encoding="utf-8")
    print(md)


if __name__ == "__main__":
    main()
