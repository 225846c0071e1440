"""spark-submit entry point for the web-archive index pipeline:
pages (url, warc_ts, html) → SURT-keyed CDX capture index (written
RANGE-CLUSTERED by the index key — the archive's range-scan layout)
→ digest-transition change rates → Cho/Garcia-Molina revisit
intervals and a per-host staleness work-list, plus one JSON stats
line.

This composes the round-8 archive family (q_surt_index,
q_stale_captures, q_recrawl_schedule's estimator) into the job an
archive/recrawl team actually runs: the index serves replay and
range scans, the staleness table is the priority queue the next
crawl round drains. The streaming sibling
(streaming_surt_index) maintains the same index incrementally.

Local smoke (synthesizes a recrawl-bearing pages corpus):
    python jobs/archive_index.py --pages 200 \\
        --output /tmp/archive --master 'local[8]'

Cluster (real pages table):
    make dist
    spark-submit --py-files dist/readembedability_spark.zip \\
        --master yarn --conf spark.sql.adaptive.enabled=true \\
        jobs/archive_index.py --input lake.db.pages --output .../archive
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

def captures(pages):
    """(surt_key, host, url, ts, digest) — the capture model both
    halves read. SURT key via the SHARED surt_key_expr (the same
    definition the gate query and the streaming maintainer use);
    digest = md5 prefix of the raw payload (the content identity the
    index versions on). Row-local string work only."""
    from readembedability_spark.textops import surt_key_expr

    host = F.lower(F.regexp_extract("url", r"^https?://([^/?#]+)", 1))
    return pages.select(
        surt_key_expr(F.col("url")).alias("surt_key"),
        host.alias("host"),
        "url",
        F.col("warc_ts").alias("ts"),
        F.substring(
            F.md5(F.coalesce("html", F.lit(b""))), 1, 8
        ).alias("digest"),
    )


def surt_index(caps):
    """The CDX table: one hash aggregate on the index key
    (q_surt_index's plan over real captures)."""
    return caps.groupBy("surt_key").agg(
        F.count("*").alias("n_captures"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.countDistinct("digest").alias("n_versions"),
    )


def staleness(caps):
    """Per-host staleness work-list via the SHARED staleness core
    (q_stale_captures's exact plan: digest-transition lag window →
    host rollup → Cho/Garcia-Molina interval → frontier-age
    is_stale); equal-ts captures tie-break on digest here (real
    capture tables carry no event_id)."""
    from readembedability_spark.textops import staleness_from

    return staleness_from(caps, tiebreak="digest")


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages parquet (url, warc_ts, html)")
    src.add_argument(
        "--pages",
        type=int,
        help="synthesize N recrawl-bearing pages (smoke/test path)",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    builder = SparkSession.builder.appName("archive-index")
    if args.master:
        builder = builder.master(args.master).config(
            "spark.sql.shuffle.partitions", "8"
        )
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from readembedability_spark.queries import _persist, release_caches

    t0 = time.time()
    out = Path(args.output)
    if args.input:
        pages = spark.read.parquet(args.input)
    else:
        from readembedability_spark.sources.synth import generate_pages

        synth = out / "_synth"
        generate_pages(synth / "pages.parquet", args.pages)
        pages = spark.read.parquet(str(synth))
    stats: dict = {"pages": pages.count()}

    # captures feed BOTH the index and the staleness half — one scan,
    # persisted (flat lineage: persist is safe here, nothing nests)
    caps = _persist(captures(pages))
    stats["captures"] = caps.count()

    idx = surt_index(caps)
    # the archive's range-scan layout: range-cluster by the index key
    # and sort within partitions — the sort rides the SAME exchange
    parts = max(spark.sparkContext.defaultParallelism * 2, 16)
    (
        idx.repartitionByRange(parts, "surt_key")
        .sortWithinPartitions("surt_key")
        .write.mode("overwrite")
        .parquet(str(out / "index"))
    )
    staleness(caps).write.mode("overwrite").parquet(str(out / "stale"))
    # stats counters read BACK the written tables (parquet row counts
    # are metadata reads) instead of re-running either plan
    stats["index_keys"] = spark.read.parquet(str(out / "index")).count()
    st = spark.read.parquet(str(out / "stale"))
    counts = st.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.col("is_stale").cast("long")), F.lit(0)
        ).alias("stale"),
    ).collect()[0]
    stats["hosts_estimated"] = counts["n"]
    stats["stale_hosts"] = counts["stale"]
    stats["wall_sec"] = round(time.time() - t0, 1)
    release_caches(spark)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
