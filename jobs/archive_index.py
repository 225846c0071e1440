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

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

#: the week cap and the frontier comparison mirror q_stale_captures
WEEK_HOURS = 168.0


def captures(pages):
    """(surt_key, host, url, ts, digest) — the capture model both
    halves read. SURT key = lowercased dot-reversed host + ')' +
    path; digest = md5 prefix of the raw payload (the content
    identity the index versions on). Row-local string work only."""
    host = F.lower(F.regexp_extract("url", r"^https?://([^/?#]+)", 1))
    path = F.regexp_replace("url", r"^https?://[^/?#]+", "")
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"), path,
    )
    return pages.select(
        surt.alias("surt_key"),
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
    """Per-host staleness work-list: digest transitions between
    consecutive captures of the same url (lag over the per-url
    sequence) feed the Cho/Garcia-Molina estimator; age of the
    newest capture vs the archive frontier decides is_stale
    (q_stale_captures's plan over real captures). Hosts with one
    capture or a zero span are excluded — nothing to estimate."""
    w = Window.partitionBy("url").orderBy("ts", "digest")
    prev = F.lag("digest").over(w)
    chg = caps.select(
        "host",
        "ts",
        F.when(prev.isNotNull() & (prev != F.col("digest")), 1)
        .otherwise(0)
        .alias("changed"),
    )
    span_us = F.expr("timestampdiff(MICROSECOND, first_ts, last_ts)")
    h = (
        chg.groupBy("host")
        .agg(
            F.count("*").alias("n_captures"),
            F.sum("changed").cast("long").alias("n_changes"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .filter((F.col("n_captures") >= 2) & (span_us > 0))
    )
    span_hours = span_us / F.lit(3600000000.0)
    lam = -F.log(
        (F.col("n_captures") - F.col("n_changes") + 0.5)
        / (F.col("n_captures") + 0.5)
    ) / (span_hours / (F.col("n_captures") - 1))
    mx = F.broadcast(caps.agg(F.max("ts").alias("now_ts")))
    age_hours = F.round(
        F.expr("timestampdiff(MICROSECOND, last_ts, now_ts)")
        / F.lit(3600000000.0),
        4,
    )
    recrawl_hours = F.round(
        F.least(F.lit(WEEK_HOURS), F.try_divide(F.lit(1.0), lam)), 4
    )
    return h.crossJoin(mx).select(
        "host",
        "n_captures",
        "n_changes",
        "last_ts",
        age_hours.alias("age_hours"),
        recrawl_hours.alias("recrawl_hours"),
        (age_hours > recrawl_hours).alias("is_stale"),
    )


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
    stats["index_keys"] = idx.count()

    st = staleness(caps)
    st.write.mode("overwrite").parquet(str(out / "stale"))
    stats["hosts_estimated"] = st.count()
    stats["stale_hosts"] = st.filter("is_stale").count()
    stats["wall_sec"] = round(time.time() - t0, 1)
    release_caches(spark)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
