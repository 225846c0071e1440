"""spark-submit entry point for the crawl-graph pipeline: pages →
A-23 link extraction (mapInPandas) → host-level edge projection →
PageRank with dangling-mass redistribution → crawl-frontier discovery
— written as host-authority scores, frontier counts, and pages
annotated with their host's authority prior, plus one JSON stats line.

This composes the round-5 extracted-link family (q_extract_links,
q_pagerank_links, q_crawl_frontier) into the job a crawl-curation
team actually runs: authority becomes a per-page curation prior
(crawl scheduling, quality weighting), the frontier feeds the next
crawl round.

Local smoke (synthesizes link-bearing pages from a documents table):
    python jobs/crawl_graph.py --documents /root/testdata/sf0.001 \\
        --output /tmp/graph --master 'local[8]'

Cluster (real pages table):
    make dist
    spark-submit --py-files dist/readembedability_spark.zip \\
        --master yarn --conf spark.sql.adaptive.enabled=true \\
        jobs/crawl_graph.py --input lake.db.pages --output .../graph
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

#: generic host pattern (the registry queries use the synthesis-shaped
#: variant; a production url table needs the general form)
HOST_RE = r"https?://([^/?#]+)"


def extract_link_table(spark, pages):
    """(url, link) through the full salted mapInPandas extraction —
    the links column rides the batch the extract stage already emits;
    pages with no surviving links drop out here."""
    from readembedability_spark.operators.extract import extract_stage
    from readembedability_spark.operators.salt import salt_repartition

    pages = salt_repartition(
        pages, max(spark.sparkContext.defaultParallelism * 2, 16)
    )
    return (
        extract_stage(pages)
        .select("url", F.explode("links").alias("link"))
    )


def host_edges(links):
    """Distinct (src_host, dst_host) edges, self-loops dropped. At
    100 TB this is one map + one distinct shuffle keyed by the edge —
    host cardinality (~10^8) is tiny next to the link table."""
    return (
        links.select(
            F.regexp_extract("url", HOST_RE, 1).alias("src"),
            F.regexp_extract("link", HOST_RE, 1).alias("dst"),
        )
        .filter(
            (F.col("src") != "") & (F.col("dst") != "")
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )


def frontier(links, pages):
    """Distinct outbound links not present as corpus urls, rolled up
    per target host (the q_crawl_frontier plan: url-keyed anti-join,
    no broadcast assumption on either side)."""
    unseen = (
        links.select("link").distinct()
        .join(pages.select("url"), F.col("link") == F.col("url"), "left_anti")
    )
    return unseen.groupBy(
        F.regexp_extract("link", HOST_RE, 1).alias("host")
    ).agg(F.count("*").alias("n_unseen"))


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages parquet (url, warc_ts, html, ...)")
    src.add_argument(
        "--documents",
        help="sf dir with documents.parquet — synthesize link-bearing "
        "pages (smoke/test path)",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    builder = SparkSession.builder.appName("crawl-graph")
    if args.master:
        builder = builder.master(args.master).config(
            "spark.sql.shuffle.partitions", "8"
        )
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from readembedability_spark.queries import _persist, release_caches
    from readembedability_spark.textops import _link_pages, _pagerank

    t0 = time.time()
    if args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = _link_pages(spark, args.documents)
    stats = {"pages": pages.count()}

    # links feed BOTH the graph and the frontier — extracted once
    links = _persist(extract_link_table(spark, pages))
    stats["links"] = links.count()

    edges = host_edges(links)
    ranks = _pagerank(spark, edges).withColumnsRenamed(
        {"node": "host", "pr": "authority"}
    )
    fr = frontier(links, pages)

    out = Path(args.output)
    ranks.write.mode("overwrite").parquet(str(out / "authority"))
    fr.write.mode("overwrite").parquet(str(out / "frontier"))
    # the curation prior: every page annotated with its host's
    # authority (broadcast join — the rank table is host-count-sized)
    annotated = pages.select("url").join(
        F.broadcast(ranks.withColumn("h", F.col("host"))),
        F.regexp_extract("url", HOST_RE, 1) == F.col("h"),
        "left",
    ).select("url", F.coalesce("authority", F.lit(0.0)).alias("authority"))
    annotated.write.mode("overwrite").parquet(str(out / "pages_authority"))

    stats["hosts_ranked"] = ranks.count()
    stats["frontier_hosts"] = fr.count()
    stats["wall_sec"] = round(time.time() - t0, 1)
    release_caches(spark)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
