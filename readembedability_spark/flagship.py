"""Flagship query: the full extraction pipeline over a pages table
synthesized (JVM-side, deterministically) from the driver's documents
table — so the whole mapInPandas extract stage is oracle-checkable.

The HTML wrapper is intentionally constrained: for
``<html><head><title>Doc N</title></head><body><div class="content">
<p>{text}</p></div></body></html>`` the frozen extraction spec provably
yields ``title = 'Doc N'`` and ``content_text = text`` (single
paragraph, already whitespace-collapsed, no markup chars in the
synthetic corpus) — which a DuckDB oracle can state in pure SQL. That
makes the byte-identity invariant (BASELINE.json:15) machine-checked by
the driver, not just by pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readembedability_spark.operators.extract import extract_stage
from readembedability_spark.operators.salt import salt_repartition


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(
        F.lit("https://docs.example.com/d/"), F.col("doc_id").cast("string")
    )
    html = F.encode(
        F.concat(
            F.lit('<html><head><title>Doc '),
            F.col("doc_id").cast("string"),
            F.lit('</title></head><body><div class="content"><p>'),
            F.col("text"),
            F.lit("</p></div></body></html>"),
        ),
        "UTF-8",
    )
    return docs.select(
        url.alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def flagship_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pages(from documents) → salt → mapInPandas extract → key fields."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pages = pages_from_documents(spark, sf_dir)
    parallelism = max(spark.sparkContext.defaultParallelism * 2, 16)
    pages = salt_repartition(pages, parallelism)
    extracted = extract_stage(pages)
    return extracted.select("url", "title", "content_text", "status")


FLAGSHIP_ORACLE_SQL = """
    SELECT 'https://docs.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           text AS content_text,
           'ok' AS status
    FROM documents
"""
