"""O-1/O-6: pages scan + pushed-down pre-filters.

Production target is an Iceberg table partitioned by ``days(warc_ts)``
(catalog.py); the sandbox has no Iceberg JARs (SURVEY.md §0) so the
default path is parquet. Either way the *logical* plan is identical and
Catalyst pushes filters/pruning into the scan — verified by
tests/test_plans.py (PushedFilters must include IsNotNull(html)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readembedability_spark.schemas import PAGES_SCHEMA

#: Rows above this never enter the Python stage (quarantined upstream).
MAX_HTML_BYTES = 8 << 20


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan the pages table with the declared schema (no inference)."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def prefilter(
    pages: DataFrame,
    langs: list[str] | None = None,
    max_bytes: int = MAX_HTML_BYTES,
) -> DataFrame:
    """O-6 pre-filters, all pushed to the scan by Catalyst:
    non-null html, sane size, optional language allowlist."""
    out = pages.filter(
        F.col("html").isNotNull() & (F.length("html") <= F.lit(max_bytes))
    )
    if langs:
        out = out.filter(F.col("lang").isin(langs) | F.col("lang").isNull())
    return out
