"""Column-level helpers (O-5/O-26/O-31) — all JVM-side builtins.

Everything here stays inside WholeStageCodegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from readembedability_spark.schemas import N_BUCKETS


def host_col(url: Column | str = "url") -> Column:
    """Hostname extracted from a url column (O-5), lowercased."""
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(url, r"^https?://([^/:?#]+)", 1))


def url_hash_col(url: Column | str = "url") -> Column:
    """Stable 64-bit hash of the url (xxhash64 — JVM-side, seed 42)."""
    url = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(url)


def salt_col(url: Column | str = "url", num_salts: int = 64) -> Column:
    """Skew salt: pmod(xxhash64(url), num_salts) (O-8, BASELINE.json:6
    'explicit salting/repartitioning by url-hash')."""
    return F.pmod(url_hash_col(url), F.lit(num_salts)).cast("int")


def bucket_col(url: Column | str = "url", n_buckets: int = N_BUCKETS) -> Column:
    """Checkpoint-resume bucket id (O-31)."""
    return F.pmod(url_hash_col(url), F.lit(n_buckets)).cast("int")


def html_kind_col(html: Column | str = "html") -> Column:
    """Vectorized magic-byte pre-classification (A-1 fast path, O-6).

    Catalyst-side peek at the first bytes so obviously-non-HTML rows can
    be filtered/routed without entering the Python stage. The Python
    extractor re-checks authoritatively.
    """
    html = F.col(html) if isinstance(html, str) else html
    head = F.substring(html.cast("string"), 1, 8)
    return (
        F.when(html.isNull() | (F.length(html) == 0), F.lit("empty"))
        .when(head.startswith("%PDF-"), F.lit("pdf"))
        .otherwise(F.lit("maybe_html"))
    )
