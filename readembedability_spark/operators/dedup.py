"""O-7: latest-capture-per-url dedup (window row_number).

One row per url — max ``warc_ts`` wins; deterministic tie-break on the
html length so re-runs are stable even with equal timestamps.

Scale note: this is one shuffle on ``url``. At 10^12 rows the url key is
near-unique (dup rate ~3%), so the window partition sizes are tiny and
AQE coalesces the exchange; no skew risk because hot HOSTS are many
distinct urls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(pages: DataFrame) -> DataFrame:
    # final xxhash64 tie-break gives a total order: rows with equal
    # warc_ts AND equal html length would otherwise pick an arbitrary
    # winner, making re-runs non-byte-stable for such duplicates
    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"),
        F.desc(F.coalesce(F.length("html"), F.lit(-1))),
        F.desc(F.xxhash64(F.coalesce("html", F.lit(b"")))),
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
