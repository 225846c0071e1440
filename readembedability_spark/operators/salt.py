"""O-8: explicit salted repartition by url-hash (BASELINE.json:6
"explicit salting/repartitioning by url-hash to kill host-level skew").

Pages from one hot host (Zipf web reality) must not land in one task.
``salt = pmod(xxhash64(url), num_salts)`` is uniform regardless of host,
so ``repartition(parallelism, salt, url)`` spreads any host evenly; the
salt is retained in the output for lineage (EXTRACTED_SCHEMA.salt).

Scale note: repartitioning on (salt, url) rather than salt alone keeps
the hash domain wide when parallelism ≫ num_salts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from readembedability_spark.functions import salt_col


def salt_repartition(
    pages: DataFrame, parallelism: int, num_salts: int = 64
) -> DataFrame:
    out = pages.withColumn("salt", salt_col("url", num_salts))
    return out.repartition(parallelism, "salt", "url")
