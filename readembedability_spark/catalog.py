"""M5 storage abstraction: parquet locally, Iceberg on a real cluster.

The sandbox PySpark distribution carries no Iceberg runtime JARs
(SURVEY.md §0), so ``iceberg_available()`` gates the production path.
On a cluster, submit with:

    spark-submit --py-files dist/readembedability_spark.zip \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=<warehouse-uri> \\
      jobs/extract_run.py --input lake.db.pages --output lake.db.extracted

Production DDL (partition spec chosen for 10^12-row scale):

    CREATE TABLE lake.db.pages (
      url string, warc_ts timestamp, html binary, text string, lang string)
    USING iceberg PARTITIONED BY (days(warc_ts));
    -- extracted: partitioned by salt → bounded file counts per commit,
    -- and resume/bucket pruning stays aligned with the write layout.
    CREATE TABLE lake.db.extracted (...) USING iceberg
      PARTITIONED BY (salt);
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from readembedability_spark.schemas import PAGES_SCHEMA


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: SLF001
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read a pages table: Iceberg table name if the runtime is present
    and ``ref`` looks like a catalog ref, else a parquet path."""
    if "://" not in ref and "." in ref and "/" not in ref and iceberg_available(spark):
        return spark.read.format("iceberg").load(ref)
    return spark.read.schema(PAGES_SCHEMA).parquet(ref)


def write_extracted(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    """Write the extracted table (O-3).

    Iceberg: partitioned by salt (bounded files per commit; resume
    pruning aligned with layout). Local parquet: flat files — directory
    partitioning with a local committer fans each task into num_salts
    tiny files and serializes the job on file IO (salt stays a column).
    """
    if "/" not in ref and "." in ref:
        spark = df.sparkSession
        if iceberg_available(spark):
            df.writeTo(ref).partitionedBy("salt").createOrReplace()
            return
    df.write.mode(mode).parquet(ref)
