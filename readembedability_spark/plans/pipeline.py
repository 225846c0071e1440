"""The end-to-end extraction plan (SURVEY.md §3.2).

    scan → prefilter → bucket → resume-anti-join → dedup-latest →
    salt/repartition → mapInPandas(extract) → write(+metrics, checkpoint)

Exactly two wide dependencies by design (dedup's url shuffle and the
explicit salted repartition); the resume anti-join is broadcast. That
narrow profile is what makes ≥0.8 N→4N scaling efficiency attainable
(SURVEY.md §6).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from readembedability_spark.operators.dedup import dedup_latest
from readembedability_spark.operators.extract import extract_stage, load_metrics
from readembedability_spark.operators.resume import (
    load_done_buckets,
    mark_buckets_done,
    resume_filter,
    with_bucket,
)
from readembedability_spark.operators.salt import salt_repartition
from readembedability_spark.sources.pages import prefilter, read_pages


@dataclass
class RunConfig:
    pages_path: str
    out_dir: str
    run_id: str = "run"
    parallelism: int = 32
    num_salts: int = 64
    langs: list | None = None
    dedup: bool = True
    resume: bool = True


def build_extract_df(spark: SparkSession, cfg: RunConfig) -> DataFrame:
    """Assemble the logical plan up to (and including) the extract stage."""
    pages = read_pages(spark, cfg.pages_path)
    pages = prefilter(pages, langs=cfg.langs)
    pages = with_bucket(pages)
    if cfg.resume:
        done = load_done_buckets(spark, _ckpt_dir(cfg), cfg.run_id)
        pages = resume_filter(pages, done)
    if cfg.dedup:
        pages = dedup_latest(pages)
    pages = salt_repartition(pages, cfg.parallelism, cfg.num_salts)
    return extract_stage(pages, run_id=cfg.run_id, metrics_dir=_metrics_dir(cfg))


def _ckpt_dir(cfg: RunConfig) -> str:
    return str(Path(cfg.out_dir) / "_checkpoint")


def _metrics_dir(cfg: RunConfig) -> str:
    return str(Path(cfg.out_dir) / "_metrics" / cfg.run_id)


def run_extract(spark: SparkSession, cfg: RunConfig) -> dict:
    """Execute the plan; returns summary counts. Idempotent under resume:
    a second invocation with the same run_id re-processes nothing."""
    extracted = build_extract_df(spark, cfg)
    out_path = str(Path(cfg.out_dir) / "extracted")
    extracted.write.mode("append").partitionBy("salt").parquet(out_path)
    # checkpoint AFTER the output commit (crash before this line → re-run)
    committed = spark.read.parquet(out_path)
    if cfg.resume:
        mark_buckets_done(
            spark.read.parquet(out_path), _ckpt_dir(cfg), cfg.run_id
        )
    n = committed.count()
    metrics = load_metrics(spark, _metrics_dir(cfg))
    metrics_path = str(Path(cfg.out_dir) / "metrics")
    if metrics.count() > 0:
        metrics.write.mode("append").parquet(metrics_path)
    return {"rows_out": n, "out_path": out_path}
