"""spark-submit entry point for FULL pretraining-data preparation:
quality gates (gopher + blocklist) → cross-document line-dedup with
REMOVAL (cleaned text flows downstream) → exact dedup → LSH near-dup
clustering with a best-quality keeper → 13-gram decontamination →
sequence packing — written as curated-docs + packed-sequences parquet
plus a JSON stats line per stage.

This chains the round-4 transform operators (q_badwords_filter,
q_dedup_lines_global, q_dedup_exact, q_dedup_clusters_best,
q_decontaminate, q_pack_sequences) into the one job a pretraining
corpus actually runs, over any (doc_id, text, lang) parquet table.

Local smoke:
    python jobs/pretrain_prep.py --input documents.parquet \\
        --output /tmp/prep --master 'local[8]'

Cluster:
    make dist
    spark-submit --py-files dist/readembedability_spark.zip \\
        --master yarn --num-executors N --executor-cores 4 \\
        --conf spark.sql.adaptive.enabled=true \\
        jobs/pretrain_prep.py --input lake.db.documents --output .../prep
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

#: content blocklist — production supplies its own; the default
#: matches q_badwords_filter so the job smoke-checks on the synthetic
#: corpus.
DEFAULT_BADWORDS = ("slow", "skew", "spill", "crash")


def gate(
    docs,
    min_tokens: int,
    badwords: tuple[str, ...],
    max_bad_frac: float = 0.05,
):
    """Stage 1 — row-local quality gates: token-count floor, mean word
    length band (gopher), blocklist fraction ≤ max_bad_frac (a
    fraction threshold rather than C4's any-hit rule — tune per
    blocklist severity; 0 reproduces any-hit). One explode-free pass:
    all signals fold into array HOFs, so the gate is a pure map that
    pushes into the scan."""
    toks = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    n_tok = F.size(toks)
    mean_wl = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    ) / F.nullif(n_tok.cast("double"), F.lit(0.0))
    n_bad = F.size(
        F.filter(toks, lambda w: w.isin(*badwords) if badwords else F.lit(False))
    )
    return docs.withColumn("n_tokens", n_tok).filter(
        (F.col("n_tokens") >= min_tokens)
        & mean_wl.between(3, 10)
        & (n_bad <= F.ceil(n_tok * F.lit(max_bad_frac)))
    )


def dedup_lines_global(spark, docs):
    """Stage 2 — C4 cross-document line dedup, REMOVAL form: every
    line is kept once corpus-wide (owner = lexicographic-min
    (doc_id, line_idx)); the CLEANED text flows to later stages.
    Same plan as q_dedup_lines_global: md5 line keys map-side, one
    combining groupBy(h) MIN, one h-keyed join, one doc rollup."""
    from readembedability_spark.textops import _ml_text_col

    lx = (
        docs.select("doc_id", F.posexplode(F.split(_ml_text_col(), "\n")))
        .withColumnsRenamed({"pos": "li0", "col": "line"})
        .select(
            "doc_id",
            (F.col("li0") + 1).alias("li"),
            "line",
            F.md5(F.encode("line", "UTF-8")).alias("h"),
        )
        .withColumn("k", F.col("doc_id") * F.lit(1000000) + F.col("li"))
    )
    own = lx.groupBy("h").agg(F.min("k").alias("ok"))
    kept = lx.join(own, "h").filter(F.col("k") == F.col("ok"))
    cleaned = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("li", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text")
    )
    return (
        docs.join(cleaned, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.replace(F.col("clean_text"), F.lit("\n"), F.lit(" ")).alias(
                "text"
            ),
        )
        .filter(F.length(F.trim("text")) > 0)
    )


def near_dup_keep_best(spark, docs):
    """Stage 4 — MinHash-LSH near-dup clustering with the
    BEST-QUALITY keeper per cluster (longest cleaned doc, doc_id
    tie-break) — the q_dedup_clusters_best rule on the job's cleaned
    text."""
    from readembedability_spark.queries import _persist
    from readembedability_spark.textops import (
        _connected_components,
        _shingles_from,
        _verified_pairs_from,
    )

    shingles = _persist(_shingles_from(docs.select("doc_id", "text")))
    vpairs = _verified_pairs_from(shingles)
    labels = _connected_components(spark, vpairs.select("a", "b"))
    labeled = docs.join(
        labels.select(F.col("node").alias("doc_id"), "label"),
        "doc_id",
        "left",
    ).withColumn("rep", F.coalesce("label", "doc_id"))
    w_best = (
        Window.partitionBy("rep")
        .orderBy(F.desc(F.length("text")), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        labeled.withColumn("keeper", F.first("doc_id").over(w_best))
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "lang", "text")
    )


def decontaminate(docs, eval_docs, n: int = 13):
    """Stage 5 — drop training docs sharing any word n-gram with the
    eval set (broadcast semi-join, the q_decontaminate plan)."""
    from readembedability_spark.textops import _grams_from

    egrams = _grams_from(eval_docs, n).select("g").distinct()
    tgrams = _grams_from(docs.select("doc_id", "text"), n)
    contaminated = (
        tgrams.join(F.broadcast(egrams), "g").select("doc_id").distinct()
    )
    return docs.join(contaminated, "doc_id", "left_anti")


def pack_sequences(docs, budget: int = 1024):
    """Stage 6 — greedy sequence packing in doc_id order (the
    q_pack_sequences single-exchange running-sum shape): assign docs
    to fixed-token-budget bins; oversized docs get a bin alone."""
    w = Window.orderBy("doc_id")
    toks = docs.select(
        "doc_id", F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n_tok")
    )
    cum = toks.withColumn(
        "cum", F.sum(F.least(F.col("n_tok"), F.lit(budget))).over(w)
    )
    return cum.withColumn(
        "seq_id", F.floor((F.col("cum") - 1) / budget).cast("long")
    ).select("doc_id", "n_tok", "seq_id")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--seq-budget", type=int, default=1024)
    ap.add_argument(
        "--eval-mod", type=int, default=20,
        help="doc_id %% MOD == 0 slice acts as the eval set",
    )
    args = ap.parse_args()

    builder = SparkSession.builder.appName("pretrain-prep")
    if args.master:
        builder = builder.master(args.master).config(
            "spark.sql.shuffle.partitions", "8"
        )
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from readembedability_spark.queries import release_caches

    t0 = time.time()
    docs = spark.read.parquet(args.input).select("doc_id", "text", "lang")
    stats = {"input": docs.count()}

    gated = gate(docs, args.min_tokens, DEFAULT_BADWORDS)
    stats["after_gates"] = gated.count()

    cleaned = dedup_lines_global(spark, gated)
    stats["after_line_dedup"] = cleaned.count()

    exact = (
        cleaned.withColumn("h", F.md5(F.encode("text", "UTF-8")))
        .withColumn(
            "keep",
            F.row_number().over(
                Window.partitionBy("h").orderBy("doc_id")
            ),
        )
        .filter(F.col("keep") == 1)
        .drop("h", "keep")
    )
    stats["after_exact_dedup"] = exact.count()

    kept = near_dup_keep_best(spark, exact)
    stats["after_near_dup"] = kept.count()

    eval_docs = docs.filter(F.col("doc_id") % args.eval_mod == 0).select(
        "doc_id", "text"
    )
    final = decontaminate(
        kept.filter(F.col("doc_id") % args.eval_mod != 0), eval_docs
    )
    stats["after_decontamination"] = final.count()

    out = Path(args.output)
    final.repartition(4).write.mode("overwrite").parquet(str(out / "curated"))
    packed = pack_sequences(final, args.seq_budget)
    packed.write.mode("overwrite").parquet(str(out / "packed"))
    stats["n_sequences"] = packed.select("seq_id").distinct().count()
    stats["wall_sec"] = round(time.time() - t0, 1)
    release_caches(spark)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
