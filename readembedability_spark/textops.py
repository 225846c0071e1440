"""Training-data pipeline operators over the documents/embeddings tables:
deduplication (exact, Jaccard, MinHash-LSH, SimHash), similarity search
(brute-force cosine + LSH-bucketed ANN), and text analysis (language ID,
quality scoring, token counting, fingerprinting).

Every operator is a ``queries()`` entry with a DuckDB oracle (SURVEY.md
§2 extension; task brief "large-scale training-data pipeline ops").
Cross-engine determinism trick: all hashing is md5-hex (identical in
Spark and DuckDB), minima/majorities over hex strings, and doubles are
rounded in-query.

Scale notes (100 TB design):
- exact dedup: one shuffle on the hash — map-side partial agg free.
- unigram-Jaccard: quadratic candidate generation is gated to pairs
  sharing a token (inverted-index join), the standard trick; at real
  scale you'd run MinHash-LSH first and Jaccard only within buckets.
- MinHash-LSH: banding turns all-pairs into per-bucket joins; band
  signature is the shuffle key → skew-free for near-unique docs.
- ANN: brute-force is the correctness baseline; the LSH variant
  bucket-joins so each query compares against a small candidate set.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from readembedability_spark.queries import _t, q

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@q(
    "q_dedup_exact",
    """
    SELECT md5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS keeper
    FROM documents GROUP BY h
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy; keeper = min doc_id per group."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy(F.md5(F.encode("text", "UTF-8")).alias("h"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
    )


_WORDS_SQL = """
    words AS (
      SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '')
"""


def _words_df(spark, sf_dir):
    # NOTE: no _spread here — measured A/B (interleaved, warm): the extra
    # exchange costs more than parallelizing the explode saves; the
    # distinct() shuffle already spreads all downstream work.
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )


@q(
    "q_dedup_jaccard",
    f"""
    WITH {_WORDS_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM words GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
      FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT a, b, ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.8
    """,
)
def q_dedup_jaccard(spark, sf_dir):
    """Near-dup pairs by unigram-set Jaccard ≥ 0.8 (inverted-index join —
    only pairs sharing ≥1 token are ever materialized)."""
    words = _words_df(spark, sf_dir)
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("sz"))
    wa = words.alias("wa")
    wb = words.alias("wb")
    inter = (
        wa.join(
            wb,
            (F.col("wa.w") == F.col("wb.w"))
            & (F.col("wa.doc_id") < F.col("wb.doc_id")),
        )
        .groupBy(
            F.col("wa.doc_id").alias("a"), F.col("wb.doc_id").alias("b")
        )
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    jac = F.col("i") / (F.col("sza") + F.col("szb") - F.col("i"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .filter(jac >= 0.8)
        .select("a", "b", F.round(jac, 4).alias("jaccard"))
    )


_N_MINHASH = 8
_N_BANDS = 2  # 2 bands × 4 rows

#: 3-gram shingles — the textbook MinHash unit. Shingle universe is
#: |vocab|^3, so unrelated documents share almost none and LSH buckets
#: stay small (unigrams over a small vocabulary collide pathologically:
#: measured 5.2M candidate pairs on the sf0.1 synthetic corpus vs ~10k
#: with shingles).
_SHINGLES_SQL = """
    shingles AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(arr) - 1),
                      k -> array_to_string(list_slice(arr, k, k + 2), ' ')))
                 AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents))
      WHERE sh <> '')
"""


def _shingles_df(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    )
    sh = F.when(
        F.size("arr") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("arr") - 2),
            lambda k: F.concat_ws(" ", F.slice("arr", k, F.lit(3))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(sh).alias("sh"))
        .filter(F.col("sh") != "")
        .distinct()
    )


#: Degenerate-bucket guard: a bucket of k ids would otherwise emit
#: O(k^2) candidate pairs — a scale-killer on mostly-duplicate corpora
#: (k=10^6 identical docs → 5·10^11 pairs from ONE bucket). We emit all
#: pairs among the `_MAX_BUCKET_IDS` smallest doc_ids ("head") plus one
#: star pair (head-min, t) for every overflow id t, which preserves
#: dedup connectivity (every doc in the bucket stays linked to the
#: keeper) while keeping output linear in bucket size beyond the cap.
_MAX_BUCKET_IDS = 64

#: Reusable CTE chain ending in `cand(a, b)` — the capped MinHash-LSH
#: candidate pairs (consumed by q_minhash_lsh and q_dedup_lsh_verified).
#: The ranked/ROW_NUMBER formulation is value-equivalent to the Spark
#: side's sorted-array head/tail split: within a bucket rn orders by
#: doc_id, so `x.rn<=CAP AND (y.rn<=CAP OR x.rn=1)` = head×head pairs
#: plus (min, tail) star pairs.
_MINHASH_CAND_SQL = f"""
    {_SHINGLES_SQL},
    hashes AS (
      SELECT doc_id, i,
             MIN(md5(CAST(i AS VARCHAR) || ':' || sh)) AS mh
      FROM shingles CROSS JOIN generate_series(0, {_N_MINHASH - 1}) t(i)
      GROUP BY doc_id, i),
    bands AS (
      SELECT doc_id, i // {_N_MINHASH // _N_BANDS} AS band,
             string_agg(mh, ',' ORDER BY i) AS band_sig
      FROM hashes GROUP BY doc_id, band),
    ranked AS (
      SELECT doc_id, band, band_sig,
             ROW_NUMBER() OVER (PARTITION BY band, band_sig
                                ORDER BY doc_id) AS rn
      FROM bands),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM ranked x JOIN ranked y
        ON x.band = y.band AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id
      WHERE x.rn <= {_MAX_BUCKET_IDS}
        AND (y.rn <= {_MAX_BUCKET_IDS} OR x.rn = 1))
"""


@q(
    "q_minhash_lsh",
    f"""
    WITH {_MINHASH_CAND_SQL}
    SELECT a, b FROM cand
    """,
)
def q_minhash_lsh(spark, sf_dir):
    """MinHash(8) over 3-gram shingles + LSH banding (2 bands × 4 rows):
    candidate near-dup pairs sharing a full band signature, with the
    degenerate-bucket cap (_MAX_BUCKET_IDS). Hash family = md5(i:shingle)
    — engine portable and deterministic."""
    return _minhash_pairs_df(spark, sf_dir)


def _minhash_pairs_df(spark, sf_dir):
    return _minhash_pairs_from(_shingles_df(spark, sf_dir))


def _minhash_pairs_from(shingles):
    # The hash family is compile-time constant (_N_MINHASH members), so
    # all minima are computed as parallel aggregate expressions in ONE
    # groupBy(doc_id) — no broadcast row-expansion join, no second
    # shuffle (the crossJoin(range(N)) formulation costs an N× row blowup
    # plus a groupBy(doc_id, i) AND a groupBy(doc_id, band) exchange).
    rows_per_band = _N_MINHASH // _N_BANDS
    mh = shingles.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.encode(F.concat(F.lit(f"{i}:"), F.col("sh")), "UTF-8"))
            ).alias(f"mh{i}")
            for i in range(_N_MINHASH)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{b * rows_per_band + j}")
                        for j in range(rows_per_band)
                    ],
                ).alias("band_sig"),
            )
            for b in range(_N_BANDS)
        ]
    )
    bands = mh.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", "bs.band", "bs.band_sig"
    )
    # pair generation via bucket groupBy instead of a self-join: one pass
    # over the band table (a self-join would recompute the whole minhash
    # pipeline for each side), and the bucket is the shuffle key — the
    # scale-out shape for LSH candidate generation.
    buckets = bands.groupBy("band", "band_sig").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    return _capped_bucket_pairs(buckets)


def _capped_bucket_pairs(buckets):
    """(a, b) candidate pairs from a DF with a sorted-id-array column
    `ids`, one row per LSH bucket. Degenerate buckets (mostly-duplicate
    corpora) are capped: full pairs among the _MAX_BUCKET_IDS smallest
    ids, star pairs (min, t) for the overflow — output linear in bucket
    size beyond the cap, dedup connectivity preserved."""
    head = F.slice(F.col("ids"), 1, _MAX_BUCKET_IDS)
    tail = F.slice(
        F.col("ids"),
        _MAX_BUCKET_IDS + 1,
        F.greatest(F.size("ids") - _MAX_BUCKET_IDS, F.lit(0)),
    )
    head_pairs = F.flatten(
        F.transform(
            head,
            lambda x, i: F.transform(
                F.slice(
                    head,
                    i + F.lit(2),
                    F.greatest(F.size(head) - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    star_pairs = F.transform(
        tail,
        lambda t: F.struct(
            F.element_at(F.col("ids"), 1).alias("a"), t.alias("b")
        ),
    )
    pairs = buckets.filter(F.size("ids") > 1).select(
        F.explode(F.concat(head_pairs, star_pairs)).alias("p")
    )
    return pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b")).distinct()


#: CTE chain ending in `vpairs(a, b, jaccard)` — the LSH-verified
#: near-dup pairs, shared by q_dedup_lsh_verified and q_dedup_clusters.
_VERIFIED_PAIRS_SQL = f"""
    {_MINHASH_CAND_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.a, c.b, COUNT(*) AS i
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.a
      JOIN shingles sb ON sb.doc_id = c.b AND sb.sh = sa.sh
      GROUP BY c.a, c.b),
    vpairs AS (
      SELECT a, b, ROUND(i * 1.0 / (za.sz + zb.sz - i), 4) AS jaccard
      FROM inter
      JOIN sizes za ON za.doc_id = a
      JOIN sizes zb ON zb.doc_id = b
      WHERE i * 1.0 / (za.sz + zb.sz - i) >= 0.2)
"""


@q(
    "q_dedup_lsh_verified",
    f"""
    WITH {_VERIFIED_PAIRS_SQL}
    SELECT a, b, jaccard FROM vpairs
    """,
)
def q_dedup_lsh_verified(spark, sf_dir):
    """The composed scale path for shingle dedup: MinHash-LSH candidate
    pairs (q_minhash_lsh) → exact Jaccard computed ONLY for candidates.
    The shingle joins are keyed by the candidate pair set (equi-joins on
    doc_id then (doc_id, sh)), never a full shingle×shingle self-join —
    at 100 TB the candidate set is ~linear in corpus size, so the verify
    stage is too (vs the full-corpus quadratic q_dedup_ngram_jaccard)."""
    return _verified_pairs_df(spark, sf_dir)


def _verified_pairs_df(spark, sf_dir):
    # The shingle table feeds FOUR subtrees (minhash candidates, both
    # sides of the intersection join, the size table); without an
    # explicit persist Catalyst recomputes it per reference — measured
    # 10 scans of the documents parquet in one plan. At 100 TB you
    # materialize the shingle table once (cache/table), never 4×.
    shingles = _shingles_df(spark, sf_dir).persist()
    cand = _minhash_pairs_from(shingles)
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = shingles.select(F.col("doc_id").alias("a"), "sh")
    sb = shingles.select(F.col("doc_id").alias("b"), "sh")
    inter = (
        cand.join(sa, "a")
        .join(sb, ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    za = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    zb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    jac = F.col("i") / (F.col("sza") + F.col("szb") - F.col("i"))
    return (
        inter.join(za, "a")
        .join(zb, "b")
        .filter(jac >= 0.2)
        .select("a", "b", F.round(jac, 4).alias("jaccard"))
    )


@q(
    "q_dedup_clusters",
    f"""
    WITH RECURSIVE {_VERIFIED_PAIRS_SQL},
    edges AS (SELECT a, b FROM vpairs UNION SELECT b, a FROM vpairs),
    walk(node, reach) AS (
      SELECT a AS node, a AS reach FROM edges
      UNION
      SELECT w.node, e.b AS reach FROM walk w JOIN edges e ON w.reach = e.a),
    reps AS (SELECT node, MIN(reach) AS rep FROM walk GROUP BY node)
    SELECT node AS doc_id, rep,
           CAST(COUNT(*) OVER (PARTITION BY rep) AS BIGINT)
             AS component_size
    FROM reps
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """Connected-components dedup clustering — the actual dedup
    DELIVERABLE: near-dup PAIRS (q_dedup_lsh_verified) folded into one
    canonical representative per document (component minimum), so a
    pipeline can keep exactly one doc per cluster. Spark side is
    iterative min-label propagation over O(V) label rows (each round:
    one equi-join on the frozen edge list + min-aggregate = one shuffle;
    converges in diameter rounds, and near-dup clusters are shallow —
    the bucket cap's star pairs bound within-bucket diameter at 2).
    component_size = members per component, via a window over the
    converged labels. Oracle = recursive CTE computing min reachable
    node; both emit (doc_id, rep, component_size) identically."""
    edges = _verified_pairs_df(spark, sf_dir).select("a", "b")
    edges = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)  # pairs table is tiny vs corpus;
        # freeze it so each propagation round doesn't replay the whole
        # MinHash pipeline
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    prev_sum = None
    for _ in range(30):
        labels = (
            edges.join(
                labels.select(F.col("node").alias("b"), "label"), "b"
            )
            .select(F.col("a").alias("node"), "label")
            .union(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # monotone convergence check: the label sum strictly decreases
        # until fixpoint (labels only ever shrink toward component min)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    w_sz = Window.partitionBy("label")
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("rep"),
        F.count("*").over(w_sz).cast("long").alias("component_size"),
    )


_N_SIMHASH_BITS = 16


#: Reusable CTE chain ending in `sigs(doc_id, simhash)` — shared by
#: q_simhash (signatures) and q_simhash_pairs (banded pair generation).
_SIMHASH_SQL = f"""
    {_WORDS_SQL},
    bits AS (
      SELECT doc_id, i,
             CASE WHEN SUM(CASE WHEN substr(
                    md5(CAST(i AS VARCHAR) || ':' || w), 1, 1)
                    IN ('0','1','2','3','4','5','6','7')
                  THEN 1 ELSE -1 END) > 0
                  THEN '1' ELSE '0' END AS bit
      FROM words CROSS JOIN generate_series(0, {_N_SIMHASH_BITS - 1}) t(i)
      GROUP BY doc_id, i),
    sigs AS (
      SELECT doc_id, string_agg(bit, '' ORDER BY i) AS simhash
      FROM bits GROUP BY doc_id)
"""


@q(
    "q_simhash",
    f"""
    WITH {_SIMHASH_SQL}
    SELECT doc_id, simhash FROM sigs
    """,
)
def q_simhash(spark, sf_dir):
    """SimHash(16 planes): bit_i = majority over tokens of the MSB of
    md5(i:token). Emits the signature per doc; q_simhash_pairs runs the
    banded pair generation over these signatures."""
    return _simhash_df(spark, sf_dir)


def _simhash_df(spark, sf_dir):
    # One groupBy(doc_id) with _N_SIMHASH_BITS parallel SUM expressions
    # (the plane family is compile-time constant) — no broadcast
    # row-expansion join, single shuffle, map-side partial agg.
    words = _words_df(spark, sf_dir)

    def sign(i):
        msb = F.substring(
            F.md5(F.encode(F.concat(F.lit(f"{i}:"), F.col("w")), "UTF-8")),
            1,
            1,
        )
        return F.when(
            msb.isin("0", "1", "2", "3", "4", "5", "6", "7"), F.lit(1)
        ).otherwise(F.lit(-1))

    totals = words.groupBy("doc_id").agg(
        *[F.sum(sign(i)).alias(f"t{i}") for i in range(_N_SIMHASH_BITS)]
    )
    simhash = F.concat(
        *[
            F.when(F.col(f"t{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(_N_SIMHASH_BITS)
        ]
    )
    return totals.select("doc_id", simhash.alias("simhash"))


_N_SIMHASH_BANDS = 4  # 4 bands × 4 bits → 100% recall for hamming ≤ 3


@q(
    "q_simhash_pairs",
    f"""
    WITH {_SIMHASH_SQL},
    sub AS (SELECT * FROM sigs WHERE doc_id < 100),
    sbands AS (
      SELECT doc_id, simhash, t.band,
             substr(simhash,
                    t.band * {_N_SIMHASH_BITS // _N_SIMHASH_BANDS} + 1,
                    {_N_SIMHASH_BITS // _N_SIMHASH_BANDS}) AS bsig
      FROM sub CROSS JOIN generate_series(0, {_N_SIMHASH_BANDS - 1}) t(band)),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                      x.simhash AS sa, y.simhash AS sb
      FROM sbands x JOIN sbands y
        ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id)
    SELECT a, b,
           CAST(len(list_filter(range(1, {_N_SIMHASH_BITS + 1}),
                i -> substr(sa, i, 1) <> substr(sb, i, 1))) AS BIGINT)
             AS hamming
    FROM cand
    WHERE len(list_filter(range(1, {_N_SIMHASH_BITS + 1}),
              i -> substr(sa, i, 1) <> substr(sb, i, 1))) <= 1
    """,
)
def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs end-to-end: band the 16-bit signature
    (4 bands × 4 bits — pigeonhole guarantees every hamming≤3 pair shares
    a band, so recall is exact for our hamming≤1 output), generate
    candidates per bucket, verify by exact Hamming distance. Pair
    generation is the same groupBy-bucket explode as q_minhash_lsh (one
    pass, bucket = shuffle key). At 100 TB you'd widen to a 64-bit
    signature (4×16-bit bands) for bucket selectivity; the 16-bit family
    here is the cross-engine-deterministic md5 variant. doc_id<100 keeps
    the gate output bounded on the near-dup-heavy synthetic corpus."""
    sigs = _simhash_df(spark, sf_dir).filter(F.col("doc_id") < 100)
    bits_per_band = _N_SIMHASH_BITS // _N_SIMHASH_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.substring(
                    "simhash", b * bits_per_band + 1, bits_per_band
                ).alias("bsig"),
            )
            for b in range(_N_SIMHASH_BANDS)
        ]
    )
    sbands = sigs.select(
        "doc_id", "simhash", F.explode(band_structs).alias("bs")
    ).select("doc_id", "simhash", "bs.band", "bs.bsig")
    buckets = sbands.groupBy("band", "bsig").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("ds")
    )
    pairs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("ds"),
                    i + F.lit(2),
                    F.greatest(F.size("ds") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(
                    x["doc_id"].alias("a"),
                    y["doc_id"].alias("b"),
                    x["simhash"].alias("sa"),
                    y["simhash"].alias("sb"),
                ),
            ),
        )
    )
    cand = (
        buckets.filter(F.size("ds") > 1)
        .select(F.explode(pairs).alias("p"))
        .select("p.*")
        .distinct()
    )
    ham = F.aggregate(
        F.sequence(F.lit(1), F.lit(_N_SIMHASH_BITS)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.substr(F.col("sa"), i, F.lit(1))
            != F.substr(F.col("sb"), i, F.lit(1)),
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= 1)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@q(
    "q_ann_cosine",
    """
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
          FROM embeddings),
    sims AS (
      SELECT qid, cid,
             list_dot_product(qe, ce)
               / (sqrt(list_dot_product(qe, qe))
                  * sqrt(list_dot_product(ce, ce))) AS sim
      FROM q CROSS JOIN c WHERE qid <> cid)
    SELECT qid, cid, ROUND(sim, 4) AS sim FROM (
      SELECT qid, cid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY ROUND(sim, 6) DESC, cid) AS rn
      FROM sims) WHERE rn <= 5
    """,
)
def q_ann_cosine(spark, sf_dir):
    """Brute-force cosine top-5 per query vector (the correctness
    baseline for ANN; the scale path is q_ann_lsh)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    cs = emb.select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    sims = (
        qs.crossJoin(F.broadcast(cs))
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            (
                _dot(F.col("qe"), F.col("ce"))
                / (
                    F.sqrt(_dot(F.col("qe"), F.col("qe")))
                    * F.sqrt(_dot(F.col("ce"), F.col("ce")))
                )
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc(F.round("sim", 6)), F.asc("cid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "cid", F.round("sim", 4).alias("sim"))
    )


_N_PLANES = 8


#: Reusable CTE chain ending in `vbuckets(vec_id, bucket)` — the
#: random-hyperplane LSH bucket per vector, shared by q_ann_lsh,
#: q_ann_bucketed and q_dedup_embedding_bucketed.
_EMB_BUCKETS_SQL = f"""
    dims AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    proj AS (
      SELECT vec_id, p,
             SUM(CASE WHEN substr(md5(CAST(p AS VARCHAR) || ','
                                  || CAST(d AS VARCHAR)), 1, 1)
                      IN ('0','1','2','3','4','5','6','7')
                 THEN x ELSE -x END) AS s
      FROM dims CROSS JOIN generate_series(0, {_N_PLANES - 1}) t(p)
      GROUP BY vec_id, p),
    vbuckets AS (
      SELECT vec_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                        ORDER BY p) AS bucket
      FROM proj GROUP BY vec_id)
"""


@q(
    "q_ann_lsh",
    f"""
    WITH {_EMB_BUCKETS_SQL}
    SELECT bucket, COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
    FROM vbuckets GROUP BY bucket
    """,
)
def q_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH bucketing (8 planes; hyperplane sign for
    (plane, dim) derived from md5 so both engines agree). Bucket stats;
    the actual per-bucket search is q_ann_bucketed."""
    return _emb_buckets_df(spark, sf_dir).groupBy("bucket").agg(
        F.count("*").alias("n_vectors"),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
    )


#: executor-side cache of (n_planes, dim) -> sign matrix
_SIGN_MATRICES: dict = {}


def _lsh_bits_udf(n_planes: int):
    """Vectorized hyperplane-LSH bit-string per embedding: an
    Arrow-batched pandas UDF doing ONE numpy matmul per batch — dense
    projections are linear algebra, the pandas-UDF sweet spot (built-in
    higher-order array functions evaluate interpreted per element,
    measured ~30x slower end-to-end, and building the 32-plane Column
    tree costs seconds of py4j round-trips). sign(p, d) = MSB of
    md5(f"{p},{d}") in 0-7 — the exact family the DuckDB oracle
    evaluates in SQL. FP-order margin: the smallest |projection| on the
    synthetic corpora is ~4e-6 vs ~1e-14 summation-order noise, so the
    emitted bits match the oracle's sequential sums deterministically.
    Zero shuffle: bucketing stays embarrassingly parallel in front of a
    100 TB scan."""
    @F.pandas_udf("string")
    def bits(emb: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        if len(emb) == 0:
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        dim = X.shape[1]
        S = _SIGN_MATRICES.get((n_planes, dim))
        if S is None:
            S = np.array(
                [
                    [
                        1.0
                        if hashlib.md5(f"{p},{d}".encode()).hexdigest()[0]
                        in "01234567"
                        else -1.0
                        for d in range(dim)
                    ]
                    for p in range(n_planes)
                ]
            )
            _SIGN_MATRICES[(n_planes, dim)] = S
        B = np.where(X @ S.T > 0, "1", "0")
        return pd.Series(["".join(row) for row in B])

    return bits


def _spread(spark, df):
    """Local/small-input guard: a tiny parquet table arrives as a single
    split, which would serialize per-row projection work onto one core.
    Widen to the session parallelism only when the scan has fewer splits
    than cores — at cluster scale (100 TB ⇒ thousands of splits) this is
    a no-op, so no gratuitous exchange is added to the big-data plan."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _emb_buckets_df(spark, sf_dir):
    # (vec_id, bucket): zero-shuffle vectorized bucketing.
    emb = _spread(
        spark, _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    return emb.select(
        "vec_id", _lsh_bits_udf(_N_PLANES)("embedding").alias("bucket")
    )


_COS_SQL = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)

#: Banded multi-table hyperplane LSH for embeddings. A single 8-plane
#: bucket (q_ann_lsh) has recall (1-θ/π)^8 ≈ 0.04 at cosine 0.5 — on
#: this corpus the 14 true near-dup pairs share NO single-table bucket
#: (measured). Banding restores recall exactly like MinHash banding:
#: with b bands of r planes, recall = 1 - (1 - (1-θ/π)^r)^b; measured
#: on this corpus: 8 bands → 9/14 dedup pairs, 16 bands → 14/14 with
#: candidates still 37% below all-pairs even at this tiny scale.
#: At 100 TB, r scales with log(n) for bucket selectivity and the
#: candidate fraction collapses.
_N_EMB_PLANES = 64
_N_EMB_BANDS = 16  # 16 bands × 4 planes

_EMB_BANDS_SQL = f"""
    dims AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    eproj AS (
      SELECT vec_id, p,
             SUM(CASE WHEN substr(md5(CAST(p AS VARCHAR) || ','
                                  || CAST(d AS VARCHAR)), 1, 1)
                      IN ('0','1','2','3','4','5','6','7')
                 THEN x ELSE -x END) AS s
      FROM dims CROSS JOIN generate_series(0, {_N_EMB_PLANES - 1}) t(p)
      GROUP BY vec_id, p),
    ebits AS (
      SELECT vec_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                        ORDER BY p) AS bits
      FROM eproj GROUP BY vec_id),
    ebands AS (
      SELECT vec_id, t.band,
             substr(bits, t.band * {_N_EMB_PLANES // _N_EMB_BANDS} + 1,
                    {_N_EMB_PLANES // _N_EMB_BANDS}) AS bsig
      FROM ebits CROSS JOIN generate_series(0, {_N_EMB_BANDS - 1}) t(band))
"""


def _emb_bands_df(spark, sf_dir):
    # (vec_id, band, bsig): one vectorized 32-plane bit-string per
    # vector (zero-shuffle, see _lsh_bits_udf), then the band split as
    # an explode over substrings. Same md5-derived hyperplane family as
    # _emb_buckets_df.
    emb = _spread(
        spark, _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    sigs = emb.select(
        "vec_id", _lsh_bits_udf(_N_EMB_PLANES)("embedding").alias("bits")
    )
    rpb = _N_EMB_PLANES // _N_EMB_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.substring("bits", b * rpb + 1, rpb).alias("bsig"),
            )
            for b in range(_N_EMB_BANDS)
        ]
    )
    return sigs.select("vec_id", F.explode(band_structs).alias("bs")).select(
        "vec_id", "bs.band", "bs.bsig"
    )


@q(
    "q_ann_bucketed",
    f"""
    WITH {_EMB_BANDS_SQL},
    cand AS (
      SELECT DISTINCT q.vec_id AS qid, t.vec_id AS cid
      FROM ebands q JOIN ebands t
        ON q.band = t.band AND q.bsig = t.bsig AND q.vec_id <> t.vec_id
      WHERE q.vec_id < 10),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
          FROM embeddings),
    sims AS (
      SELECT qid, cid,
             list_dot_product(cq.e, ct.e) / (cq.nrm * ct.nrm) AS sim
      FROM cand
      JOIN c cq ON cq.vec_id = qid
      JOIN c ct ON ct.vec_id = cid)
    SELECT qid, cid, ROUND(sim, 4) AS sim FROM (
      SELECT qid, cid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY ROUND(sim, 6) DESC, cid) AS rn
      FROM sims) WHERE rn <= 5
    """,
)
def q_ann_bucketed(spark, sf_dir):
    """The composed scale-path ANN: banded multi-table hyperplane LSH
    (16 bands × 4 planes) → candidates = vectors sharing ANY band with
    the query → exact cosine top-5 over candidates only. The query-side
    band table (n_queries × bands rows) is broadcast; the candidate
    join is an equi-join on (band, bsig) — never a cross join of the
    full embeddings table. Top-1 recall ≈ 1-(1-(1-θ/π)^4)^8 ≈ 0.83 at
    cosine 0.5 vs the brute-force q_ann_cosine baseline."""
    # bands feeds both the candidate side and the filtered query side
    bands = _emb_bands_df(spark, sf_dir).persist()
    qb = bands.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "band", "bsig"
    )
    cand = (
        bands.join(F.broadcast(qb), ["band", "bsig"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"))
        .distinct()
    )
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    # norms once per vector, not per pair — cuts 2/3 of the dot products
    emb = emb.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    cq = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    ct = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    sims = (
        cand.join(F.broadcast(cq), "qid")
        .join(ct, "cid")
        .select(
            "qid",
            "cid",
            (
                _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc(F.round("sim", 6)), F.asc("cid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "cid", F.round("sim", 4).alias("sim"))
    )


@q(
    "q_dedup_embedding_bucketed",
    f"""
    WITH {_EMB_BANDS_SQL},
    eranked AS (
      SELECT vec_id, band, bsig,
             ROW_NUMBER() OVER (PARTITION BY band, bsig
                                ORDER BY vec_id) AS rn
      FROM ebands),
    ecand AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM eranked x JOIN eranked y
        ON x.band = y.band AND x.bsig = y.bsig AND x.vec_id < y.vec_id
      WHERE x.rn <= {_MAX_BUCKET_IDS}
        AND (y.rn <= {_MAX_BUCKET_IDS} OR x.rn = 1)),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
          FROM embeddings)
    SELECT a, b, ROUND(sim, 4) AS sim FROM (
      SELECT a, b,
             list_dot_product(ca.e, cb.e) / (ca.nrm * cb.nrm) AS sim
      FROM ecand
      JOIN c ca ON ca.vec_id = a
      JOIN c cb ON cb.vec_id = b)
    WHERE ROUND(sim, 6) >= 0.45
    """,
)
def q_dedup_embedding_bucketed(spark, sf_dir):
    """The composed scale path for embedding dedup: banded multi-table
    LSH candidates (same structure as q_ann_bucketed, same degenerate-
    bucket cap as q_minhash_lsh) → exact cosine computed ONLY for
    candidate pairs, threshold 0.45 as in the all-pairs q_dedup_embedding
    baseline. Shuffle keys are (band, bsig) then the pair ids — per-
    bucket work quadratic in bucket size (capped), never in corpus
    size. Expected recall vs the baseline ≈ 0.83 at cosine 0.5 (banded
    LSH trade; r scales with log n at 100 TB)."""
    bands = _emb_bands_df(spark, sf_dir)
    buckets = bands.groupBy("band", "bsig").agg(
        F.array_sort(F.collect_list("vec_id")).alias("ids")
    )
    cand = _capped_bucket_pairs(buckets)
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # norms once per vector, not per pair — cuts 2/3 of the dot products;
    # persisted: emb anchors both pair sides (2 scans otherwise)
    emb = emb.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e")))).persist()
    ca = emb.select(
        F.col("vec_id").alias("a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    cb = emb.select(
        F.col("vec_id").alias("b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    sim = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(ca, "a")
        .join(cb, "b")
        .filter(F.round(sim, 6) >= 0.45)
        .select("a", "b", F.round(sim, 4).alias("sim"))
    )


_IVF_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


@q(
    "q_ann_ivf",
    f"""
    WITH dims AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS d,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    cent AS (SELECT label, d, AVG(x) AS cx FROM dims GROUP BY label, d),
    cents AS (SELECT label, list(cx ORDER BY d) AS c FROM cent GROUP BY label),
    q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id < 10),
    assign AS (
      SELECT qid, label FROM (
        SELECT qid, cents.label,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
                 ROUND({_IVF_COS.format(a='qe', b='c')}, 6) DESC,
                 cents.label) AS rn
        FROM q CROSS JOIN cents) WHERE rn = 1),
    cands AS (
      SELECT a.qid, e.vec_id AS cid, CAST(e.embedding AS DOUBLE[]) AS ce
      FROM assign a JOIN embeddings e ON e.label = a.label
      WHERE e.vec_id <> a.qid),
    sims AS (
      SELECT c2.qid, c2.cid, {_IVF_COS.format(a='q.qe', b='c2.ce')} AS sim
      FROM cands c2 JOIN q ON q.qid = c2.qid)
    SELECT qid, cid, ROUND(sim, 4) AS sim FROM (
      SELECT qid, cid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY ROUND(sim, 6) DESC, cid) AS rn
      FROM sims) WHERE rn <= 3
    """,
)
def q_ann_ivf(spark, sf_dir):
    """IVF-style ANN (the second scale path beside hyperplane LSH):
    coarse quantizer = per-label mean vectors (at 100 TB: k-means
    centroids, k ≈ sqrt(n)); queries assign to their nearest centroid
    (queries × k broadcast — the only intentional small cross join),
    then exact cosine top-3 ONLY within the assigned cell via an
    equi-join on the cell id. nprobe=1 here; multi-probe = top-p
    centroids per query, same plan shape."""
    # emb feeds the centroid reduce, the query side, and the candidate
    # join - persist so the base table is scanned once, not per reference
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    ).persist()
    dims = emb.select(
        "vec_id", "label", F.posexplode("e")
    ).withColumnsRenamed({"pos": "d", "col": "x"})
    cent = dims.groupBy("label", "d").agg(F.avg("x").alias("cx"))
    cents = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "cx"))),
            lambda s: s["cx"],
        ).alias("c")
    )
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    cos_qc = _dot(F.col("qe"), F.col("c")) / (
        F.sqrt(_dot(F.col("qe"), F.col("qe")))
        * F.sqrt(_dot(F.col("c"), F.col("c")))
    )
    w_assign = Window.partitionBy("qid").orderBy(
        F.desc(F.round(cos_qc, 6)), F.asc("label")
    )
    assign = (
        qs.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("qid", "label")
    )
    cands = (
        assign.join(emb, "label")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    )
    sims = cands.join(F.broadcast(qs), "qid").select(
        "qid",
        "cid",
        (
            _dot(F.col("qe"), F.col("ce"))
            / (
                F.sqrt(_dot(F.col("qe"), F.col("qe")))
                * F.sqrt(_dot(F.col("ce"), F.col("ce")))
            )
        ).alias("sim"),
    )
    w_top = Window.partitionBy("qid").orderBy(F.desc(F.round("sim", 6)), F.asc("cid"))
    return (
        sims.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= 3)
        .select("qid", "cid", F.round("sim", 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_LANG_WORDS = [
    ("en", "the and of to in is that it was for"),
    ("de", "der die und das ist nicht mit ein auf den"),
    ("fr", "le les et des une est dans pour qui pas"),
    ("es", "el los que y en un una por con para"),
]

_LANG_VALUES_SQL = ", ".join(
    f"('{lang}', '{w}')" for lang, words in _LANG_WORDS for w in words.split()
)


@q(
    "q_langid",
    f"""
    WITH {_WORDS_SQL},
    langwords(lid, w) AS (VALUES {_LANG_VALUES_SQL}),
    scores AS (
      SELECT words.doc_id, langwords.lid, COUNT(*) AS hits
      FROM words JOIN langwords ON words.w = langwords.w
      GROUP BY words.doc_id, langwords.lid),
    best AS (
      SELECT doc_id, lid, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, lid) AS rn
      FROM scores)
    SELECT d.doc_id,
           COALESCE(b.lid, 'und') AS detected,
           COALESCE(b.hits, 0) AS hits
    FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    """,
)
def q_langid(spark, sf_dir):
    """Language ID by stopword-set voting (n-gram-free deterministic
    heuristic; argmax with lexicographic tie-break, 'und' if no hits)."""
    words = _words_df(spark, sf_dir)
    lw = spark.createDataFrame(
        [(lang, w) for lang, ws in _LANG_WORDS for w in ws.split()],
        "lid string, w string",
    )
    scores = (
        words.join(F.broadcast(lw), "w")
        .groupBy("doc_id", "lid")
        .agg(F.count("*").alias("hits"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("lid"))
    best = (
        scores.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lid", "hits")
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return docs.join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("lid", F.lit("und")).alias("detected"),
        F.coalesce("hits", F.lit(0)).alias("hits"),
    )


@q(
    "q_quality_score",
    """
    SELECT doc_id,
           n_tokens,
           ROUND(alpha_ratio, 4) AS alpha_ratio,
           ROUND(LEAST(1.0, n_tokens / 100.0) * 0.5 + alpha_ratio * 0.5, 4)
             AS quality
    FROM (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
               / NULLIF(length(text), 0) AS alpha_ratio
      FROM documents)
    """,
)
def q_quality_score(spark, sf_dir):
    """Quality scoring: token count + alphabetic-character ratio blended
    into a [0,1] score (length/punct heuristics)."""
    docs = _t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) / F.nullif(
        F.length("text").cast("double"), F.lit(0.0)
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(alpha, 4).alias("alpha_ratio"),
        F.round(
            F.least(F.lit(1.0), n_tokens / 100.0) * 0.5 + alpha * 0.5, 4
        ).alias("quality"),
    )


@q(
    "q_token_count",
    r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
           len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_ish_tokens
    FROM documents
    """,
)
def q_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (letters runs / single digits / punctuation marks)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long")
        .alias("ws_tokens"),
        F.regexp_count(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
        )
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


@q(
    "q_fingerprint",
    """
    SELECT doc_id,
           md5(lower(text)) AS fp,
           substr(md5(lower(text)), 1, 8) AS fp_prefix,
           length(text) AS n_chars_fp
    FROM documents
    """,
)
def q_fingerprint(spark, sf_dir):
    """Document fingerprinting: content hash + bucket prefix."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(F.encode(F.lower("text"), "UTF-8"))
    return docs.select(
        "doc_id",
        fp.alias("fp"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
        F.length("text").cast("long").alias("n_chars_fp"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary columns + Arrow batch metadata extraction)
# ---------------------------------------------------------------------------


@q(
    "q_multimodal_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) % 640 + 1 AS width,
           (octet_length(encode(text)) * 7) % 480 + 1 AS height,
           3 AS channels
    FROM documents
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: treat a binary payload column as an opaque
    media blob and extract typed metadata via mapInPandas over Arrow
    batches. The decode itself is a deterministic fake (real image/audio
    libs absent in this sandbox — SURVEY.md §0); schema, partitioning,
    UDF signature and batch shape are real and oracle-checked."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def meta_batches(batches):
        for pdf in batches:
            n_bytes = pdf["payload"].map(
                lambda b: len(b) if b is not None else 0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (n_bytes % 640 + 1).astype("int64"),
                    "height": (n_bytes * 7 % 480 + 1).astype("int64"),
                    "channels": 3,
                }
            )

    return docs.mapInPandas(
        meta_batches,
        schema="doc_id long, n_bytes long, width long, height long, channels int",
    )


def decode_image_stub(payload: bytes) -> dict:
    """Placeholder for a real image decode (PIL/opencv unavailable).

    At deployment, replace with a Pandas-UDF-wrapped decoder; the
    pipeline plumbing (binary column in, struct metadata out, Arrow
    batching) is exercised by q_multimodal_meta.
    """
    raise NotImplementedError(
        "image decode requires an imaging library not present in this sandbox"
    )


# ---------------------------------------------------------------------------
# O-9: oEmbed providers broadcast join (the A-16 registry as a dim table)
# ---------------------------------------------------------------------------

def _providers_values_sql() -> str:
    from readembedability_spark.extractor.oembed import OEMBED_PROVIDERS

    return ", ".join(
        f"('{host}', '{name}')" for host, name, _ in OEMBED_PROVIDERS
    )


@q(
    "q_join_oembed_providers",
    f"""
    WITH urls AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN 'youtube.com'
                  WHEN event_id % 7 = 1 THEN 'vimeo.com'
                  WHEN event_id % 7 = 2 THEN 'host' || CAST(event_id % 50 AS VARCHAR) || '.example.com'
                  WHEN event_id % 7 = 3 THEN 'soundcloud.com'
                  ELSE 'site' || CAST(event_id % 25 AS VARCHAR) || '.example.org'
             END AS host
      FROM events),
    providers(host, provider) AS (VALUES {{PROVIDERS}})
    SELECT COALESCE(p.provider, '(none)') AS provider, COUNT(*) AS n
    FROM urls u LEFT JOIN providers p ON u.host = p.host
    GROUP BY provider
    """.replace("{PROVIDERS}", _providers_values_sql()),
)
def q_join_oembed_providers(spark, sf_dir):
    """O-9: big fact (synthesized hosts) LEFT-broadcast-joined to the
    static oEmbed providers registry (extractor/oembed.py) — the exact
    shape of the pipeline's provider lookup at 10^12 rows."""
    from readembedability_spark.extractor.oembed import OEMBED_PROVIDERS

    providers = spark.createDataFrame(
        [(h, n) for h, n, _ in OEMBED_PROVIDERS], "host string, provider string"
    )
    ev = _t(spark, sf_dir, "events")
    host = (
        F.when(F.col("event_id") % 7 == 0, F.lit("youtube.com"))
        .when(F.col("event_id") % 7 == 1, F.lit("vimeo.com"))
        .when(
            F.col("event_id") % 7 == 2,
            F.concat(
                F.lit("host"),
                (F.col("event_id") % 50).cast("string"),
                F.lit(".example.com"),
            ),
        )
        .when(F.col("event_id") % 7 == 3, F.lit("soundcloud.com"))
        .otherwise(
            F.concat(
                F.lit("site"),
                (F.col("event_id") % 25).cast("string"),
                F.lit(".example.org"),
            )
        )
    )
    urls = ev.select("event_id", host.alias("host"))
    return (
        urls.join(F.broadcast(providers), "host", "left")
        .groupBy(F.coalesce("provider", F.lit("(none)")).alias("provider"))
        .agg(F.count("*").alias("n"))
    )


@q(
    "q_dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
      FROM shingles a JOIN shingles b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT a, b, ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2
    """,
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs by 3-gram-shingle Jaccard (inverted-index join on
    the shingle — the exact-verify stage run after MinHash-LSH candidate
    generation at scale)."""
    shingles = _shingles_df(spark, sf_dir)
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa_ = shingles.alias("sa_")
    sb_ = shingles.alias("sb_")
    inter = (
        sa_.join(
            sb_,
            (F.col("sa_.sh") == F.col("sb_.sh"))
            & (F.col("sa_.doc_id") < F.col("sb_.doc_id")),
        )
        .groupBy(F.col("sa_.doc_id").alias("a"), F.col("sb_.doc_id").alias("b"))
        .agg(F.count("*").alias("i"))
    )
    sza = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    szb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    jac = F.col("i") / (F.col("sza") + F.col("szb") - F.col("i"))
    return (
        inter.join(sza, "a")
        .join(szb, "b")
        .filter(jac >= 0.2)
        .select("a", "b", F.round(jac, 4).alias("jaccard"))
    )


@q(
    "q_dedup_embedding",
    """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[])))
                        AS nrm
               FROM embeddings)
    SELECT a, b, ROUND(sim, 4) AS sim FROM (
      SELECT a.vec_id AS a, b.vec_id AS b,
             list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS sim
      FROM c a JOIN c b ON a.vec_id < b.vec_id)
    WHERE ROUND(sim, 6) >= 0.45
    """,
)
def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (threshold 0.45 — the synthetic
    vectors are near-orthogonal, max pairwise cosine ≈ 0.51). This is
    the all-pairs CORRECTNESS BASELINE (O(n²) compares, measured 67s on
    just 2000 vectors at sf0.1); the scale path is the banded-LSH
    q_dedup_embedding_bucketed. Norms are precomputed per vector."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    emb = emb.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    a = emb.select(
        F.col("vec_id").alias("a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    sim = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(F.broadcast(b), F.col("a") < F.col("b"))
        .filter(F.round(sim, 6) >= 0.45)
        .select("a", "b", F.round(sim, 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# Edit-distance (Levenshtein) near-dup — the title/short-field dedup family
# ---------------------------------------------------------------------------


@q(
    "q_dedup_editdistance",
    """
    WITH heads AS (
      SELECT doc_id,
             array_to_string(list_slice(string_split(text, ' '), 1, 6), ' ')
               AS head,
             string_split(text, ' ')[1] AS w1
      FROM documents),
    cand AS (
      SELECT x.doc_id AS a, y.doc_id AS b, x.head AS ha, y.head AS hb
      FROM heads x JOIN heads y
        ON x.w1 = y.w1
       AND abs(length(x.head) - length(y.head)) <= 4
       AND x.doc_id < y.doc_id)
    SELECT a, b, CAST(levenshtein(ha, hb) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(ha, hb) <= 4
    """,
)
def q_dedup_editdistance(spark, sf_dir):
    """Edit-distance near-dup on short fields (title-style dedup): the
    6-word head of each doc, candidates BLOCKED on (first word) with a
    length-difference prefilter (|len diff| > k ⇒ levenshtein > k, so
    the filter is lossless), then exact Levenshtein ≤ 4 on candidates
    only. Blocking keys the join (equi-join on w1 — at 100 TB block on
    a stronger key, e.g. first-2-words fingerprint); the quadratic
    Levenshtein DP runs only on blocked candidate pairs."""
    docs = _t(spark, sf_dir, "documents")
    # heads anchors both sides of the blocking self-join - persist so
    # the text column is scanned once
    heads = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 6)).alias("head"),
        F.element_at(F.split("text", " "), 1).alias("w1"),
    ).persist()
    x = heads.select(
        F.col("doc_id").alias("a"), F.col("head").alias("ha"), "w1"
    )
    y = heads.select(
        F.col("doc_id").alias("b"), F.col("head").alias("hb"), "w1"
    )
    cand = x.join(y, "w1").filter(
        (F.abs(F.length("ha") - F.length("hb")) <= 4) & (F.col("a") < F.col("b"))
    )
    dist = F.levenshtein("ha", "hb")
    return (
        cand.filter(dist <= 4)
        .select("a", "b", dist.cast("long").alias("dist"))
    )


# ---------------------------------------------------------------------------
# TF-IDF term scoring — feature extraction for training-data pipelines
# ---------------------------------------------------------------------------


@q(
    "q_tfidf",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf
           FROM toks WHERE w <> '' GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY w),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w,
             tf.tf * ln(n.n * 1.0 / df.df) AS tfidf
      FROM tf JOIN df USING (w) CROSS JOIN n)
    SELECT doc_id, w, ROUND(tfidf, 4) AS tfidf FROM (
      SELECT doc_id, w, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY ROUND(tfidf, 6) DESC, w) AS rn
      FROM scored) WHERE rn <= 3
    """,
)
def q_tfidf(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (feature extraction / quality
    signals for training-data curation). Three shuffles — tf groupBy
    (doc_id, w), df groupBy(w), the w-keyed join — plus the per-doc
    window; corpus size N is a 1-row broadcast. Ranking ties broken on
    ROUND(tfidf, 6) then term so cross-engine ulp noise in ln() cannot
    flip ranks."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    # tf feeds both the df aggregation and the scored join — persist
    # so the (doc_id, w) aggregation happens once, not per reference
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").alias("tf")).persist()
    df = tf.groupBy("w").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("tfidf"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("tfidf", 6)), F.asc("w")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "w", F.round("tfidf", 4).alias("tfidf"))
    )


# ---------------------------------------------------------------------------
# End-to-end curation: the composition the training-data ops exist for
# ---------------------------------------------------------------------------


@q(
    "q_curation_pipeline",
    """
    WITH scored AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_tokens,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
               / NULLIF(length(text), 0) AS alpha_ratio,
             md5(text) AS h
      FROM documents),
    gated AS (
      SELECT * FROM scored
      WHERE lang IN ('en', 'de', 'fr')
        AND n_tokens >= 30
        AND alpha_ratio >= 0.6),
    keep AS (
      SELECT doc_id, lang, n_tokens, h,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY h) AS n_dups
      FROM gated)
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_dups AS BIGINT) AS n_dups
    FROM keep WHERE rn = 1
    """,
)
def q_curation_pipeline(spark, sf_dir):
    """The end-to-end curation composition the training-data operators
    exist for: language allowlist → quality gates (token count +
    alphabetic ratio) → exact dedup keeping the lowest doc_id per
    content hash, emitting the curated set with duplicate multiplicity.
    One shuffle (the dedup window on the content hash) — the quality
    gates are row-local and push into the scan; at 100 TB swap the
    exact-dedup window for the MinHash-LSH → verify → cluster chain
    (q_minhash_lsh → q_dedup_lsh_verified → q_dedup_clusters) keyed by
    cluster rep instead of md5."""
    docs = _t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) / F.nullif(
        F.length("text").cast("double"), F.lit(0.0)
    )
    gated = (
        docs.select(
            "doc_id",
            "lang",
            n_tokens.alias("n_tokens"),
            alpha.alias("alpha_ratio"),
            F.md5(F.encode("text", "UTF-8")).alias("h"),
        )
        .filter(F.col("lang").isin("en", "de", "fr"))
        .filter((F.col("n_tokens") >= 30) & (F.col("alpha_ratio") >= 0.6))
    )
    w_keep = Window.partitionBy("h").orderBy("doc_id")
    w_cnt = Window.partitionBy("h")
    return (
        gated.withColumn("rn", F.row_number().over(w_keep))
        .withColumn("n_dups", F.count("*").over(w_cnt))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_dups").cast("long").alias("n_dups"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rules + within-document repetition signals
# ---------------------------------------------------------------------------


@q(
    "q_gopher_rules",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tok_stats AS (
      SELECT doc_id,
             COUNT(*) AS n_tokens,
             AVG(length(w)) AS mean_wl,
             SUM(CASE WHEN w IN ('the','and','of','to','in','is','that',
                                 'it','was','for') THEN 1 ELSE 0 END) * 1.0
               / COUNT(*) AS stop_frac
      FROM toks WHERE w <> '' GROUP BY doc_id),
    chars AS (
      SELECT doc_id,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
               / NULLIF(length(text), 0) AS sym_ratio
      FROM documents)
    SELECT t.doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(mean_wl, 4) AS mean_word_len,
           ROUND(stop_frac, 4) AS stop_frac,
           ROUND(sym_ratio, 4) AS symbol_ratio,
           CAST(mean_wl BETWEEN 3 AND 10
                AND sym_ratio <= 0.1
                AND n_tokens BETWEEN 50 AND 100000 AS BOOLEAN) AS passes
    FROM tok_stats t JOIN chars c ON t.doc_id = c.doc_id
    """,
)
def q_gopher_rules(spark, sf_dir):
    """Gopher-style document quality rules (mean word length bounds,
    symbol-to-char ratio, token-count bounds, stopword fraction as a
    signal) — the rule family large-scale curation pipelines apply
    before training. All row-local or one groupBy(doc_id): map-side
    partial agg, no joins beyond the stats merge."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    stop = ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for")
    tok_stats = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.avg(F.length("w")).alias("mean_wl"),
        (
            F.sum(F.when(F.col("w").isin(*stop), 1).otherwise(0))
            / F.count("*")
        ).alias("stop_frac"),
    )
    chars = docs.select(
        "doc_id",
        (
            F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", ""))
            / F.nullif(F.length("text").cast("double"), F.lit(0.0))
        ).alias("sym_ratio"),
    )
    passes = (
        F.col("mean_wl").between(3, 10)
        & (F.col("sym_ratio") <= 0.1)
        & F.col("n_tokens").between(50, 100000)
    )
    return (
        tok_stats.join(chars, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("mean_wl", 4).alias("mean_word_len"),
            F.round("stop_frac", 4).alias("stop_frac"),
            F.round("sym_ratio", 4).alias("symbol_ratio"),
            passes.alias("passes"),
        )
    )


@q(
    "q_doc_repetition",
    """
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS i,
             unnest(string_split(text, ' ')) AS w
      FROM documents),
    big AS (
      SELECT doc_id,
             lag(w) OVER (PARTITION BY doc_id ORDER BY i) || ' ' || w AS bg
      FROM toks),
    cnt AS (
      SELECT doc_id, bg, COUNT(*) AS c
      FROM big WHERE bg IS NOT NULL GROUP BY doc_id, bg),
    tot AS (
      SELECT doc_id, MAX(c) AS m, SUM(c) AS t FROM cnt GROUP BY doc_id)
    SELECT doc_id, CAST(m AS BIGINT) AS top_bigram_count,
           ROUND(m * 1.0 / t, 4) AS top_bigram_frac
    FROM tot
    """,
)
def q_doc_repetition(spark, sf_dir):
    """Within-document repetition signal (Gopher's repetition family):
    the most frequent bigram's share of all bigrams — high values flag
    boilerplate/spam/generated loops. Bigrams via a lag window over
    token positions (no self-join); two aggregations, both keyed by
    doc_id so the shuffle is one exchange reused."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " "))
    ).withColumnsRenamed({"pos": "i", "col": "w"})
    w_lag = Window.partitionBy("doc_id").orderBy("i")
    big = toks.select(
        "doc_id",
        F.concat_ws(" ", F.lag("w").over(w_lag), F.col("w")).alias("bg"),
        F.lag("w").over(w_lag).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    cnt = big.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("doc_id").agg(
        F.max("c").alias("m"), F.sum("c").alias("t")
    )
    return tot.select(
        "doc_id",
        F.col("m").cast("long").alias("top_bigram_count"),
        F.round(F.col("m") / F.col("t"), 4).alias("top_bigram_frac"),
    )
