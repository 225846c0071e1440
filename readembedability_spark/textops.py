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


@q(
    "q_minhash_lsh",
    f"""
    WITH {_SHINGLES_SQL},
    hashes AS (
      SELECT doc_id, i,
             MIN(md5(CAST(i AS VARCHAR) || ':' || sh)) AS mh
      FROM shingles CROSS JOIN generate_series(0, {_N_MINHASH - 1}) t(i)
      GROUP BY doc_id, i),
    bands AS (
      SELECT doc_id, i // {_N_MINHASH // _N_BANDS} AS band,
             string_agg(mh, ',' ORDER BY i) AS band_sig
      FROM hashes GROUP BY doc_id, band)
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.band_sig = y.band_sig
     AND x.doc_id < y.doc_id
    """,
)
def q_minhash_lsh(spark, sf_dir):
    """MinHash(8) over 3-gram shingles + LSH banding (2 bands × 4 rows):
    candidate near-dup pairs sharing a full band signature. Hash family
    = md5(i:shingle) — engine portable and deterministic."""
    rows_per_band = _N_MINHASH // _N_BANDS
    shingles = _shingles_df(spark, sf_dir)
    idx = spark.range(_N_MINHASH).select(F.col("id").cast("int").alias("i"))
    hashes = (
        shingles.crossJoin(F.broadcast(idx))
        .select(
            "doc_id",
            "i",
            F.md5(
                F.encode(
                    F.concat(F.col("i").cast("string"), F.lit(":"), F.col("sh")),
                    "UTF-8",
                )
            ).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
    )
    bands = (
        hashes.withColumn("band", (F.col("i") / rows_per_band).cast("long"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "mh"))),
                    lambda s: s["mh"],
                ),
            ).alias("band_sig")
        )
    )
    # pair generation via bucket groupBy instead of a self-join: one pass
    # over the band table (a self-join would recompute the whole minhash
    # pipeline for each side), and the bucket is the shuffle key — the
    # scale-out shape for LSH candidate generation.
    buckets = bands.groupBy("band", "band_sig").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    pairs = buckets.filter(F.size("ids") > 1).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ids"),
                            i + F.lit(2),
                            F.greatest(F.size(F.col("ids")) - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b")).distinct()


_N_SIMHASH_BITS = 16


@q(
    "q_simhash",
    f"""
    WITH {_WORDS_SQL},
    bits AS (
      SELECT doc_id, i,
             CASE WHEN SUM(CASE WHEN substr(
                    md5(CAST(i AS VARCHAR) || ':' || w), 1, 1)
                    IN ('0','1','2','3','4','5','6','7')
                  THEN 1 ELSE -1 END) > 0
                  THEN '1' ELSE '0' END AS bit
      FROM words CROSS JOIN generate_series(0, {_N_SIMHASH_BITS - 1}) t(i)
      GROUP BY doc_id, i)
    SELECT doc_id, string_agg(bit, '' ORDER BY i) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def q_simhash(spark, sf_dir):
    """SimHash(16 planes): bit_i = majority over tokens of the MSB of
    md5(i:token). Emits the signature per doc; near-dup candidates are
    low-Hamming pairs (banding as in MinHash at scale)."""
    words = _words_df(spark, sf_dir)
    idx = spark.range(_N_SIMHASH_BITS).select(F.col("id").cast("int").alias("i"))
    msb = F.substring(
        F.md5(
            F.encode(
                F.concat(F.col("i").cast("string"), F.lit(":"), F.col("w")),
                "UTF-8",
            )
        ),
        1,
        1,
    )
    sign = F.when(
        msb.isin("0", "1", "2", "3", "4", "5", "6", "7"), F.lit(1)
    ).otherwise(F.lit(-1))
    bits = (
        words.crossJoin(F.broadcast(idx))
        .select("doc_id", "i", sign.alias("s"))
        .groupBy("doc_id", "i")
        .agg(F.sum("s").alias("total"))
        .select(
            "doc_id",
            "i",
            F.when(F.col("total") > 0, F.lit("1")).otherwise(F.lit("0")).alias("bit"),
        )
    )
    return bits.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "bit"))),
                lambda s: s["bit"],
            ),
        ).alias("simhash")
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


@q(
    "q_ann_lsh",
    f"""
    WITH dims AS (
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
    buckets AS (
      SELECT vec_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                        ORDER BY p) AS bucket
      FROM proj GROUP BY vec_id)
    SELECT bucket, COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
    FROM buckets GROUP BY bucket
    """,
)
def q_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH bucketing (8 planes; hyperplane sign for
    (plane, dim) derived from md5 so both engines agree). The scale-path
    ANN: cosine search then runs per-bucket instead of all-pairs."""
    emb = _t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).withColumnsRenamed({"pos": "d", "col": "x"})
    planes = spark.range(_N_PLANES).select(F.col("id").cast("int").alias("p"))
    msb = F.substring(
        F.md5(
            F.encode(
                F.concat(
                    F.col("p").cast("string"), F.lit(","), F.col("d").cast("string")
                ),
                "UTF-8",
            )
        ),
        1,
        1,
    )
    signed = F.when(
        msb.isin("0", "1", "2", "3", "4", "5", "6", "7"), F.col("x")
    ).otherwise(-F.col("x"))
    proj = (
        dims.crossJoin(F.broadcast(planes))
        .select("vec_id", "p", signed.alias("sx"))
        .groupBy("vec_id", "p")
        .agg(F.sum("sx").alias("s"))
    )
    buckets = (
        proj.select(
            "vec_id",
            "p",
            F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0")).alias("bit"),
        )
        .groupBy("vec_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "bit"))),
                    lambda s: s["bit"],
                ),
            ).alias("bucket")
        )
    )
    return buckets.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
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
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings)
    SELECT a.vec_id AS a, b.vec_id AS b,
           ROUND(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 4) AS sim
    FROM c a JOIN c b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.45
    """,
)
def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (threshold 0.45 — the synthetic
    vectors are near-orthogonal, max pairwise cosine ≈ 0.51). At scale
    this runs per-LSH-bucket (q_ann_lsh) instead of all-pairs."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    a = emb.select(F.col("vec_id").alias("a"), F.col("e").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("e").alias("eb"))
    sim = _dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(_dot(F.col("ea"), F.col("ea")))
        * F.sqrt(_dot(F.col("eb"), F.col("eb")))
    )
    return (
        a.join(F.broadcast(b), F.col("a") < F.col("b"))
        .filter(F.round(sim, 6) >= 0.45)
        .select("a", "b", F.round(sim, 4).alias("sim"))
    )
