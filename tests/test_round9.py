"""Round-9 optimization-focused tests: every operator whose INTERNALS
changed this round gets a boundary/equivalence probe beyond the
whole-query oracle parity tier.

Covered internals:
- _minhash_sigs_from: long-decoded mins re-hexed (%04x) must equal the
  naive MIN(string) over the hex slices (order isomorphism).
- _connected_components: the star-forest convergence probe must still
  produce exact component minima on shapes that need >1 contraction
  round (long chains), and on already-star inputs.
- q_cdc_chunks' array-land chunking: digests/boundaries on degenerate
  docs (shorter than the 4-gram window, empty text) match the oracle.
- _pair_intersections_from: i=0 pairs surface (not dropped) and counts
  equal the join-based intersection.
"""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from readembedability_spark import textops
from readembedability_spark.queries import release_caches


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    release_caches(spark)


def test_minhash_long_min_equals_string_min(spark):
    """%04x over MIN(long-decoded slice) == MIN(hex-string slice)."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(30)],
        "doc_id long, text string",
    )
    shingles = textops._shingles_from(docs)
    fast = textops._minhash_sigs_from(shingles)
    hashed = shingles.select(
        "doc_id", F.md5(F.encode("sh", "UTF-8")).alias("h")
    )
    naive = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.substring("h", i * 4 + 1, 4)).alias(f"mh{i}")
            for i in range(textops._N_MINHASH)
        ]
    )
    cols = ["doc_id"] + [f"mh{i}" for i in range(textops._N_MINHASH)]
    assert sorted(map(tuple, fast.select(cols).collect())) == sorted(
        map(tuple, naive.select(cols).collect())
    )


def _brute_cc(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # long chain: needs multiple contraction rounds
        [(i, i + 1) for i in range(1, 20)],
        # already a star forest: must stop after one probe
        [(10, 1), (11, 1), (12, 1), (21, 20)],
        # two components + a cycle
        [(1, 2), (2, 3), (3, 1), (7, 8)],
    ],
)
def test_cc_star_forest_convergence_exact(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["label"]
        for r in textops._connected_components(spark, df).collect()
    }
    assert got == _brute_cc(edges)


def test_cdc_chunks_degenerate_docs(spark, tmp_path):
    """Docs shorter than the 4-gram window (single chunk) and empty
    text (one empty-string token) chunk identically to the oracle's
    window formulation: one chunk spanning the whole array."""
    import duckdb

    docs = [
        (0, ""),  # split -> [""]
        (1, "a b"),  # below the p>=4 boundary window
        (4, "one two three four five six"),
        (7, "x " * 40),  # long enough to plant boundaries
    ]
    pdf = spark.createDataFrame(docs, "doc_id long, text string").toPandas()
    pdf.to_parquet(tmp_path / "documents.parquet")
    sdf = textops.REGISTRY["q_cdc_chunks"].spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(textops.REGISTRY["q_cdc_chunks"].sql).fetchall()

    def canon(rows):
        return sorted(tuple(str(v) for v in r) for r in rows)

    assert canon([tuple(r) for r in sdf.collect()]) == canon(oracle)


def test_pair_intersections_match_join_form(spark):
    """Array-intersect counts == the join-based posting intersection;
    zero-overlap candidate pairs surface with i=0."""
    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma delta epsilon eta",
        3: "one two three four five six",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    shingles = textops._shingles_from(docs)
    got = textops._pair_intersections_from(shingles)
    rows = {(r["a"], r["b"]): (r["i"], r["sza"], r["szb"]) for r in got.collect()}
    sh = {
        d: {
            " ".join(t.split()[k : k + 3])
            for k in range(len(t.split()) - 2)
        }
        for d, t in texts.items()
    }
    for (a, b), (i, sza, szb) in rows.items():
        assert i == len(sh[a] & sh[b])
        assert (sza, szb) == (len(sh[a]), len(sh[b]))
