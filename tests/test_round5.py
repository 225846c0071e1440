"""Round-5 guarantees (VERDICT r04 tasks): iteration-loop parallelism
derived from input row counts instead of hard-coded constants (BPE,
classifier training, PageRank), per-round BPE vocab checkpointing
(bounded plan growth), and the compact driver-parseable bench record.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import readembedability_spark.queries as queries
import readembedability_spark.textops as textops
from readembedability_spark.queries import (
    REGISTRY,
    _parts_for,
    _resize,
    release_caches,
)

SF_SMALL = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# _parts_for / _resize primitives
# ---------------------------------------------------------------------------


def test_parts_for_ceil_and_floor():
    assert _parts_for(0) == 1
    assert _parts_for(1) == 1
    assert _parts_for(queries.ITER_ROWS_PER_PART) == 1
    assert _parts_for(queries.ITER_ROWS_PER_PART + 1) == 2
    assert _parts_for(10 * queries.ITER_ROWS_PER_PART) == 10
    # explicit density override
    assert _parts_for(100, 10) == 10
    assert _parts_for(101, 10) == 11


def test_resize_shrink_is_narrow_grow_is_shuffle(spark):
    df = spark.range(0, 1000, 1, 8)
    assert _resize(df, 2).rdd.getNumPartitions() == 2
    assert _resize(df, 8) is df  # no-op at equal count
    assert _resize(df, 16).rdd.getNumPartitions() == 16
    # shrinking must be a narrow coalesce: no Exchange in the plan
    plan = _resize(df, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # growing repartitions (an Exchange is expected and required —
    # otherwise "grow" would silently stay at the old width)
    plan_g = _resize(df, 16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan_g, plan_g


# ---------------------------------------------------------------------------
# VERDICT r04 #3 — BPE pair-count stage runs multi-partition when the
# vocab is wide (partition count derived from vocab row count)
# ---------------------------------------------------------------------------


def test_bpe_vocab_parallelism_derived_from_rows(spark, monkeypatch):
    """With the partition density forced below the fixture's vocab
    size, the training vocab table (and therefore every round's
    pair-count stage input) must fan out to >1 partition — the old
    coalesce(1) pinned it to a single task at any scale — and the
    learned merge table must be IDENTICAL to the default-sizing run
    (training is partitioning-invariant: pair counts are exact
    integer sums)."""
    merges_default, words_default = textops._bpe_train(spark, SF_SMALL)
    # materialize BEFORE release_caches: the vocab is checkpoint-backed
    # and its truncated lineage cannot recompute after release
    b = {r["word"]: r["seq"] for r in words_default.collect()}
    release_caches(spark)

    n_vocab = textops._bpe_words(spark, SF_SMALL).count()
    assert n_vocab > 8  # fixture sanity: density below forces >1 part

    monkeypatch.setattr(queries, "ITER_ROWS_PER_PART", 8)
    merges_wide, words_wide = textops._bpe_train(spark, SF_SMALL)
    assert words_wide.rdd.getNumPartitions() == _parts_for(n_vocab, 8)
    assert words_wide.rdd.getNumPartitions() > 1
    assert merges_wide == merges_default
    # and the fully-merged vocab matches row-for-row
    a = {r["word"]: r["seq"] for r in words_wide.collect()}
    assert a == b
    release_caches(spark)


def test_bpe_round_plan_stays_bounded(spark, monkeypatch):
    """VERDICT r04 #4: each merge round localCheckpoints the rewritten
    vocab, so the final table's plan is a checkpoint scan whose size
    does NOT grow with the merge count (the old lazy replace-chain
    re-evaluated r stacked replaces at round r — O(R²) total work,
    unusable at realistic merge counts)."""
    monkeypatch.setattr(textops, "_BPE_MERGES", 4)
    _, words4 = textops._bpe_train(spark, SF_SMALL)
    plan4 = words4._jdf.queryExecution().executedPlan().toString()
    release_caches(spark)

    monkeypatch.setattr(textops, "_BPE_MERGES", 12)
    _, words12 = textops._bpe_train(spark, SF_SMALL)
    plan12 = words12._jdf.queryExecution().executedPlan().toString()
    release_caches(spark)

    # a checkpoint scan plan: no replace chain survives into it, and
    # tripling the merge count must not grow the plan materially
    assert "replace" not in plan12.lower(), plan12
    assert len(plan12) <= int(len(plan4) * 1.2) + 200, (
        len(plan4),
        len(plan12),
    )


# ---------------------------------------------------------------------------
# VERDICT r04 #3 — classifier-training parallelism derived from feats
# ---------------------------------------------------------------------------


def test_lrn_feats_parallelism_derived_from_rows(spark, monkeypatch):
    """The per-round doc-keyed shuffle width follows the doc-feature
    table's row count (the old coalesce(8) pinned 10 rounds × 2
    shuffles to parallelism 8 at any corpus size), and the trained
    weights are partitioning-invariant (exact fixed-point sums)."""
    monkeypatch.setattr(textops, "_LRN_ROUNDS", 2)
    feats_d, _, w_d = textops._lrn_train(spark, SF_SMALL)
    w_default = {r["b"]: r["w"] for r in w_d.collect()}
    release_caches(spark)

    monkeypatch.setattr(queries, "ITER_ROWS_PER_PART", 1000)
    feats_w, _, w_w = textops._lrn_train(spark, SF_SMALL)
    n_feats = feats_w.count()
    assert n_feats > 1000
    assert feats_w.rdd.getNumPartitions() == _parts_for(n_feats, 1000)
    assert feats_w.rdd.getNumPartitions() > 1
    assert {r["b"]: r["w"] for r in w_w.collect()} == w_default
    release_caches(spark)


# ---------------------------------------------------------------------------
# VERDICT r04 #3 — PageRank rank-table width derived from node count
# ---------------------------------------------------------------------------


def test_pagerank_partitioning_invariant(spark, monkeypatch):
    """Forcing the rank table multi-partition (density below the node
    count) must leave every node's PageRank unchanged — the resize is
    plumbing, not semantics — and mass still sums to ~1."""
    base = {
        r["node"]: r["pr"]
        for r in REGISTRY["q_pagerank"].spark(spark, SF_SMALL).collect()
    }
    release_caches(spark)
    monkeypatch.setattr(queries, "ITER_ROWS_PER_PART", 8)
    wide = {
        r["node"]: r["pr"]
        for r in REGISTRY["q_pagerank"].spark(spark, SF_SMALL).collect()
    }
    release_caches(spark)
    assert base == wide
    assert abs(sum(wide.values()) - 1.0) < 1e-3
