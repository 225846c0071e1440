"""Round-8 guarantees (VERDICT r07 tasks): the cumsum packing/stream
backbone derives its range-partition count from the live cluster —
the last constant-factor scale ceiling (parts=8) is gone — while the
straddler-offset collect stays bounded by the partition count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from readembedability_spark.textops import (
    _cumsum_parts,
    _grouped_cumsum,
    _ranked_cumsum,
)

SF_SMALL = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# VERDICT r07 wrong #1 — cluster-derived parallelism for the cumsum backbone
# ---------------------------------------------------------------------------


def test_cumsum_parts_derived_from_cluster(spark):
    """Default parts = max(defaultParallelism * 2, 16) — the repo's
    standard derivation idiom — never the old constant 8; an explicit
    integer still pins the layout for tests."""
    df = spark.range(1)
    expected = max(spark.sparkContext.defaultParallelism * 2, 16)
    assert _cumsum_parts(df, None) == expected
    assert expected >= 16  # the floor guards tiny local sessions
    assert _cumsum_parts(df, 8) == 8  # explicit override still honored


def test_ranked_cumsum_derived_parts_matches_window(spark):
    """With DERIVED parts (no explicit override), _ranked_cumsum still
    equals the global-window result exactly, and the physical plan
    carries the derived range-partition count."""
    rows = [(f"w{i:04d}", (i * 13) % 29 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "w string, c long")
    out = _ranked_cumsum(df, [F.desc("c"), F.asc("w")])
    derived = max(spark.sparkContext.defaultParallelism * 2, 16)
    # the range exchange the construction is built on carries the
    # derived count (the windows themselves re-shuffle on _pid)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    assert f"rangepartitioning" in plan and f", {derived})" in plan, plan
    got = {r["w"]: (r["rnk"], r["cum"]) for r in out.collect()}
    acc = 0
    exp = {}
    for rnk, (w, c) in enumerate(
        sorted(rows, key=lambda r: (-r[1], r[0])), start=1
    ):
        acc += c
        exp[w] = (rnk, acc)
    assert got == exp


def test_grouped_cumsum_derived_parts_straddler_bound(spark):
    """With derived parts the grouped construction stays exact AND the
    offset collect stays ≤ 2·(parts − 1) rows: at most parts − 1 range
    boundaries exist, so at most parts − 1 groups straddle one, each
    contributing ≤ 2 offset rows — REGARDLESS of group cardinality."""
    parts = max(spark.sparkContext.defaultParallelism * 2, 16)
    rows = [
        (f"g{g:03d}", i, (i * 3 + g) % 11 + 1)
        for g in range(300)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    # replicate the internal straddler-offset query and pin its size
    rp = df.repartitionByRange(
        parts, F.col("g"), F.col("i")
    ).withColumn("_pid", F.spark_partition_id())
    per = rp.groupBy("_pid", "g").count()
    straddler_offsets = (
        per.join(
            per.groupBy("g")
            .agg(F.count("*").alias("np"))
            .filter(F.col("np") > 1)
            .select("g"),
            "g",
        ).count()
    )
    assert straddler_offsets <= 2 * (parts - 1), straddler_offsets
    got = {
        (r["g"], r["i"]): (r["rnk"], r["cum"])
        for r in _grouped_cumsum(df, "g", ["i"], "v").collect()
    }
    exp = {}
    for g in range(300):
        acc = 0
        for rnk, i in enumerate(range(4), start=1):
            acc += (i * 3 + g) % 11 + 1
            exp[(f"g{g:03d}", i)] = (rnk, acc)
    assert got == exp


# ---------------------------------------------------------------------------
# VERDICT r07 #4 — Tm translation honored for PDF layout ordering
# ---------------------------------------------------------------------------


def _pdf(body: bytes) -> bytes:
    return b"%PDF-1.4\nstream\n" + body + b"\nendstream\n%%EOF"


def test_pdf_tm_translation_orders_lines():
    """A stream positioning exclusively via Tm (generated reports) gets
    layout order: blocks planted bottom-first re-sort top-to-bottom by
    the Tm translation (e, f)."""
    from readembedability_spark.extractor.pdftext import extract_pdf_text

    blob = _pdf(
        b"BT 1 0 0 1 72 600 Tm (below) Tj ET\n"
        b"BT 1 0 0 1 72 700 Tm (above) Tj ET"
    )
    assert extract_pdf_text(blob) == "above\nbelow"


def test_pdf_tm_mid_block_starts_new_line():
    """Tm inside a block flushes the current line and jumps to the new
    absolute position — scale/rotation components are ignored (D-7)."""
    from readembedability_spark.extractor.pdftext import extract_pdf_text

    blob = _pdf(
        b"BT 2 0 0 2 72 650 Tm (second) Tj "
        b"0.5 0 0 0.5 72 700 Tm (first) Tj ET"
    )
    assert extract_pdf_text(blob) == "first\nsecond"


def test_pdf_tm_then_td_moves_relative():
    """Td after Tm translates RELATIVE to the Tm position, so a
    Tm-anchored paragraph with Td line advances reads in order."""
    from readembedability_spark.extractor.pdftext import extract_pdf_text

    blob = _pdf(
        b"BT 1 0 0 1 100 500 Tm (para top) Tj 0 -14 Td (para next) Tj ET\n"
        b"BT 1 0 0 1 100 700 Tm (header) Tj ET"
    )
    assert extract_pdf_text(blob) == "header\npara top\npara next"


def test_pdf_tm_decimal_and_negative_components():
    """Tm components may be decimal/negative; only (e, f) position."""
    from readembedability_spark.extractor.pdftext import extract_pdf_text

    blob = _pdf(
        b"BT 1.0 0 0 -1.0 72.5 600.25 Tm (lo) Tj ET\n"
        b"BT -1 0.0 0 1 72.5 700.75 Tm (hi) Tj ET"
    )
    assert extract_pdf_text(blob) == "hi\nlo"


def test_pdf_no_positioning_still_stream_order_after_tm_change():
    """The Tm token branch must not disturb the no-positioning
    fallback: streams without any positioning ops keep stream order."""
    from readembedability_spark.extractor.pdftext import extract_pdf_text

    blob = _pdf(b"BT (one ) Tj (two.) Tj ET\nBT (three) Tj ET")
    assert extract_pdf_text(blob) == "one two.\nthree"


# ---------------------------------------------------------------------------
# VERDICT r07 #6 — warm-start PageRank converges to the full-recompute
# fixpoint
# ---------------------------------------------------------------------------


def test_pagerank_warm_start_converges_to_cold_fixpoint(spark):
    """Run the power loop to near-fixpoint (a) cold from uniform on
    the full rule graph and (b) warm-started from the prior-subgraph
    ranks — the affine contraction must land both at the SAME
    fixpoint, which is the correctness claim behind shipping only
    _PR_INC_ITERS incremental rounds per batch."""
    from readembedability_spark.textops import (
        _pagerank_loop,
        _rule_edges,
    )
    from pyspark.sql import functions as F

    full = _rule_edges(spark, SF_SMALL)
    old = _rule_edges(
        spark, SF_SMALL, ev_filter=F.col("event_id") % 5 != 0
    )
    cold = _pagerank_loop(spark, full, iters=14)
    warm0 = _pagerank_loop(spark, old)  # the production warm phase
    warm = _pagerank_loop(spark, full, iters=14, init=warm0)
    c = {r["v"]: r["r"] for r in cold.collect()}
    w = {r["v"]: r["r"] for r in warm.collect()}
    assert set(c) == set(w)
    gap = max(abs(c[v] - w[v]) for v in c)
    assert gap < 1e-6, gap
