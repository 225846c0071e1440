"""Property-based invariants (hypothesis): the extractor must never
raise and must be bit-deterministic on ARBITRARY input — the properties
that keep a 10^12-row run from dying on page 10^11."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from readembedability_spark.extractor import extract_page
from readembedability_spark.extractor.decode import sniff_kind
from readembedability_spark.extractor.dom import parse_html
from readembedability_spark.extractor.result import ParseResult
from readembedability_spark.extractor.textify import textify

_STATUSES = {"ok", "empty", "non_html", "parse_error", "pdf", "oversize"}

# html-ish soup: tags, attrs, entities, text, brokenness
_tag_soup = st.text(
    alphabet=st.sampled_from(
        list("<>/=\"' abcdefghijklmnop&;!-\n\tp div table tr td li ul")
    ),
    max_size=400,
)


@settings(max_examples=150, deadline=None)
@given(_tag_soup)
def test_parse_and_textify_never_raise_and_deterministic(soup):
    r1 = parse_html(soup)
    r2 = parse_html(soup)
    assert textify(r1) == textify(r2)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_page_total_on_arbitrary_bytes(blob):
    row1 = extract_page("https://example.com/x", blob)
    row2 = extract_page("https://example.com/x", blob)
    assert row1["status"] in _STATUSES
    assert row1 == row2  # bit-determinism
    assert sniff_kind(blob) in {"html", "pdf", "image", "empty", "other"}


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["title", "image", "summary"]),
            st.text(min_size=1, max_size=10),
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        ),
        max_size=20,
    )
)
def test_parse_result_precedence(writes):
    """Final value of each field = first writer among max-confidence
    writers (strictly-higher overwrite rule)."""
    pr = ParseResult()
    for name, value, conf in writes:
        pr.set(name, value, conf)
    for field in {"title", "image", "summary"}:
        field_writes = [(v, c) for n, v, c in writes if n == field and c > 0]
        if not field_writes:
            assert pr.get(field) is None
            continue
        best_conf = max(c for _, c in field_writes)
        expected = next(v for v, c in field_writes if c == best_conf)
        assert pr.get(field) == expected
        assert pr.confidence(field) == best_conf


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_textify_output_whitespace_canonical(text):
    """No run of spaces, no leading/trailing whitespace, no zero-width
    chars in textify output."""
    out = textify(parse_html(f"<p>{text}</p>"))
    assert "  " not in out
    assert out == out.strip()
    assert "​" not in out and "﻿" not in out
