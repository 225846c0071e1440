"""Feed autodiscovery (F-1..F-5) unit tier — extractor/feeds.py.

Driver-gate coverage is q_extract_feeds (queries.py), which runs the
same rules end-to-end through extract_stage; this file pins each rule
in isolation so a gate hash-fail is attributable."""

from readembedability_spark.extractor.dom import parse_html
from readembedability_spark.extractor.feeds import extract_feeds
from readembedability_spark.extractor.meta import collect_meta
from readembedability_spark.extractor.pipeline import extract_page

PAGE = "https://news.example.com/a/b/article"


def _feeds(html: str, url: str = PAGE) -> list[str]:
    root = parse_html(html)
    return extract_feeds(collect_meta(root), url)


def test_basic_rss_and_atom_in_document_order():
    html = (
        '<head><link rel="alternate" type="application/atom+xml"'
        ' href="https://news.example.com/atom">'
        '<link rel="alternate" type="application/rss+xml"'
        ' href="https://news.example.com/rss"></head>'
    )
    assert _feeds(html) == [
        "https://news.example.com/atom",
        "https://news.example.com/rss",
    ]


def test_case_insensitive_rel_and_type_with_parameters():
    html = (
        '<link rel="ALTERNATE stylesheet"'
        ' type="APPLICATION/RSS+XML; charset=UTF-8" href="/feed">'
    )
    assert _feeds(html) == ["https://news.example.com/feed"]


def test_oembed_discovery_is_not_a_feed():
    html = (
        '<link rel="alternate" type="application/json+oembed"'
        ' href="https://news.example.com/oembed?u=1">'
        '<link rel="alternate" type="text/xml+oembed"'
        ' href="https://news.example.com/oembed.xml?u=1">'
    )
    assert _feeds(html) == []


def test_relative_resolution_against_page_url():
    # root-relative and path-relative both resolve against the page url
    html = (
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
        '<link rel="alternate" type="application/atom+xml" href="atom.xml">'
    )
    assert _feeds(html) == [
        "https://news.example.com/feed.xml",
        "https://news.example.com/a/b/atom.xml",
    ]


def test_fragment_stripped_and_ordered_dedup_first_wins():
    html = (
        '<link rel="alternate" type="application/rss+xml" href="/f#top">'
        '<link rel="alternate" type="application/atom+xml" href="/f#mid">'
        '<link rel="alternate" type="application/rss+xml" href="/g">'
    )
    assert _feeds(html) == [
        "https://news.example.com/f",
        "https://news.example.com/g",
    ]


def test_scheme_filter_and_lowercasing():
    html = (
        '<link rel="alternate" type="application/rss+xml"'
        ' href="feed://news.example.com/rss">'
        '<link rel="alternate" type="application/rss+xml"'
        ' href="HTTPS://News.example.com/rss">'
        '<link rel="alternate" type="application/atom+xml" href="">'
    )
    # feed:// dropped (F-4); scheme lowercased, host case preserved;
    # empty href dropped (F-2)
    assert _feeds(html) == ["https://News.example.com/rss"]


def test_rel_without_alternate_token_ignored():
    html = (
        '<link rel="alternates" type="application/rss+xml" href="/x">'
        '<link rel="stylesheet" type="application/rss+xml" href="/y">'
    )
    assert _feeds(html) == []


def test_pipeline_row_carries_feeds_and_empty_row_is_null():
    html = (
        "<html><head><title>T</title>"
        '<link rel="alternate" type="application/rss+xml" href="/feed">'
        "</head><body><p>some content here</p></body></html>"
    ).encode()
    row = extract_page(PAGE, html)
    assert row["feeds"] == ["https://news.example.com/feed"]
    empty = extract_page(PAGE, b"")
    assert empty["status"] == "empty" and empty["feeds"] is None
    nofeeds = extract_page(
        PAGE, b"<html><body><p>plain page</p></body></html>"
    )
    assert nofeeds["feeds"] is None
