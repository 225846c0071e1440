"""Generate the committed fixture pages (tests/fixtures/*) per FIXTURES.md §3.

Run once; outputs are committed so expected bytes stay frozen
(SURVEY.md §7 M0). Deterministic — no wall clock, no randomness beyond
seeded PRNG.

Usage: python fixtures/gen_fixtures.py
"""

from __future__ import annotations

import random
import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

LOREM = (
    "The committee published its findings after a long review, noting that "
    "the data, once aggregated, showed a consistent pattern across regions. "
    "Observers argued that the methodology, while imperfect, was the most "
    "transparent effort to date, and several independent analysts agreed."
)

PARA2 = (
    "In the second section, the authors describe how distributed systems "
    "handle partial failure, backpressure, and retries, emphasizing that "
    "idempotent operations, careful partitioning, and bounded queues are "
    "the backbone of any resilient large-scale pipeline."
)

PARA3 = (
    "Finally, the report concludes with recommendations: invest in "
    "observability, automate capacity planning, and treat data quality as "
    "a first-class engineering concern rather than an afterthought."
)

BOILER_NAV = (
    '<nav class="navbar"><a href="/">Home</a> <a href="/news">News</a> '
    '<a href="/about">About</a> <a href="/contact">Contact</a></nav>'
)
BOILER_SIDEBAR = (
    '<div class="sidebar"><h3>Related</h3><ul>'
    '<li><a href="/r1">Related one</a></li>'
    '<li><a href="/r2">Related two</a></li></ul></div>'
)
BOILER_FOOTER = (
    '<footer class="footer"><p>Copyright 2024 Example Site. '
    '<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
)
BOILER_COMMENTS = (
    '<div id="comments"><h3>Comments</h3>'
    "<p>First! Great article, totally agree with everything.</p>"
    "<p>I disagree strongly, see my blog for a rebuttal.</p></div>"
)


def shell(head: str, body: str) -> str:
    return (
        "<!doctype html>\n<html><head>\n<meta charset=\"utf-8\">\n"
        f"{head}\n</head>\n<body>\n{body}\n</body></html>\n"
    )


def article_body(extra: str = "") -> str:
    return (
        f"{BOILER_NAV}\n"
        f'<div class="article-content">\n'
        f"<h1>Understanding Large Scale Pipelines</h1>\n"
        f"{extra}"
        f"<p>{LOREM}</p>\n<p>{PARA2}</p>\n<p>{PARA3}</p>\n"
        f"</div>\n{BOILER_SIDEBAR}\n{BOILER_COMMENTS}\n{BOILER_FOOTER}"
    )


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    fx: dict[str, bytes] = {}

    # 1 plain article, no metadata
    fx["article_plain.html"] = shell(
        "<title>Understanding Large Scale Pipelines</title>", article_body()
    ).encode()

    # 2 opengraph
    fx["article_opengraph.html"] = shell(
        "<title>OG Article - Example Site</title>\n"
        '<meta property="og:title" content="The OpenGraph Headline">\n'
        '<meta property="og:description" content="A concise but sufficiently '
        'long description of the article for summary extraction purposes.">\n'
        '<meta property="og:image" content="https://cdn.example.com/lead.jpg">\n'
        '<meta property="og:url" content="https://example.com/og-article">\n'
        '<meta property="og:type" content="article">',
        article_body(),
    ).encode()

    # 3 json-ld
    fx["article_jsonld.html"] = shell(
        "<title>JSONLD Article</title>\n"
        '<script type="application/ld+json">{"@context":"https://schema.org",'
        '"@type":"NewsArticle","headline":"JSON-LD Headline Wins",'
        '"author":[{"@type":"Person","name":"Alice Writer"},'
        '{"@type":"Person","name":"Bob Reporter"}],'
        '"datePublished":"2024-05-02T08:15:00Z",'
        '"image":{"@type":"ImageObject","url":"https://cdn.example.com/ld.png"},'
        '"description":"Structured data description, long enough to qualify '
        'as the extracted summary for this fixture page."}</script>',
        article_body(),
    ).encode()

    # 4 twitter card only
    fx["article_twittercard.html"] = shell(
        "<title>TW Article</title>\n"
        '<meta name="twitter:title" content="Twitter Card Title">\n'
        '<meta name="twitter:description" content="Twitter card description '
        'that is definitely longer than forty characters total.">\n'
        '<meta name="twitter:image" content="//cdn.example.com/tw.jpg">',
        article_body(),
    ).encode()

    # 5 byline + time
    fx["article_byline.html"] = shell(
        "<title>Byline Article</title>",
        article_body(
            '<div class="byline">By A. One and B. Two</div>\n'
            '<time datetime="2023-11-20T14:00:00+01:00">Nov 20, 2023</time>\n'
        ),
    ).encode()

    # 6 date only in url (no head date)
    fx["article_url_date.html"] = shell(
        "<title>URL Date Article</title>", article_body()
    ).encode()

    # 7 oembed discovery + iframe player
    fx["oembed_discovery.html"] = shell(
        "<title>Watch: Video Page</title>\n"
        '<link rel="alternate" type="application/json+oembed" '
        'href="https://videos.example.com/oembed?url=x&format=json">',
        f"{BOILER_NAV}\n"
        '<div class="content"><iframe src="https://player.vimeo.com/video/123" '
        'width="640" height="360"></iframe>'
        f"<p>{LOREM}</p></div>\n{BOILER_FOOTER}",
    ).encode()

    # 8 provider-host page (url will be youtube.com in the test)
    fx["oembed_provider_host.html"] = shell(
        "<title>Provider Video</title>\n"
        '<meta property="og:type" content="video.other">',
        f'<div class="content"><p>{LOREM}</p></div>',
    ).encode()

    # 9 image gallery
    fx["images_gallery.html"] = shell(
        "<title>Gallery Article</title>",
        f"{BOILER_NAV}\n"
        '<div class="article-content">\n'
        "<h1>Gallery</h1>\n"
        '<img src="/sprites/icon-16.png" width="16" height="16">\n'
        '<img src="/ads/banner.gif" width="728" height="90">\n'
        f"<p>{LOREM}</p>\n"
        '<img src="/photos/hero-shot.jpg" width="1200" height="800" '
        'alt="Hero shot">\n'
        f"<p>{PARA2}</p>\n"
        '<img src="/photos/side.png" width="300" height="200">\n'
        f"<p>{PARA3}</p>\n</div>\n{BOILER_FOOTER}",
    ).encode()

    # 10 meta keywords + description
    fx["keywords_meta.html"] = shell(
        "<title>Keyword Article</title>\n"
        '<meta name="keywords" content="Spark, dataframes, Extraction, '
        'web crawling, spark">\n'
        '<meta name="description" content="A hand-written description of '
        'this page that is comfortably longer than forty characters.">',
        article_body(),
    ).encode()

    # 11 body keywords (repeated bigrams)
    kw_body = (
        '<div class="post-content"><h1>Stream Processing Notes</h1>'
        "<p>Stream processing engines manage stateful operators. Stream "
        "processing frameworks checkpoint operator state. Watermark handling "
        "lets stream processing tolerate late data, and watermark handling "
        "is essential for correct windows.</p>"
        "<p>Operator state grows with key cardinality; operator state must "
        "be compacted. Checkpoint intervals trade latency for recovery "
        "time, and checkpoint intervals should be tuned per workload.</p></div>"
    )
    fx["keywords_body.html"] = shell(
        "<title>Stream Processing Notes</title>", f"{BOILER_NAV}{kw_body}{BOILER_FOOTER}"
    ).encode()

    # 12 malformed
    fx["malformed.html"] = (
        "<!doctype html><html><head><title>Broken Page</title></head><body>"
        "<div class=content><p>First unclosed paragraph with plenty of text, "
        "commas, and general substance to score well"
        "<p>Second paragraph also unclosed, also substantial, with more than "
        "enough text to be a candidate"
        "<ul><li>item one<li>item two<li>item three</ul>"
        "</div></span></div>"
        "<table><tr><td>cell one<td>cell two<tr><td>cell three</table>"
        "<p>Trailing paragraph outside the table with sufficient length, "
        "commas, and words to matter.</body></html>"
    ).encode()

    # 13 latin-1 + BOM variant
    latin = (
        '<!doctype html><html><head><meta charset="iso-8859-1">'
        "<title>Caf\xe9 R\xe9sum\xe9</title></head><body>"
        '<div class="content"><p>Le caf\xe9 \xe9tait excellent, vraiment '
        "excellent, et la soir\xe9e fut longue, agr\xe9able, et m\xe9morable "
        "pour tous les participants pr\xe9sents.</p></div></body></html>"
    )
    fx["encoding_latin1.html"] = latin.encode("iso-8859-1")
    fx["encoding_bom.html"] = "﻿".join(
        ["", shell("<title>BOM Page</title>", f"<p>{LOREM}</p>")]
    ).encode("utf-8")

    # 14 title with site name
    fx["title_sitename.html"] = shell(
        "<title>Real Headline That Informs - Example Site</title>",
        article_body(),
    ).encode()

    # 15 tiny pdf (uncompressed + a flate variant appended object)
    content_stream = b"BT /F1 12 Tf 72 720 Td (Hello PDF world.) Tj ET\nBT 72 700 Td (Second line of text.) Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content_stream)).encode() + b" >>\n"
        b"stream\n" + content_stream + b"\nendstream\nendobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    fx["tiny_doc.pdf"] = pdf
    flate = zlib.compress(b"BT (Compressed stream text.) Tj ET")
    fx["tiny_doc_flate.pdf"] = (
        b"%PDF-1.4\n4 0 obj << /Length " + str(len(flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + flate
        + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )

    # 16 binary junk
    rng = random.Random(42)
    fx["binary_junk.bin"] = bytes(rng.randrange(256) for _ in range(4096))

    # 17 empty
    fx["empty.html"] = b""

    # 18 huge flat page (~2MB of sibling <p>)
    para = f"<p>{LOREM} {PARA2}</p>\n"
    n = (2 << 20) // len(para) + 1
    fx["huge_flat.html"] = shell(
        "<title>Huge Flat Page</title>", '<div class="content">' + para * n + "</div>"
    ).encode()

    # 19 unicode mixed
    fx["unicode_mixed.html"] = shell(
        "<title>Unicode Mixed 文章</title>",
        '<div class="article">'
        "<p>这是一段中文文本，"
        "包含标点符号，以及足够"
        "的内容来被选中。 Mixed with English, "
        "commas, and length for scoring purposes.</p>"
        "<p>مرحبا بالعا"
        "لم — RTL text with non-breaking spaces and "
        "emoji \U0001f680​ plus zero​width characters, enough "
        "text here to qualify as content.</p></div>",
    ).encode()

    # 20 display none decoy
    fx["display_none.html"] = shell(
        "<title>Hidden Decoy</title>",
        '<div class="content" style="display:none">'
        "<p>This hidden block pretends to be the main content, with lots of "
        "text, many commas, and deliberate length to tempt the scorer.</p></div>"
        f'<div class="article-body"><p>{LOREM}</p><p>{PARA2}</p></div>',
    ).encode()

    for name, data in sorted(fx.items()):
        (OUT / name).write_bytes(data)
        print(f"wrote {name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
