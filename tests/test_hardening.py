"""Zip-bomb / XSS / determinism hardening (ADVICE r01).

- gzip payloads that expand past MAX_HTML_BYTES are quarantined as
  status='oversize' WITHOUT materializing the decompressed bytes
- valid gzipped pages >1 MiB compressed still classify as html
  (gzip.decompress of a sliced stream used to EOFError -> 'other')
- javascript:/vbscript:/data: URLs cannot survive into content_html
- PDF FlateDecode bombs are skipped, not inflated
- dedup_latest is byte-stable under equal (warc_ts, length) ties
"""

from __future__ import annotations

import gzip
import hashlib
import zlib

from readembedability_spark.extractor import decode
from readembedability_spark.extractor.pipeline import MAX_HTML_BYTES, extract_page
from readembedability_spark.extractor.pdftext import extract_pdf_text
from readembedability_spark.extractor.sanitize import sanitize
from readembedability_spark.extractor.dom import parse_html


def _incompressible(n: int) -> bytes:
    """Deterministic pseudorandom bytes (sha256 counter stream)."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(str(i).encode()).digest()
        i += 1
    return bytes(out[:n])


def test_gzip_bomb_quarantined_as_oversize():
    bomb = gzip.compress(b"\x00" * (64 << 20))  # ~64 KiB -> 64 MiB
    assert len(bomb) < 1 << 20
    row = extract_page("http://x.example/bomb", bomb)
    # zeros sniff as non-HTML (head-only, no materialization); either
    # quarantine status is safe — the key property is no 64 MiB inflate
    assert row["status"] in ("oversize", "non_html")
    assert row["content_text"] is None


def test_gzip_bomb_wrapped_in_html_still_oversize():
    page = b"<html><body><p>" + b"a" * (32 << 20) + b"</p></body></html>"
    blob = gzip.compress(page)
    row = extract_page("http://x.example/big", blob)
    assert row["status"] == "oversize"


def test_large_valid_gzip_classifies_html():
    """Compressed size >1 MiB: the old gzip.decompress(blob[:1<<20])
    raised EOFError and misclassified the page as 'other'."""
    body = _incompressible(3 << 20).hex().encode()
    page = b"<html><head><title>T</title></head><body><p>" + body + b"</p></body></html>"
    blob = gzip.compress(page)
    assert len(blob) > 1 << 20
    assert decode.sniff_kind(blob) == decode.KIND_HTML
    # end-to-end: page decompresses under the cap and parses
    assert len(page) < MAX_HTML_BYTES
    row = extract_page("http://x.example/large", blob)
    assert row["status"] == "ok"
    assert row["title"] == "T"


def test_truncated_gzip_head_sniffable():
    page = b"<html><body>" + b"x" * 100_000 + b"</body></html>"
    blob = gzip.compress(page)[: 4 << 10]  # truncated stream
    assert decode.sniff_kind(blob) == decode.KIND_HTML


def test_gunzip_cap_raises_not_materializes():
    bomb = gzip.compress(b"\x00" * (64 << 20))
    try:
        decode.gunzip_if_needed(bomb, limit=1 << 20)
        raise AssertionError("expected OversizeDecompressed")
    except decode.OversizeDecompressed:
        pass
    # no limit -> full decompress still works
    assert len(decode.gunzip_if_needed(gzip.compress(b"ok"))) == 2


def _sanitize_fragment(html: str) -> str:
    root = parse_html(f"<html><body><div id='c'>{html}</div></body></html>")

    def find(el):
        for ch in getattr(el, "children", []):
            if not isinstance(ch, str):
                if ch.attrs.get("id") == "c":
                    return ch
                got = find(ch)
                if got is not None:
                    return got
        return None

    target = find(root)
    return sanitize(list(c for c in target.children if not isinstance(c, str)), "http://base.example/dir/")


def test_javascript_href_dropped():
    out = _sanitize_fragment('<p><a href="javascript:alert(1)">x</a></p>')
    assert "javascript:" not in out
    assert "<a>" in out  # element kept, attribute dropped


def test_obfuscated_scriptish_schemes_dropped():
    out = _sanitize_fragment('<p><a href="JaVa\tScRiPt:alert(1)">x</a>'
                             '<a href="vbscript:Evil()">y</a></p>')
    assert "script:" not in out.lower()


def test_data_url_kept_for_img_only():
    out = _sanitize_fragment(
        '<p><img src="data:image/png;base64,AAAA" alt="i"/>'
        '<a href="data:text/html,<script>1</script>">x</a></p>'
    )
    assert 'src="data:image/png;base64,AAAA"' in out
    assert 'href="data:' not in out


def test_relative_href_still_absolutized():
    out = _sanitize_fragment('<p><a href="../other">x</a></p>')
    assert 'href="http://base.example/other"' in out


def test_pdf_flate_bomb_skipped():
    inner = zlib.compress(b"BT (boom) Tj ET" + b"\x00" * (32 << 20))
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
           + inner + b"\nendstream\nendobj\n")
    # bombed stream is skipped -> no text, no OOM; function stays safe
    assert extract_pdf_text(pdf) == ""


def test_pdf_normal_flate_still_works():
    inner = zlib.compress(b"BT (hello) Tj ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
           + inner + b"\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == "hello"


def test_dedup_tiebreak_byte_stable(spark):
    from datetime import datetime

    from readembedability_spark.operators.dedup import dedup_latest

    ts = datetime(2024, 1, 1)
    a = b"<html>AAAA</html>"
    b_ = b"<html>BBBB</html>"  # same length, same ts
    rows = [("u", ts, a, None, None), ("u", ts, b_, None, None)]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    win1 = dedup_latest(spark.createDataFrame(rows, schema)).collect()[0]["html"]
    win2 = dedup_latest(spark.createDataFrame(rows[::-1], schema)).collect()[0]["html"]
    assert bytes(win1) == bytes(win2)


def test_pdf_stream_trailing_cr_not_clipped():
    """Compressed data whose last byte is 0x0D: the stream regex's EOL
    strip used to clip it, truncating the inflate (pre-existing bug
    exposed by the adversarial corpus)."""
    inner = zlib.compress(b"BT (hello pdf) Tj ET")
    assert inner.endswith(b"\r")  # the trigger condition
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
           + inner + b"\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == "hello pdf"


def _flate_obj(content: bytes) -> bytes:
    return (b"<< /Filter /FlateDecode >>\nstream\n"
            + zlib.compress(content) + b"\nendstream\n")


def test_pdf_multipage_stream_order():
    """Pages concatenate in stream (document) order."""
    pdf = (b"%PDF-1.4\n1 0 obj\n" + _flate_obj(b"BT (page one) Tj ET")
           + b"endobj\n2 0 obj\n" + _flate_obj(b"BT (page two) Tj ET")
           + b"endobj\n3 0 obj\n" + _flate_obj(b"BT (page three) Tj ET")
           + b"endobj\n")
    assert extract_pdf_text(pdf) == "page one\npage two\npage three"


def test_pdf_escaped_parens_and_octal():
    content = rb"BT (a \(quoted\) \\ backslash \101\102C octal) Tj ET"
    pdf = b"%PDF-1.4\n1 0 obj\n" + _flate_obj(content) + b"endobj\n"
    assert extract_pdf_text(pdf) == r"a (quoted) \ backslash ABC octal"


def test_pdf_tj_array_with_literals():
    content = b"BT [(Hel) -120 (lo ) (wor) 30 (ld)] TJ ET"
    pdf = b"%PDF-1.4\n1 0 obj\n" + _flate_obj(content) + b"endobj\n"
    assert extract_pdf_text(pdf) == "Hello world"


def test_giant_token_not_a_keyword():
    """A page whose body is one unbroken multi-MB token must not emit
    that token as a keyword (observed: 6 MB hex page -> 6 MB keyword)."""
    blob = _incompressible(1 << 20).hex()
    html = (f"<html><head><title>Hex</title></head><body><div>"
            f"<p>some words before the dump {blob}</p></div></body></html>").encode()
    row = extract_page("http://x.example/hex", html)
    assert row["status"] == "ok"
    for kw in row["keywords"] or []:
        assert len(kw) <= 101  # bigram of two <=50-char tokens max


def test_pdf_ascii_hex_stream():
    import binascii

    content = b"BT (Hex filtered text) Tj ET"
    body = binascii.hexlify(content) + b">"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /ASCIIHexDecode >>\nstream\n"
        + body + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "Hex filtered text"


def test_pdf_ascii85_flate_chain():
    """Filter chains apply in declaration order: ASCII85 then Flate."""
    import base64
    import zlib

    content = b"BT (Chained filters) Tj ET"
    body = base64.a85encode(zlib.compress(content), adobe=True)[2:]  # no <~
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n"
        + body + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "Chained filters"


def test_pdf_unknown_filter_skipped():
    """A DCTDecode (JPEG) stream is skipped, never crashes, and doesn't
    poison text from other streams."""
    good = b"BT (Visible) Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /DCTDecode >>\nstream\n"
        b"\xff\xd8\xff\xe0 garbage jpeg bytes\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length 20 >>\nstream\n" + good +
        b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "Visible"


def test_pdf_hex_odd_digit_padded():
    """Spec: an odd final hex digit implies a trailing '0' nibble — the
    stream still decodes instead of erroring out."""
    import binascii

    content = b"BT (Odd) Tj ET"
    # trailing lone nibble '5' -> pads to 0x50 ('P') AFTER the ET block
    body = binascii.hexlify(content) + b"5" + b">"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /ASCIIHexDecode >>\nstream\n"
        + body + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "Odd"
