"""A-1 kind sniff + A-2 charset decode."""

import gzip

from readembedability_spark.extractor.decode import (
    KIND_EMPTY,
    KIND_HTML,
    KIND_IMAGE,
    KIND_OTHER,
    KIND_PDF,
    decode_html,
    detect_charset,
    sniff_kind,
)


def test_sniff_kinds():
    assert sniff_kind(None) == KIND_EMPTY
    assert sniff_kind(b"") == KIND_EMPTY
    assert sniff_kind(b"%PDF-1.4 junk") == KIND_PDF
    assert sniff_kind(b"\x89PNG\r\n\x1a\nxxxx") == KIND_IMAGE
    assert sniff_kind(b"\xff\xd8\xff\xe0jpeg") == KIND_IMAGE
    assert sniff_kind(b"<!DOCTYPE html><html>") == KIND_HTML
    assert sniff_kind(b"  \n <html lang=en>") == KIND_HTML
    assert sniff_kind(b"<div>fragment</div>") == KIND_HTML
    assert sniff_kind(b"\x00\x01\x02\x03 arbitrary") == KIND_OTHER


def test_sniff_gzip_html():
    blob = gzip.compress(b"<!doctype html><html><body>x</body></html>")
    assert sniff_kind(blob) == KIND_HTML


def test_bom_utf8():
    blob = b"\xef\xbb\xbf<html><body>caf\xc3\xa9</body></html>"
    assert detect_charset(blob) == "utf-8-sig"
    assert "café" in decode_html(blob)
    assert "﻿" not in decode_html(blob)


def test_meta_charset_latin1():
    blob = (
        b'<html><head><meta charset="iso-8859-1"></head>'
        b"<body>caf\xe9</body></html>"
    )
    assert detect_charset(blob) == "iso8859-1"
    assert "café" in decode_html(blob)


def test_http_equiv_charset():
    blob = (
        b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">'
        b"<body>\x93quoted\x94</body>"
    )
    assert "“quoted”" in decode_html(blob)


def test_default_utf8_with_replacement():
    blob = b"<html><body>ok \xff\xfe broken</body></html>"
    out = decode_html(blob)
    assert "ok" in out and "broken" in out


def test_unknown_charset_falls_back():
    blob = b'<meta charset="not-a-charset"><body>x</body>'
    assert decode_html(blob)


def test_gunzip_multi_member():
    """WARC-style concatenated gzip members decompress end-to-end (ADVICE
    r02: the incremental loop used to stop at the first member's eof)."""
    from readembedability_spark.extractor.decode import gunzip_if_needed

    a = gzip.compress(b"<html><body>first member</body></html>")
    b = gzip.compress(b"<p>second member</p>")
    c = gzip.compress(b"tail member")
    assert gunzip_if_needed(a + b + c) == (
        b"<html><body>first member</body></html>"
        b"<p>second member</p>" b"tail member"
    )


def test_gunzip_multi_member_cap_spans_members():
    """The zip-bomb output cap applies across members, not per member."""
    import pytest

    from readembedability_spark.extractor.decode import (
        OversizeDecompressed,
        gunzip_if_needed,
    )

    members = b"".join(gzip.compress(b"x" * 1000) for _ in range(10))
    assert len(gunzip_if_needed(members, limit=20_000)) == 10_000
    with pytest.raises(OversizeDecompressed):
        gunzip_if_needed(members, limit=5_000)


def test_gunzip_multi_member_trailing_garbage():
    """Non-gzip trailing bytes after the last member are ignored (not an
    error, not emitted)."""
    from readembedability_spark.extractor.decode import gunzip_if_needed

    blob = gzip.compress(b"payload") + b"\x00\x01garbage"
    assert gunzip_if_needed(blob) == b"payload"


def test_gunzip_corrupt_later_member_keeps_decoded_prefix():
    """A corrupt SECOND member must not discard the valid first member:
    the decoded prefix is returned, not the raw compressed blob (ADVICE
    r03)."""
    from readembedability_spark.extractor.decode import gunzip_if_needed

    good = gzip.compress(b"<html><body>valid first member</body></html>")
    bad = b"\x1f\x8b\x08\x00" + b"\xff" * 32  # gzip magic, garbage stream
    out = gunzip_if_needed(good + bad)
    assert out.startswith(b"<html><body>valid first member")


def test_gunzip_corrupt_member_partial_fragment_dropped():
    """The salvage path truncates to the last FULLY-completed member:
    bytes the decompressor emitted for the corrupt member before the
    CRC/stream error must not leak to the caller (ADVICE r04)."""
    from readembedability_spark.extractor.decode import gunzip_if_needed

    good = gzip.compress(b"first-member-payload")
    # second member: valid gzip header + deflate stream whose TAIL is
    # corrupted, so some plaintext decodes before the error fires
    full_bad = bytearray(gzip.compress(b"SECOND" * 500))
    full_bad[-6:] = b"\x00" * 6  # smash the CRC32/ISIZE trailer
    out = gunzip_if_needed(bytes(good) + bytes(full_bad))
    assert out == b"first-member-payload"
    assert b"SECOND" not in out

    # and a corrupt FIRST member (no completed member at all) still
    # falls back to the raw blob, unchanged behavior
    only_bad = bytes(full_bad)
    assert gunzip_if_needed(only_bad) == only_bad


def test_bom_utf16_both_endians_sniff_and_strip():
    """UTF-16 HTML must sniff as HTML (the raw marker scan sees
    NUL-interleaved bytes) and decode with the BOM STRIPPED — the
    -le/-be codecs would leak U+FEFF as leading document text."""
    html = "<html><body>café</body></html>"
    for bom, enc in ((b"\xff\xfe", "utf-16-le"), (b"\xfe\xff", "utf-16-be")):
        blob = bom + html.encode(enc)
        assert sniff_kind(blob) == "html"
        assert detect_charset(blob) == "utf-16"
        out = decode_html(blob)
        assert "café" in out and "﻿" not in out


def test_bom_beats_lying_meta_declaration():
    """Precedence: a UTF-8 BOM wins over a lying iso-8859-1 meta
    declaration — decoding the meta way would double-decode accents."""
    blob = (
        b"\xef\xbb\xbf<html><head>"
        b'<meta charset="iso-8859-1"></head>'
        b"<body>na\xc3\xafve</body></html>"
    )
    assert detect_charset(blob) == "utf-8-sig"
    assert "naïve" in decode_html(blob)
    assert "naÃ¯ve" not in decode_html(blob)
