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
