"""A-1 content-kind dispatch + A-2 charset detect/decode.

Deterministic, dependency-free (no chardet — unavailable in sandbox,
SURVEY.md §0): BOM check → ``<meta charset>`` / http-equiv scan of the
first 2 KB → utf-8 with ``errors='replace'`` fallback.
"""

from __future__ import annotations

import codecs
import gzip
import re

KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_IMAGE = "image"
KIND_EMPTY = "empty"
KIND_OTHER = "other"

_HTML_MARKERS = (b"<!doctype", b"<html", b"<head", b"<body", b"<?xml")
_IMAGE_MAGIC = (
    b"\x89PNG\r\n\x1a\n",
    b"\xff\xd8\xff",  # jpeg
    b"GIF87a",
    b"GIF89a",
    b"RIFF",  # webp container
    b"BM",  # bmp
)

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
_BOMS = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def sniff_kind(blob: bytes | None) -> str:
    """Classify a raw blob by magic bytes (A-1).

    gzip blobs are classified by their decompressed head.
    """
    if blob is None or len(blob) == 0:
        return KIND_EMPTY
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = gzip.decompress(blob[: 1 << 20])
        except Exception:
            return KIND_OTHER
        if not blob:
            return KIND_EMPTY
    if blob[:5] == b"%PDF-":
        return KIND_PDF
    for magic in _IMAGE_MAGIC:
        if blob.startswith(magic):
            return KIND_IMAGE
    head = blob[:2048].lstrip()[:512].lower()
    for marker in _HTML_MARKERS:
        if head.startswith(marker):
            return KIND_HTML
    # tolerate leading comments / stray text before the first tag
    if b"<html" in head or b"<!doctype" in head:
        return KIND_HTML
    if head.startswith(b"<") and b">" in head:
        # tag-like start (e.g. fragment pages without doctype)
        return KIND_HTML
    return KIND_OTHER


def gunzip_if_needed(blob: bytes) -> bytes:
    if blob[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(blob)
        except Exception:
            return blob
    return blob


def _normalize_encoding(name: str) -> str | None:
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def detect_charset(blob: bytes) -> str:
    """Deterministic charset detection (A-2). Returns a codec name."""
    for bom, enc in _BOMS:
        if blob.startswith(bom):
            return enc
    m = _META_CHARSET_RE.search(blob[:2048])
    if m:
        enc = _normalize_encoding(m.group(1).decode("ascii", "replace"))
        if enc is not None:
            # utf-16 without a BOM is a lie on the web; treat as utf-8
            if enc.startswith("utf-16"):
                return "utf-8"
            return enc
    return "utf-8"


def decode_html(blob: bytes) -> str:
    """bytes → str, never raises (errors='replace')."""
    blob = gunzip_if_needed(blob)
    enc = detect_charset(blob)
    try:
        return blob.decode(enc, errors="replace")
    except Exception:
        return blob.decode("utf-8", errors="replace")
