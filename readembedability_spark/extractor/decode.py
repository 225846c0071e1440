"""A-1 content-kind dispatch + A-2 charset detect/decode.

Deterministic, dependency-free (no chardet — unavailable in sandbox,
SURVEY.md §0): BOM check → ``<meta charset>`` / http-equiv scan of the
first 2 KB → utf-8 with ``errors='replace'`` fallback.
"""

from __future__ import annotations

import codecs
import re
import zlib


class OversizeDecompressed(Exception):
    """A gzip payload expanded past the caller's cap (zip-bomb guard):
    a ~150 KB gzip blob can inflate to 150 MB and drive ~1 GB worker
    RSS if decompressed unbounded."""

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
    # the 'utf-16' codec reads the BOM for endianness AND strips it —
    # the -le/-be codecs would leak U+FEFF as document text
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)


def sniff_kind(blob: bytes | None) -> str:
    """Classify a raw blob by magic bytes (A-1).

    gzip blobs are classified by their decompressed head.
    """
    if blob is None or len(blob) == 0:
        return KIND_EMPTY
    if blob[:2] == b"\x1f\x8b":
        # sniff only the decompressed head: gzip.decompress of a sliced
        # stream raises EOFError for any payload >slice (silently
        # dropping valid large pages), and a full decompress is a
        # zip-bomb vector. decompressobj needs neither a complete
        # stream nor unbounded output.
        try:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            blob = d.decompress(blob[:65536], 8192)
        except Exception:
            return KIND_OTHER
        if not blob:
            return KIND_EMPTY
    if blob[:5] == b"%PDF-":
        return KIND_PDF
    for magic in _IMAGE_MAGIC:
        if blob.startswith(magic):
            return KIND_IMAGE
    if blob[:2] in (codecs.BOM_UTF16_LE, codecs.BOM_UTF16_BE):
        # UTF-16 HTML exists on the web; the raw marker scan would see
        # NUL-interleaved bytes and misroute it to non_html. Re-sniff
        # the decoded head (the 'utf-16' codec strips the BOM).
        try:
            blob = blob[:4096].decode("utf-16", errors="replace").encode(
                "utf-8", errors="replace"
            )
        except Exception:
            return KIND_OTHER
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


def gunzip_if_needed(blob: bytes, limit: int | None = None) -> bytes:
    """Incremental gzip decompression with an output cap.

    Raises :class:`OversizeDecompressed` the moment output exceeds
    ``limit`` (never materializing the full payload), so callers can
    quarantine zip bombs as status='oversize' before parsing. Corrupt
    streams fall back to the raw bytes; truncated streams yield the
    decompressible prefix. Multi-member streams (the WARC-derived
    norm: one gzip member per record, concatenated) are decompressed
    member-by-member under the same running cap — a fresh decompressobj
    restarts on each member's unused_data."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    out = bytearray()
    member_end = 0  # bytes of `out` covered by fully-decoded members
    try:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        tail = blob
        while True:
            chunk = d.decompress(tail, 1 << 20)
            tail = d.unconsumed_tail
            if chunk:
                out += chunk
                if limit is not None and len(out) > limit:
                    raise OversizeDecompressed(len(out))
            elif not tail and not d.eof:
                break
            if d.eof:
                # member boundary: the CRC-checked member completed, so
                # everything decoded so far is trustworthy; restart on
                # the next member if the trailing bytes look like
                # another gzip header
                member_end = len(out)
                rest = d.unused_data
                if rest[:2] == b"\x1f\x8b":
                    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
                    tail = rest
                    continue
                break
        return bytes(out)
    except OversizeDecompressed:
        raise
    except Exception:
        # A corrupt LATER member must not discard already-decoded valid
        # members — but the decompressor may also have emitted a partial
        # fragment of the corrupt member before hitting the error, so
        # truncate to the last fully-completed member boundary (ADVICE
        # r04: callers must never receive a truncated trailing
        # fragment of a member that failed its CRC).
        return bytes(out[:member_end]) if member_end else blob


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


def decode_html(blob: bytes, limit: int | None = None) -> str:
    """bytes → str, never raises (errors='replace') — except
    :class:`OversizeDecompressed` when a gzip payload exceeds `limit`."""
    blob = gunzip_if_needed(blob, limit)
    enc = detect_charset(blob)
    try:
        return blob.decode(enc, errors="replace")
    except Exception:
        return blob.decode("utf-8", errors="replace")
