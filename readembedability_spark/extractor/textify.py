"""A-8: DOM → plain text. THE byte-identity surface (BASELINE.json:15).

Frozen spec — changing any rule here invalidates every golden fixture:

1. Block elements (dom.BLOCK_ELEMENTS) delimit paragraphs; paragraphs are
   joined with ``"\\n\\n"``.
2. ``<br>`` emits a hard line break (``"\\n"``) within its paragraph.
3. ``<li>`` paragraphs get a ``"- "`` prefix (first paragraph produced by
   the li only).
4. Within a paragraph, every run of Unicode whitespace collapses to one
   ASCII space; leading/trailing whitespace is stripped per line.
5. Zero-width space (U+200B) and BOM/ZWNBSP (U+FEFF) are removed.
6. ``script``/``style``/``noscript``/``template`` contribute no text.
7. The final string is NFC-normalized and stripped.
"""

from __future__ import annotations

import unicodedata

from readembedability_spark.extractor.dom import BLOCK_ELEMENTS, Element

_SKIP_TAGS = frozenset(["script", "style", "noscript", "template", "head", "title"])
_BR_MARK = "\x00"
_ZERO_WIDTH = dict.fromkeys((0x200B, 0xFEFF))


def _collapse(raw: str) -> str:
    """Rule 4+5: per-line unicode-whitespace collapse around hard breaks."""
    raw = raw.translate(_ZERO_WIDTH)
    lines = []
    for line in raw.split(_BR_MARK):
        collapsed = " ".join(line.split())
        if collapsed:
            lines.append(collapsed)
    return "\n".join(lines)


def _flush(parts: list[str], blocks: list[str]) -> None:
    if parts:
        text = _collapse("".join(parts))
        parts.clear()
        if text:
            blocks.append(text)


def _collect(el: Element, parts: list[str], blocks: list[str]) -> None:
    for child in el.children:
        if isinstance(child, str):
            parts.append(child)
        elif child.tag in _SKIP_TAGS:
            continue
        elif child.tag == "br":
            parts.append(_BR_MARK)
        elif child.tag in BLOCK_ELEMENTS:
            _flush(parts, blocks)
            first = len(blocks)
            inner: list[str] = []
            _collect(child, inner, blocks)
            _flush(inner, blocks)
            if child.tag == "li" and len(blocks) > first:
                blocks[first] = "- " + blocks[first]
        else:
            _collect(child, parts, blocks)


def textify(el: Element) -> str:
    """Serialize an element subtree to the frozen plain-text form."""
    parts: list[str] = []
    blocks: list[str] = []
    _collect(el, parts, blocks)
    _flush(parts, blocks)
    return unicodedata.normalize("NFC", "\n\n".join(blocks)).strip()
