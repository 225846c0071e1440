"""A-4: DOM cleanup / boilerplate pre-strip.

Single-pass tree walk dropping elements that can never be main content:
``script style noscript template form iframe`` (iframe is dropped here —
embed detection A-17 runs on the raw DOM *before* cleanup, SURVEY.md
§2.A), plus ``display:none`` inline styles and unlikely-candidate
class/id patterns (readability-family regexes; BASELINE.json:6
"tag/class weight heuristics").
"""

from __future__ import annotations

import re

from readembedability_spark.extractor.dom import Element

_DROP_TAGS = frozenset(
    ["script", "style", "noscript", "template", "form", "iframe", "button",
     "select", "textarea", "object", "embed", "link", "meta", "svg", "canvas"]
)

#: Arc90-family unlikely-candidates pattern.
UNLIKELY_RE = re.compile(
    r"banner|breadcrumbs|combx|comment|community|cover-wrap|disqus|extra|"
    r"foot|header|legends|menu|related|remark|replies|rss|shoutbox|sidebar|"
    r"skyscraper|social|sponsor|supplemental|ad-break|agegate|pagination|"
    r"pager|popup|yom-remote|masthead|navbar|share",
    re.IGNORECASE,
)
#: ...unless also matching this (keeps e.g. class="article and-comments").
MAYBE_RE = re.compile(r"and|article|body|column|content|main|shadow", re.IGNORECASE)

_DISPLAY_NONE_RE = re.compile(r"display\s*:\s*none|visibility\s*:\s*hidden", re.IGNORECASE)


def _should_drop(el: Element) -> bool:
    if el.tag in _DROP_TAGS:
        return True
    style = el.attrs.get("style")
    if style and _DISPLAY_NONE_RE.search(style):
        return True
    if el.attrs.get("hidden") is not None and "hidden" in el.attrs:
        return True
    ident = el.classes_and_id()
    if ident and UNLIKELY_RE.search(ident) and not MAYBE_RE.search(ident):
        # never drop the body/html shell
        if el.tag not in ("body", "html"):
            return True
    return False


def clean(root: Element) -> Element:
    """Destructively strip boilerplate from the tree; returns the root."""
    # iterative post-guard walk: collect drops first, then detach, so we
    # never mutate a list we're iterating.
    drops: list[tuple[Element, Element]] = []
    for el in root.iter():
        for child in el.children:
            if isinstance(child, Element) and _should_drop(child):
                drops.append((el, child))
    for parent, child in drops:
        if child in parent.children:
            parent.remove_child(child)
    return root
