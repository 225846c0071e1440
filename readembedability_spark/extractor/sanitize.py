"""A-7: content sanitize → ``content_html`` (canonical, byte-stable).

Whitelist tags, strip all attributes except ``href``/``src``/``alt``,
absolutize URLs against the page base, serialize canonically:
lowercase tags, fixed attribute order (href, src, alt), ``&<>`` escaped
in text and ``&<>"`` in attribute values, void elements self-closed
(``<br/>``), non-whitelisted elements unwrapped (children kept).
"""

from __future__ import annotations

from urllib.parse import urljoin

from readembedability_spark.extractor.dom import VOID_ELEMENTS, Element

ALLOWED_TAGS = frozenset(
    (
        "p a img h1 h2 h3 h4 h5 h6 ul ol li blockquote pre code em strong "
        "figure figcaption br table thead tbody tr td th"
    ).split()
)
_URL_ATTRS = frozenset(["href", "src"])
_ATTR_ORDER = ("href", "src", "alt")
_DROP_ENTIRELY = frozenset(
    ["script", "style", "noscript", "template", "head", "title", "iframe",
     "form", "button", "select", "textarea", "svg", "canvas", "object"]
)


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def absolutize(url: str | None, base: str) -> str | None:
    if not url:
        return url
    url = url.strip()
    if url.startswith(("data:", "#", "mailto:")):
        return url
    try:
        return urljoin(base, url)
    except ValueError:
        return url


#: schemes never allowed to survive into content_html (XSS hazard for
#: any downstream renderer); data: is allowed for images only.
_SCRIPTISH = ("javascript:", "vbscript:")


def _is_unsafe_url(val: str, attr: str, tag: str) -> bool:
    low = "".join(val.split()).lower()  # defeat "java\tscript:" tricks
    if low.startswith(_SCRIPTISH):
        return True
    if low.startswith("data:") and not (tag == "img" and attr == "src"):
        return True
    return False


def _serialize(el: Element, base: str, out: list[str]) -> None:
    for child in el.children:
        if isinstance(child, str):
            text = child
            if text:
                out.append(_esc_text(text))
            continue
        if child.tag in _DROP_ENTIRELY:
            continue
        if child.tag not in ALLOWED_TAGS:
            _serialize(child, base, out)  # unwrap
            continue
        attrs = []
        for name in _ATTR_ORDER:
            val = child.attrs.get(name)
            if val is None:
                continue
            if name in _URL_ATTRS:
                if _is_unsafe_url(val, name, child.tag):
                    continue  # drop the attribute, keep the element
                val = absolutize(val, base) or ""
            attrs.append(f' {name}="{_esc_attr(val)}"')
        attr_s = "".join(attrs)
        if child.tag in VOID_ELEMENTS:
            out.append(f"<{child.tag}{attr_s}/>")
        else:
            out.append(f"<{child.tag}{attr_s}>")
            _serialize(child, base, out)
            out.append(f"</{child.tag}>")


def sanitize(members: list[Element], base_url: str) -> str:
    """Serialize the selected content members into canonical HTML.

    The result is wrapped in a single ``<div>`` root. Whitespace in text
    nodes is preserved verbatim (textify owns whitespace rules; this
    surface is only field-equality-checked, not byte-diffed against the
    reference).
    """
    out: list[str] = ["<div>"]
    for m in members:
        wrapper = Element("#wrap")
        wrapper.children = [m]
        _serialize(wrapper, base_url, out)
    out.append("</div>")
    return "".join(out)
