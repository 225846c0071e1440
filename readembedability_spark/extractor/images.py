"""A-18: lead-image selection.

Priority: og:image > twitter:image > JSON-LD image > best content
``<img>`` scored by declared area (width×height attrs), document
position, and a filename penalty (sprite|icon|logo|ad|pixel|spacer|
blank|avatar|badge|button). All URLs absolutized against the canonical
base. Deviation from the reference: no network, so images are never
fetched to measure true dimensions (SURVEY.md A-18) — attribute/score
only.
"""

from __future__ import annotations

import re

from readembedability_spark.extractor.dom import Element
from readembedability_spark.extractor.meta import PageMeta
from readembedability_spark.extractor.sanitize import absolutize

_BAD_NAME_RE = re.compile(
    r"sprite|icon|logo|ad[sx]?[\-_./]|[\-_./]ad[sx]?\b|pixel|spacer|blank|"
    r"avatar|badge|button|banner|captcha|loading|spinner|1x1",
    re.IGNORECASE,
)
_GOOD_EXT_RE = re.compile(r"\.(?:jpe?g|png|webp)(?:\?|$)", re.IGNORECASE)
_MIN_DIM = 32


def _parse_dim(val: str | None) -> int | None:
    if not val:
        return None
    m = re.match(r"\s*(\d+)", val)
    return int(m.group(1)) if m else None


def score_img(el: Element, position: int) -> float | None:
    """Score one <img>; None = disqualified."""
    src = (el.attrs.get("src") or "").strip()
    if not src or src.startswith("data:"):
        return None
    if _BAD_NAME_RE.search(src):
        return None
    w = _parse_dim(el.attrs.get("width"))
    h = _parse_dim(el.attrs.get("height"))
    if (w is not None and w < _MIN_DIM) or (h is not None and h < _MIN_DIM):
        return None
    score = 0.0
    if w is not None and h is not None:
        area = w * h
        score += min(area / 1000.0, 400.0)
        # penalize extreme aspect ratios (banners/rules)
        if h > 0 and (w / h > 6 or h / w > 6):
            score -= 100.0
    if _GOOD_EXT_RE.search(src):
        score += 20.0
    if el.attrs.get("alt"):
        score += 5.0
    score -= position * 0.5  # earlier is better
    return score


def best_content_image(content_members: list[Element], base: str) -> str | None:
    best_src, best_score = None, float("-inf")
    position = 0
    for member in content_members:
        for el in member.iter():
            if el.tag != "img":
                continue
            s = score_img(el, position)
            position += 1
            if s is not None and s > best_score:
                best_score = s
                best_src = el.attrs.get("src")
    if best_src:
        return absolutize(best_src.strip(), base)
    return None


def extract_image(
    pm: PageMeta,
    jsonld_image: str | None,
    content_members: list[Element],
    base: str,
) -> list[tuple[str, float]]:
    """Candidates as (absolute_url, confidence)."""
    out: list[tuple[str, float]] = []
    og_img = pm.og("image") or pm.properties.get("og:image:secure_url")
    if og_img:
        absolute = absolutize(og_img.strip(), base)
        if absolute:
            out.append((absolute, 0.9))
    tw_img = pm.twitter("image") or pm.twitter("image:src")
    if tw_img:
        absolute = absolutize(tw_img.strip(), base)
        if absolute:
            out.append((absolute, 0.85))
    if jsonld_image:
        absolute = absolutize(jsonld_image.strip(), base)
        if absolute:
            out.append((absolute, 0.8))
    content_img = best_content_image(content_members, base)
    if content_img:
        out.append((content_img, 0.5))
    return out
