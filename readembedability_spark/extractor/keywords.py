"""A-19 keyword generation + A-20 summary generation.

Keywords: meta ``keywords`` if present; else deterministic term
extraction over ``content_text``: lowercase ``\\w+`` tokens, stopword
filter (vendored list), unigram+bigram counts, top-10 ordered by
(frequency desc, first-position asc). The reference used an NLP
dependency for this (SURVEY.md A-19 [R]); nltk is unavailable, so this
pure-Python equivalent is the frozen spec.

Summary: meta/og description if ≥ 40 chars; else the first sentences of
``content_text`` up to ~500 chars, cut on a sentence boundary (frozen
regex splitter).
"""

from __future__ import annotations

import re
from collections import Counter

from readembedability_spark.extractor.stopwords import STOPWORDS

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+(?=[\"'“‘]?[A-Z0-9])")
_MAX_KEYWORDS = 10
_MIN_TOKEN_LEN = 3
#: mirrors keywords_from_meta's 50-char cap: without it, a page whose
#: body is one giant unbroken token (hex dumps, minified blobs) emits a
#: multi-megabyte "keyword" (observed on a 6 MB hex page)
_MAX_TOKEN_LEN = 50
_SUMMARY_TARGET = 500
_MIN_DESC_LEN = 40


def keywords_from_meta(raw: str) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for part in re.split(r"[,;]", raw):
        kw = " ".join(part.split()).lower()
        if kw and kw not in seen and len(kw) <= 50:
            seen.add(kw)
            out.append(kw)
    return out[:_MAX_KEYWORDS]


def keywords_from_text(text: str) -> list[str]:
    """Hot path — called for every page without meta keywords. The
    filter loop keeps (global token index, lowered token) for tokens
    passing the length/stopword/digit gates; counting then happens in
    C (collections.Counter), first positions via a reversed dict-comp
    (later, i.e. earlier-position, assignments win), and bigrams only
    between kept tokens ADJACENT in the raw stream — semantics
    identical to the original single-loop form (golden-locked)."""
    stop = STOPWORDS
    kept: list[tuple[int, str]] = []
    push = kept.append
    # per-document memo of raw token → lowered-if-kept (None = dropped):
    # natural text is Zipf-repetitive, so most tokens hit the memo and
    # skip the lower()+gates entirely (measured ~35% off this loop);
    # pure memoization — decisions are identical per distinct raw token
    memo: dict[str, str | None] = {}
    miss = object()
    get = memo.get
    # bigrams fused into the same pass: a bigram exists between kept
    # tokens ADJACENT in the raw stream (prev kept index == i-1)
    bigs: list[tuple[int, str]] = []
    push_big = bigs.append
    prev_i = -2
    prev_t = ""
    for i, raw in enumerate(_TOKEN_RE.findall(text)):
        t = get(raw, miss)
        if t is miss:
            tl = raw.lower()
            t = (
                tl
                if (
                    _MIN_TOKEN_LEN <= len(tl) <= _MAX_TOKEN_LEN
                    and tl not in stop
                    and not tl.isdigit()
                )
                else None
            )
            memo[raw] = t
        if t is not None:
            push((i, t))
            if i == prev_i + 1:
                push_big((prev_i, prev_t + " " + t))
            prev_i = i
            prev_t = t
    counts: dict[str, int] = dict(Counter(t for _, t in kept))
    first_pos = {t: i for i, t in reversed(kept)}
    counts.update(Counter(bg for _, bg in bigs))
    for pi, bg in reversed(bigs):
        first_pos[bg] = pi
    # a bigram must repeat to count; unigrams need freq >= 2 on long texts
    items = [
        (term, n)
        for term, n in counts.items()
        if n >= 2 or (len(counts) < 12 and " " not in term)
    ]
    items.sort(key=lambda kv: (-kv[1], first_pos[kv[0]], kv[0]))
    return [term for term, _ in items[:_MAX_KEYWORDS]]


def extract_keywords(meta_keywords: str | None, content_text: str) -> list[str]:
    if meta_keywords and meta_keywords.strip():
        kws = keywords_from_meta(meta_keywords)
        if kws:
            return kws
    if content_text:
        return keywords_from_text(content_text)
    return []


def split_sentences(text: str) -> list[str]:
    return [s for s in _SENTENCE_RE.split(text) if s.strip()]


def extract_summary(description: str | None, content_text: str) -> str | None:
    if description and len(description) >= _MIN_DESC_LEN:
        return description
    if not content_text:
        return description or None
    # first substantial paragraph's sentences up to the target length
    # (skip short leading blocks such as a repeated headline)
    paras = content_text.split("\n\n")
    first_para = next(
        (p for p in paras if len(p) >= 60), paras[0]
    ).replace("\n", " ")
    sentences = split_sentences(first_para)
    out: list[str] = []
    total = 0
    for s in sentences:
        s = s.strip()
        if not s:
            continue
        if total and total + len(s) + 1 > _SUMMARY_TARGET:
            break
        out.append(s)
        total += len(s) + 1
        if total >= _SUMMARY_TARGET:
            break
    summary = " ".join(out).strip()
    if not summary:
        summary = first_para[:_SUMMARY_TARGET].strip()
    return summary or (description or None)
