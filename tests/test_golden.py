"""Tier-1 golden fixtures: oracle output must match frozen expected JSON
byte-for-byte on content_text (SURVEY.md §5.2)."""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path

import pytest

from fixture_manifest import FIXTURE_URLS

from readembedability_spark.extractor import extract_page

FIXTURES = Path(__file__).parent / "fixtures"
EXPECTED = Path(__file__).parent / "expected"


@pytest.mark.parametrize("name", sorted(FIXTURE_URLS))
def test_golden(name: str):
    url = FIXTURE_URLS[name]
    blob = (FIXTURES / name).read_bytes()
    row = extract_page(url, blob)
    if isinstance(row.get("published_at"), datetime):
        row["published_at"] = row["published_at"].isoformat()
    expected = json.loads((EXPECTED / (name + ".json")).read_text(encoding="utf-8"))

    # byte-identity surface first, with a precise diff on failure
    got_text = row["content_text"]
    want_text = expected["content_text"]
    if got_text != want_text:
        a = (got_text or "").encode()
        b = (want_text or "").encode()
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                pytest.fail(
                    f"content_text diverges at byte {i}: "
                    f"{a[max(0,i-20):i+20]!r} vs {b[max(0,i-20):i+20]!r}"
                )
        pytest.fail(f"content_text length mismatch: {len(a)} vs {len(b)}")

    assert row == expected


def test_every_fixture_has_golden():
    missing = [
        n for n in FIXTURE_URLS if not (EXPECTED / (n + ".json")).exists()
    ]
    assert not missing


def test_statuses_cover_taxonomy():
    statuses = {
        json.loads((EXPECTED / (n + ".json")).read_text())["status"]
        for n in FIXTURE_URLS
    }
    assert {"ok", "pdf", "non_html", "empty"} <= statuses
