"""Freeze golden expected outputs (tests/expected/*.json) from the oracle.

Run ONLY when the frozen extraction spec intentionally changes; outputs
are committed and byte-compared by tests/test_golden.py. content_text is
stored verbatim (utf-8, NFC) — the byte-identity surface.

Usage: python fixtures/gen_expected.py
"""

from __future__ import annotations

import json
import sys
from datetime import datetime
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from fixture_manifest import FIXTURE_URLS  # noqa: E402

from readembedability_spark.extractor import extract_page  # noqa: E402


def main() -> None:
    out_dir = REPO / "tests" / "expected"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, url in sorted(FIXTURE_URLS.items()):
        blob = (REPO / "tests" / "fixtures" / name).read_bytes()
        row = extract_page(url, blob)
        if isinstance(row.get("published_at"), datetime):
            row["published_at"] = row["published_at"].isoformat()
        path = out_dir / (name + ".json")
        path.write_text(
            json.dumps(row, ensure_ascii=False, sort_keys=True, indent=1) + "\n",
            encoding="utf-8",
        )
        print(f"wrote {path.name}")


if __name__ == "__main__":
    main()
