"""Driver-contract smoke: entry() rows>0 + flagship vs its oracle."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "title", "content_text", "status"}


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(sqls) <= set(qs)
    # flagship + every relational/textops query carries an oracle
    assert "q_extract_flagship" in sqls


def test_flagship_matches_oracle(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    sdf = entrymod.queries()["q_extract_flagship"](spark, sf)
    rows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    drows = sorted(tuple(r) for r in con.execute(
        entrymod.oracle_sql()["q_extract_flagship"]
    ).fetchall())
    assert rows == drows
