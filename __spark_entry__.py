"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction over sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2
(relational Layer-B + training-data textops + the oracle-checkable
flagship extraction); ``oracle_sql()`` gives the DuckDB equivalent for
each SQL-expressible entry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

import readembedability_spark.textops  # noqa: E402,F401 - registers entries
from readembedability_spark.flagship import (  # noqa: E402
    FLAGSHIP_ORACLE_SQL,
    flagship_extract,
)
from readembedability_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (salted repartition + Arrow
    mapInPandas extractor chain) over pages synthesized from
    /root/testdata/sf0.001/documents.parquet."""
    return flagship_extract(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "q_extract_flagship": flagship_extract,
    }
    for name, qd in REGISTRY.items():
        out[name] = qd.spark
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {
        "q_extract_flagship": FLAGSHIP_ORACLE_SQL,
    }
    for name, qd in REGISTRY.items():
        if qd.sql is not None:
            out[name] = qd.sql
    return out
