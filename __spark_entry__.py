"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship InfluxQL query end-to-end (parser → binder →
resolution routing → DataFrame plan) on sf0.001.
queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2 plus the training-data pipeline operators; oracles are
ANSI-SQL restatements for DuckDB (see khronus_spark/entry_queries.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from khronus_spark import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full `select *` expansion
    over a timer metric through the complete query path."""
    eng = _eq._engine(spark, "/root/testdata/sf0.001")
    return eng.sql_union(
        f'select * from "purchase" where time between {_eq.A_MS} and {_eq.B_MS} '
        "force group by time(1h)"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _eq.queries()


def oracle_sql() -> dict[str, str]:
    return _eq.oracle_sql()
