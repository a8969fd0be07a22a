"""Central registry of (query, oracle) pairs for the driver contract.

Every implemented operator from SURVEY.md §2 appears here as a named
query ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, a
DuckDB oracle twin. Queries without an oracle get the driver's weaker
rows-only check (custom hashing / streaming ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    "q01_monthly_revenue": analytics.q01_monthly_revenue,
}

ORACLES: dict[str, str] = {
    "q01_monthly_revenue": analytics.Q01_ORACLE,
}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
