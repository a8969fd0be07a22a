"""Central registry of (query, oracle) pairs for the driver contract.

Every implemented operator from SURVEY.md §2 appears here as a named
query ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, a
DuckDB oracle twin. Queries without an oracle get the driver's weaker
rows-only check (custom hashing / streaming ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics,
    layout_plans,
    llm_ops,
    mixture,
    olap_ext,
    sampling_plans,
    text_quality,
    tpch,
    tpch2,
    warehouse,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    "q01_monthly_revenue": analytics.q01_monthly_revenue,
    "q02_customer_tier": analytics.q02_customer_tier,
    "q03_product_performance": analytics.q03_product_performance,
    "q04_retention_cohort": analytics.q04_retention_cohort,
    "q05_daily_anomaly": analytics.q05_daily_anomaly,
}

ORACLES: dict[str, str] = {
    "q01_monthly_revenue": analytics.Q01_ORACLE,
    "q02_customer_tier": analytics.Q02_ORACLE,
    "q03_product_performance": analytics.Q03_ORACLE,
    "q04_retention_cohort": analytics.Q04_ORACLE,
    "q05_daily_anomaly": analytics.Q05_ORACLE,
}

QUERIES.update(warehouse.QUERIES)
ORACLES.update(warehouse.ORACLES)
QUERIES.update(llm_ops.QUERIES)
ORACLES.update(llm_ops.ORACLES)
QUERIES.update(sampling_plans.QUERIES)
ORACLES.update(sampling_plans.ORACLES)
QUERIES.update(layout_plans.QUERIES)
ORACLES.update(layout_plans.ORACLES)
QUERIES.update(text_quality.QUERIES)
ORACLES.update(text_quality.ORACLES)
QUERIES.update(mixture.QUERIES)
ORACLES.update(mixture.ORACLES)
QUERIES.update(olap_ext.QUERIES)
ORACLES.update(olap_ext.ORACLES)
QUERIES.update(tpch.QUERIES)
ORACLES.update(tpch.ORACLES)
QUERIES.update(tpch2.QUERIES)
ORACLES.update(tpch2.ORACLES)


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
