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

# --- Driver correctness window rotation (round 4) ------------------------
# The driver hash-checks the FIRST 50 insertion-ordered entries of
# QUERIES. Rounds 1-3 always presented the same head, so the 29 entries
# past position 50 (TPC-H pack II, olap_ext, text-quality, mixture,
# layout, sampling tails) never received a driver-checked row. Rotate
# them to the front, then the two queries un-broken this round
# (q30/q67, the TIMESTAMP_NTZ regression), then the original order —
# every query stays registered; only the insertion order changes.
_WINDOW_FIRST = [
    "q47_zorder_layout",
    "q48_pii_scrub",
    "q49_repetition_stats",
    "q50_tfidf_topk",
    "q51_source_mixture",
    "q52_corpus_funnel",
    "q53_order_value_quantiles",
    "q57_status_pivot",
    "q58_status_unpivot",
    "q60_grouping_sets",
    "q61_distribution_windows",
    "q80_sliding_window_activity",
    "q62_tpch_q1_pricing_summary",
    "q63_tpch_q3_shipping_priority",
    "q64_tpch_q5_local_supplier_volume",
    "q65_tpch_q6_forecast_revenue",
    "q66_tpch_q10_returned_items",
    "q68_tpch_q4_priority_check",
    "q69_tpch_q7_volume_shipping",
    "q70_tpch_q8_market_share",
    "q71_tpch_q9_product_profit",
    "q72_tpch_q13_order_counts",
    "q73_tpch_q14_promo_revenue",
    "q74_tpch_q15_top_supplier",
    "q75_tpch_q17_small_qty_revenue",
    "q76_tpch_q18_large_orders",
    "q77_tpch_q19_disjunctive_revenue",
    "q78_tpch_q21_waiting_supplier",
    "q79_tpch_q22_lapsed_customers",
    "q30_sessionization",
    "q67_native_session_window",
    # round-4 additions — need their first driver-checked rows
    # (q81 has no oracle; the driver applies its rows-only check)
    "q81_ivfadc_topk",
    "q82_semantic_dedup",
    "q83_quality_rules",
    "q84_ngram_repetition",
    "q85_crossdoc_ngram_dup",
    "q86_key_skew_report",
    "q87_cdc_apply",
    "q88_weighted_sample",
    "q89_value_histogram",
    "q90_last_touch_attribution",
    "q91_running_balance",
    "q92_topk_sketch_rollup",
    "q93_frame_sample",
]
_rotated = {k: QUERIES[k] for k in _WINDOW_FIRST if k in QUERIES}
for _k, _v in QUERIES.items():
    _rotated.setdefault(_k, _v)
QUERIES = _rotated


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
