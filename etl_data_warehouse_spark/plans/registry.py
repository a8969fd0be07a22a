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
    scoring,
    text_quality,
    tpch,
    tpch2,
    tpch3,
    warehouse,
    web_curation,
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
QUERIES.update(scoring.QUERIES)
ORACLES.update(scoring.ORACLES)
QUERIES.update(tpch.QUERIES)
ORACLES.update(tpch.ORACLES)
QUERIES.update(tpch2.QUERIES)
ORACLES.update(tpch2.ORACLES)
QUERIES.update(tpch3.QUERIES)
ORACLES.update(tpch3.ORACLES)
QUERIES.update(web_curation.QUERIES)
ORACLES.update(web_curation.ORACLES)

# --- Driver correctness window rotation (round 12) ------------------------
# The driver hash-checks the FIRST 50 insertion-ordered entries of
# QUERIES. Since round 12 the window is computed MECHANICALLY by
# tools/window_plan.py (never-driver-checked entries first, then
# oldest-green-first over all CORRECTNESS_r*.json, ties by query
# number) — the literal below IS that tool's output, pinned by
# tests/test_window_plan.py. Round 12 leads with q158/q159 (added late
# in r11, no driver row yet) and q142-q147 (r8-stale), then the 42
# oldest r9 entries. Entries outside the window remain proven every
# round by tests/test_oracle_parity.py's full-registry sf0.001 sweep;
# only driver-row freshness rotates. After adding a new query, re-run
# `python tools/window_plan.py --block` and paste the result here.
_WINDOW_FIRST = [
    "q158_containment_dedup",  # last green: never checked
    "q159_minhash_estimate",  # last green: never checked
    "q160_containment_sketch_calibration",  # last green: never checked
    "q161_simhash_estimate",  # last green: never checked
    "q162_packing_efficiency",  # last green: never checked
    "q163_containment_keep_longest",  # last green: never checked
    "q142_kmv_audience_overlap",  # last green: r8
    "q143_label_propagation",  # last green: r8
    "q144_stratified_sample",  # last green: r8
    "q145_sketch_threshold_filter",  # last green: r8
    "q146_readability",  # last green: r8
    "q147_column_stats",  # last green: r8
    "q57_status_pivot",  # last green: r9
    "q58_status_unpivot",  # last green: r9
    "q60_grouping_sets",  # last green: r9
    "q61_distribution_windows",  # last green: r9
    "q62_tpch_q1_pricing_summary",  # last green: r9
    "q63_tpch_q3_shipping_priority",  # last green: r9
    "q64_tpch_q5_local_supplier_volume",  # last green: r9
    "q65_tpch_q6_forecast_revenue",  # last green: r9
    "q66_tpch_q10_returned_items",  # last green: r9
    "q67_native_session_window",  # last green: r9
    "q68_tpch_q4_priority_check",  # last green: r9
    "q69_tpch_q7_volume_shipping",  # last green: r9
    "q70_tpch_q8_market_share",  # last green: r9
    "q71_tpch_q9_product_profit",  # last green: r9
    "q72_tpch_q13_order_counts",  # last green: r9
    "q73_tpch_q14_promo_revenue",  # last green: r9
    "q74_tpch_q15_top_supplier",  # last green: r9
    "q75_tpch_q17_small_qty_revenue",  # last green: r9
    "q76_tpch_q18_large_orders",  # last green: r9
    "q77_tpch_q19_disjunctive_revenue",  # last green: r9
    "q78_tpch_q21_waiting_supplier",  # last green: r9
    "q79_tpch_q22_lapsed_customers",  # last green: r9
    "q80_sliding_window_activity",  # last green: r9
    "q81_ivfadc_topk",  # last green: r9
    "q82_semantic_dedup",  # last green: r9
    "q83_quality_rules",  # last green: r9
    "q84_ngram_repetition",  # last green: r9
    "q85_crossdoc_ngram_dup",  # last green: r9
    "q86_key_skew_report",  # last green: r9
    "q87_cdc_apply",  # last green: r9
    "q89_value_histogram",  # last green: r9
    "q90_last_touch_attribution",  # last green: r9
    "q91_running_balance",  # last green: r9
    "q99_tpch_q2_min_cost_supplier",  # last green: r9
    "q100_tpch_q11_important_stock",  # last green: r9
    "q101_tpch_q12_shipping_priority_buckets",  # last green: r9
    "q102_tpch_q16_supplier_count",  # last green: r9
    "q103_tpch_q20_dominant_supplier",  # last green: r9
]
_rotated = {k: QUERIES[k] for k in _WINDOW_FIRST if k in QUERIES}
for _k, _v in QUERIES.items():
    _rotated.setdefault(_k, _v)
QUERIES = _rotated


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
