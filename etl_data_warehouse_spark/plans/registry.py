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
# tests/test_window_plan.py against artifacts <= _WINDOW_PLANNED_FROM
# (so the driver's post-close artifact can never redden the pin).
# Round 13 leads with q164 (new, never checked) and the 12 r9-stale
# entries (q104-q108, q110-q113, q148-q150), then the 37 oldest r10
# entries. Entries outside the
# window remain proven every
# round by tests/test_oracle_parity.py's full-registry sf0.001 sweep;
# only driver-row freshness rotates. After adding a new query, re-run
# `python tools/window_plan.py --block` and paste the result here.
_WINDOW_PLANNED_FROM = 12
_WINDOW_FIRST = [
    "q164_containment_keep_longest_indexed",  # last green: never checked
    "q104_lm_perplexity",  # last green: r9
    "q105_doc_chunking",  # last green: r9
    "q106_entity_pagerank",  # last green: r9
    "q107_token_budget_plan",  # last green: r9
    "q108_retrieval_context",  # last green: r9
    "q110_embedding_outliers",  # last green: r9
    "q111_source_dup_profile",  # last green: r9
    "q112_cross_source_overlap",  # last green: r9
    "q113_apply_mixture_sample",  # last green: r9
    "q148_domain_curation_report",  # last green: r9
    "q149_domain_cap_filter",  # last green: r9
    "q150_boilerplate_strip",  # last green: r9
    "q01_monthly_revenue",  # last green: r10
    "q02_customer_tier",  # last green: r10
    "q03_product_performance",  # last green: r10
    "q04_retention_cohort",  # last green: r10
    "q05_daily_anomaly",  # last green: r10
    "q06_dim_date",  # last green: r10
    "q07_dim_products",  # last green: r10
    "q08_fact_daily_sales",  # last green: r10
    "q09_fact_orders",  # last green: r10
    "q10_clean_lineitem",  # last green: r10
    "q11_referential_integrity",  # last green: r10
    "q12_duplicate_checks",  # last green: r10
    "q13_null_rates",  # last green: r10
    "q14_quality_assertions",  # last green: r10
    "q15_top_orders_per_month",  # last green: r10
    "q16_status_pivot",  # last green: r10
    "q17_sales_rollup",  # last green: r10
    "q18_sales_cube",  # last green: r10
    "q19_date_coverage",  # last green: r10
    "q20_text_stats",  # last green: r10
    "q21_lang_id",  # last green: r10
    "q22_exact_dedup",  # last green: r10
    "q23_ngram_jaccard_dedup",  # last green: r10
    "q34_set_ops",  # last green: r10
    "q35_incremental_extract",  # last green: r10
    "q39_revenue_by_region",  # last green: r10
    "q40_supplier_performance",  # last green: r10
    "q42_fact_lineitem",  # last green: r10
    "q47_zorder_layout",  # last green: r10
    "q48_pii_scrub",  # last green: r10
    "q49_repetition_stats",  # last green: r10
    "q50_tfidf_topk",  # last green: r10
    "q51_source_mixture",  # last green: r10
    "q56_salted_revenue",  # last green: r10
    "q109_int8_quantize",  # last green: r10
    "q114_epoch_upsample",  # last green: r10
    "q115_negative_sampling",  # last green: r10
]
_rotated = {k: QUERIES[k] for k in _WINDOW_FIRST if k in QUERIES}
for _k, _v in QUERIES.items():
    _rotated.setdefault(_k, _v)
QUERIES = _rotated


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
