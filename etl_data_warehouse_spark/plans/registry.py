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

# --- Driver correctness window rotation (round 10) ------------------------
# The driver hash-checks the FIRST 50 insertion-ordered entries of
# QUERIES. Round 10's window leads with the six entries the driver's
# own gate has never seen (q151-q156, added after r9's window froze;
# all hash-green in local full-registry runs since) and fills the
# remaining 44 slots with the oldest stale entries — those whose
# latest driver row is r7. Five r7 entries (q123-q127) don't fit the
# 50 slots and lead r11's window together with anything added late in
# r10. Entries outside the window remain proven every round by
# tests/test_oracle_parity.py's full-registry sf0.001 sweep; only
# driver-row freshness rotates.
_WINDOW_FIRST = [
    # new since the r9 window froze — first driver rows
    "q151_embedding_gramian",
    "q152_gramian_merge",
    "q153_domain_language_mix",
    "q154_gap_fill_forward",
    "q155_gap_fill_interpolate",
    "q156_robust_anomaly_stats",
    # the 44 oldest r7-stale entries, numeric order
    "q01_monthly_revenue",
    "q02_customer_tier",
    "q03_product_performance",
    "q04_retention_cohort",
    "q05_daily_anomaly",
    "q06_dim_date",
    "q07_dim_products",
    "q08_fact_daily_sales",
    "q09_fact_orders",
    "q10_clean_lineitem",
    "q11_referential_integrity",
    "q12_duplicate_checks",
    "q13_null_rates",
    "q14_quality_assertions",
    "q15_top_orders_per_month",
    "q16_status_pivot",
    "q17_sales_rollup",
    "q18_sales_cube",
    "q19_date_coverage",
    "q20_text_stats",
    "q21_lang_id",
    "q22_exact_dedup",
    "q23_ngram_jaccard_dedup",
    "q34_set_ops",
    "q35_incremental_extract",
    "q39_revenue_by_region",
    "q40_supplier_performance",
    "q42_fact_lineitem",
    "q47_zorder_layout",
    "q48_pii_scrub",
    "q49_repetition_stats",
    "q50_tfidf_topk",
    "q51_source_mixture",
    "q56_salted_revenue",
    "q109_int8_quantize",
    "q114_epoch_upsample",
    "q115_negative_sampling",
    "q116_budget_trim",
    "q117_temperature_mixture",
    "q118_bpe_pair_counts",
    "q119_bm25_topk",
    "q120_hybrid_rrf",
    "q121_curriculum_schedule",
    "q122_dsir_weights",
]
_rotated = {k: QUERIES[k] for k in _WINDOW_FIRST if k in QUERIES}
for _k, _v in QUERIES.items():
    _rotated.setdefault(_k, _v)
QUERIES = _rotated


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
