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
    tpch3,
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
QUERIES.update(tpch3.QUERIES)
ORACLES.update(tpch3.ORACLES)

# --- Driver correctness window rotation (round 7) ------------------------
# The driver hash-checks the FIRST 50 insertion-ordered entries of
# QUERIES. Round 6's window proved q99-q113 (new) plus 35 r4-stale
# entries; q109 was the round's one red row (now fixed: codes
# scalarized to codes_csv). Round 7's window leads with the fixed q109
# and this round's NEW queries, then the 12 entries whose latest
# driver row is r4 (q01-q06, q47-q51, q81 — two rounds stale), then
# the oldest r5 entries in insertion order up to the 50-slot budget
# (q24-q29/q31/q32/q33/q41/q55 ceded their slots to the second
# and third round-7 batches q117-q127 and rotate back in round 8).
# Entries outside the window remain proven every round by
# tests/test_oracle_parity.py's full-registry sf0.001 sweep; only
# driver-row freshness rotates. q81 stays rows-only by declared design
# (q94 carries the composition's hash evidence — see its docstring).
_WINDOW_FIRST = [
    # fixed this round — needs a fresh (green) driver row
    "q109_int8_quantize",
    # new in round 7 — first driver rows
    "q114_epoch_upsample",
    "q115_negative_sampling",
    "q116_budget_trim",
    "q117_temperature_mixture",
    "q118_bpe_pair_counts",
    "q119_bm25_topk",
    "q120_hybrid_rrf",
    "q121_curriculum_schedule",
    "q122_dsir_weights",
    "q123_fim_transform",
    "q124_tokenizer_fertility",
    "q125_span_corruption",
    "q126_hard_negatives",
    "q127_behavior_sequences",
    # r4-stale (two rounds without a driver row)
    "q01_monthly_revenue",
    "q02_customer_tier",
    "q03_product_performance",
    "q04_retention_cohort",
    "q05_daily_anomaly",
    "q06_dim_date",
    "q47_zorder_layout",
    "q48_pii_scrub",
    "q49_repetition_stats",
    "q50_tfidf_topk",
    "q51_source_mixture",
    "q81_ivfadc_topk",
    # oldest r5 entries, insertion order
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
    "q34_set_ops",
    "q35_incremental_extract",
    "q39_revenue_by_region",
    "q40_supplier_performance",
    "q42_fact_lineitem",
    "q56_salted_revenue",
    "q20_text_stats",
    "q21_lang_id",
    "q22_exact_dedup",
    "q23_ngram_jaccard_dedup",
]
_rotated = {k: QUERIES[k] for k in _WINDOW_FIRST if k in QUERIES}
for _k, _v in QUERIES.items():
    _rotated.setdefault(_k, _v)
QUERIES = _rotated


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
