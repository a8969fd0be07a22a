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

# --- Driver correctness window rotation (round 5) ------------------------
# The driver hash-checks the FIRST 50 insertion-ordered entries of
# QUERIES. Round 4's window covered the 29 never-checked entries plus
# the round-4 additions; the 42 entries it displaced (q07-q29, q31-q46,
# q55-q59, q61 families) last saw a driver row in r1-r3, against older
# code. Lead with those 42, then this round's NEW/CHANGED queries (q94
# new; q88/q92/q93 changed oracles this round; q81 pairs with q94's
# hash evidence; q82/q87/q01 heavyweight re-checks) — exactly 50.
# Every query stays registered; only the insertion order changes.
# q95/q96/q97/q98 (new this round) take the last slots from the q01/
# q82/q87 re-checks (hash-green in r4, unchanged) and from q81 (rows-
# only by design — its r4 driver row + q94's hash row are the evidence;
# a fresh rows-only row adds nothing).
_WINDOW_FIRST = [
    # displaced by the r4 window — refresh their driver rows
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
    "q24_minhash_lsh_dedup",
    "q25_simhash_pairs",
    "q26_embedding_topk",
    "q27_embedding_neardup",
    "q28_ivf_topk",
    "q29_doc_fingerprint",
    "q31_event_rollup",
    "q32_event_props_extract",
    "q33_multimodal_features",
    "q41_hyperplane_lsh_neardup",
    "q55_embedding_stats",
    "q59_dedup_clusters",
    "q36_event_funnel",
    "q37_asof_join",
    "q38_range_join",
    "q43_train_test_split",
    "q44_vocab_topk",
    "q45_sequence_packing",
    "q46_contamination",
    # new or changed in round 5 — need fresh driver rows
    "q94_ivfadc_exact",
    "q88_weighted_sample",
    "q92_topk_sketch_rollup",
    "q93_frame_sample",
    "q98_json_flatten",
    "q95_dup_span_removal",
    "q96_snapshot_diff",
    "q97_dedup_keep_longest",
]
_rotated = {k: QUERIES[k] for k in _WINDOW_FIRST if k in QUERIES}
for _k, _v in QUERIES.items():
    _rotated.setdefault(_k, _v)
QUERIES = _rotated


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
