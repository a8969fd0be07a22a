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

# --- Driver correctness window rotation (round 11) ------------------------
# The driver hash-checks the FIRST 50 insertion-ordered entries of
# QUERIES. Round 11's window leads with the five entries whose latest
# driver row is r7 (q123-q127, the r10 rotation leftover), plus the new
# q157 (whitened SemDeDup under the hash gate, first driver row), and
# fills the remaining 44 slots with the oldest r8-stale entries in
# numeric order. Six r8 entries (q142-q147) don't fit and lead r12's
# window, together with q158/q159 (added late in r11, no driver row
# yet). Entries outside the window remain proven every round by
# tests/test_oracle_parity.py's full-registry sf0.001 sweep; only
# driver-row freshness rotates.
_WINDOW_FIRST = [
    # the five r7-stale entries — the round-10 verdict's task #1
    "q123_fim_transform",
    "q124_tokenizer_fertility",
    "q125_span_corruption",
    "q126_hard_negatives",
    "q127_behavior_sequences",
    # new in r11 — first driver row
    "q157_whitened_semantic_dedup",
    # 44 oldest r8-stale entries, numeric order (q142-q147 -> r12)
    "q24_minhash_lsh_dedup",
    "q25_simhash_pairs",
    "q26_embedding_topk",
    "q27_embedding_neardup",
    "q28_ivf_topk",
    "q29_doc_fingerprint",
    "q30_sessionization",
    "q31_event_rollup",
    "q32_event_props_extract",
    "q33_multimodal_features",
    "q36_event_funnel",
    "q37_asof_join",
    "q38_range_join",
    "q41_hyperplane_lsh_neardup",
    "q43_train_test_split",
    "q44_vocab_topk",
    "q45_sequence_packing",
    "q46_contamination",
    "q52_corpus_funnel",
    "q53_order_value_quantiles",
    "q55_embedding_stats",
    "q59_dedup_clusters",
    "q88_weighted_sample",
    "q92_topk_sketch_rollup",
    "q93_frame_sample",
    "q94_ivfadc_exact",
    "q95_dup_span_removal",
    "q96_snapshot_diff",
    "q97_dedup_keep_longest",
    "q98_json_flatten",
    "q128_eval_decontamination",
    "q129_sharded_curriculum",
    "q130_sharded_dsir_manifest",
    "q131_bpe_train_steps",
    "q132_hll_register_sketch",
    "q133_quality_classifier",
    "q134_preference_pairs",
    "q135_bpe_encode",
    "q136_bloom_prune",
    "q137_quantile_histogram",
    "q138_countmin_heavy_users",
    "q139_rolling_distinct_sketch",
    "q140_join_size_sketch",
    "q141_sft_format",
]
_rotated = {k: QUERIES[k] for k in _WINDOW_FIRST if k in QUERIES}
for _k, _v in QUERIES.items():
    _rotated.setdefault(_k, _v)
QUERIES = _rotated


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
