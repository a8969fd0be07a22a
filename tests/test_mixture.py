"""Source-mixture weights + corpus funnel (plans/mixture.py)."""

from __future__ import annotations

import math

from etl_data_warehouse_spark.plans.mixture import (
    q51_source_mixture,
    q52_corpus_funnel,
)


class TestSourceMixture:
    def test_invariants(self, spark, sf_dir):
        rows = q51_source_mixture(spark, sf_dir).collect()
        assert rows
        assert math.isclose(
            sum(r["share_of_corpus"] for r in rows), 1.0, rel_tol=1e-9
        )
        for r in rows:
            assert 0.0 < r["keep_fraction"] <= 1.0
            assert 0 <= r["keep_threshold"] <= 10_000
            assert r["expected_tokens"] <= r["n_tokens"]
            # an under-budget source is kept whole
            if r["n_tokens"] <= r["target_tokens"]:
                assert r["keep_fraction"] == 1.0
                assert r["expected_tokens"] == r["n_tokens"]


class TestCorpusFunnel:
    def test_stages_shrink_monotonically(self, spark, sf_dir):
        rows = {r["stage_name"]: r for r in q52_corpus_funnel(spark, sf_dir).collect()}
        order = ["ingest", "lang_en", "quality", "dedup", "train_split"]
        assert list(rows) == order  # stage ordering preserved
        for a, b in zip(order, order[1:]):
            assert rows[b]["n_docs"] <= rows[a]["n_docs"]
            assert rows[b]["n_tokens"] <= rows[a]["n_tokens"]
        assert rows["ingest"]["n_docs"] > 0
        # the funnel must actually filter something on this corpus
        assert rows["train_split"]["n_docs"] < rows["ingest"]["n_docs"]
