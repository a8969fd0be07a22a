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


class TestEpochUpsample:
    def test_copy_multiplicity_and_determinism(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.mixture import (
            _EPOCH_CAP,
            q114_epoch_upsample,
        )

        rows = q114_epoch_upsample(spark, sf_dir).collect()
        assert rows
        by_doc: dict[int, list[int]] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["copy_id"])
        per_source_counts: dict[str, set[int]] = {}
        for r in rows:
            per_source_counts.setdefault(r["source"], set()).add(r["n_copies"])
        for doc_id, copies in by_doc.items():
            # copy_ids are exactly 1..n_copies — no dup, no gap
            assert sorted(copies) == list(range(1, len(copies) + 1)), doc_id
        for source, counts in per_source_counts.items():
            # within a source, doc copy counts span at most
            # {floor(epochs), floor(epochs)+1} and never exceed the cap
            assert len(counts) <= 2, source
            assert max(counts) - min(counts) <= 1, source
            assert max(counts) <= int(_EPOCH_CAP), source
        # deterministic: a second run materializes the SAME corpus
        again = q114_epoch_upsample(spark, sf_dir).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestBudgetTrim:
    def test_budget_respected_per_source(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.mixture import (
            _TRIM_BUDGET_TOKENS,
            q116_budget_trim,
        )

        rows = q116_budget_trim(spark, sf_dir).collect()
        assert rows
        by_source: dict[str, list] = {}
        for r in rows:
            by_source.setdefault(r["source"], []).append(r)
        for source, rs in by_source.items():
            # every kept doc STARTS under budget; the greedy prefix
            # property: tokens_before of the last kept doc < budget
            assert all(r["tokens_before"] < _TRIM_BUDGET_TOKENS for r in rs)
            # prefix completeness: kept docs are exactly the prefix in
            # (priority, doc_id) order — running sum reconstructs
            ordered = sorted(rs, key=lambda r: (r["priority"], r["doc_id"]))
            run = 0
            for r in ordered:
                assert r["tokens_before"] == run, source
                run += r["n_tokens"]


class TestNegativeSampling:
    def test_no_self_negatives_and_k_per_doc(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.llm_ops import (
            _NEG_PER_DOC,
            q115_negative_sampling,
        )

        rows = q115_negative_sampling(spark, sf_dir).collect()
        per_doc: dict[int, list] = {}
        for r in rows:
            assert r["neg_doc_id"] != r["doc_id"]  # self-collision bumped
            per_doc.setdefault(r["doc_id"], []).append(r)
        counts = {len(v) for v in per_doc.values()}
        assert counts == {_NEG_PER_DOC}
        # same_source flag agrees with the actual source of both docs
        from etl_data_warehouse_spark.sources.catalog import load_table

        docmap = {
            r["doc_id"]: r["source"]
            for r in load_table(spark, "documents", sf_dir)
            .select("doc_id", "source")
            .collect()
        }
        for r in rows:
            assert docmap[r["neg_doc_id"]] == r["neg_source"]
            assert r["same_source"] == (
                docmap[r["doc_id"]] == r["neg_source"]
            )
