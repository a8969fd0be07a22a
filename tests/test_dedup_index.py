"""Incremental LSH dedup against a persisted index
(operators/dedup_index.py): the batch path must emit exactly the
full-corpus pairs that involve a new document, and appending a batch
must leave the index equivalent to a fresh full build."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.dedup import minhash_lsh_pairs
from etl_data_warehouse_spark.operators.dedup_index import (
    append_to_index,
    build_minhash_index,
    incremental_dedup,
)
from etl_data_warehouse_spark.sources.catalog import load_table


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 12))
        for r in df.collect()
    }


class TestIncrementalDedup:
    def test_batch_equals_full_corpus_restriction(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, "documents", sf_dir)
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        batch = docs.filter(F.col("doc_id") % 2 == 1)
        idx = str(tmp_path / "lsh_index")

        build_minhash_index(corpus, idx)
        inc = incremental_dedup(spark, batch, idx)

        full = minhash_lsh_pairs(docs)
        # pairs involving at least one odd (new) doc_id
        expected = full.filter(
            (F.col("doc_a") % 2 == 1) | (F.col("doc_b") % 2 == 1)
        )
        assert _pairs_set(inc) == _pairs_set(expected)
        assert _pairs_set(inc)  # the corpus must actually contain dups

    def test_append_matches_fresh_build(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, "documents", sf_dir)
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        batch = docs.filter(F.col("doc_id") % 2 == 1)
        idx_inc = str(tmp_path / "idx_inc")
        idx_full = str(tmp_path / "idx_full")

        build_minhash_index(corpus, idx_inc)
        append_to_index(batch, idx_inc)
        build_minhash_index(docs, idx_full)

        for sub in ("bands", "shingles"):
            a = spark.read.parquet(f"{idx_inc}/{sub}")
            b = spark.read.parquet(f"{idx_full}/{sub}")
            assert a.count() == b.count()
            assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    def test_no_cartesian_in_incremental_plan(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, "documents", sf_dir)
        idx = str(tmp_path / "idx_plan")
        build_minhash_index(docs.filter(F.col("doc_id") % 2 == 0), idx)
        inc = incremental_dedup(
            spark, docs.filter(F.col("doc_id") % 2 == 1), idx
        )
        plan = inc._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan

    def test_second_batch_sees_first_batch_dups(self, spark, sf_dir, tmp_path):
        """The operational loop: dedup batch1, append it, dedup batch2 —
        batch2's pairs against batch1 docs must surface."""
        docs = load_table(spark, "documents", sf_dir)
        corpus = docs.filter(F.col("doc_id") % 3 == 0)
        b1 = docs.filter(F.col("doc_id") % 3 == 1)
        b2 = docs.filter(F.col("doc_id") % 3 == 2)
        idx = str(tmp_path / "idx_loop")

        build_minhash_index(corpus, idx)
        incremental_dedup(spark, b1, idx).collect()
        append_to_index(b1, idx)
        inc2 = incremental_dedup(spark, b2, idx)

        full = minhash_lsh_pairs(docs)
        expected = full.filter(
            (F.col("doc_a") % 3 == 2) | (F.col("doc_b") % 3 == 2)
        )
        assert _pairs_set(inc2) == _pairs_set(expected)
