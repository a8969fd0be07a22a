"""End-to-end corpus pipeline DAG (plans/corpus_pipeline.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.plans.corpus_pipeline import run_corpus_pipeline


class TestCorpusPipeline:
    def test_full_run_and_idempotent_rerun(self, spark, sf_dir, tmp_path):
        out = str(tmp_path / "corpus")
        audit1 = run_corpus_pipeline(spark, sf_dir, out)
        assert audit1["status"] == "SUCCESS"
        assert audit1["clean_corpus_size"] > 0
        assert audit1["new_clean_docs"] == audit1["clean_corpus_size"]
        assert set(audit1["split_counts"]) <= {"train", "val", "test"}
        assert audit1["train_chunks"] > 0
        for artifact in [
            "clean_documents",
            "splits",
            "packed_train",
            "train_mixture",
        ]:
            assert os.path.exists(os.path.join(out, artifact))

        # re-run: the dedup sink absorbs everything, splits are
        # hash-stable, so nothing changes
        audit2 = run_corpus_pipeline(spark, sf_dir, out)
        assert audit2["new_clean_docs"] == 0
        assert audit2["clean_corpus_size"] == audit1["clean_corpus_size"]
        assert audit2["split_counts"] == audit1["split_counts"]
        assert audit2["train_chunks"] == audit1["train_chunks"]

    def test_artifacts_are_consistent(self, spark, sf_dir, tmp_path):
        out = str(tmp_path / "corpus2")
        audit = run_corpus_pipeline(spark, sf_dir, out)
        clean = spark.read.parquet(os.path.join(out, "clean_documents"))
        splits = spark.read.parquet(os.path.join(out, "splits"))
        packed = spark.read.parquet(os.path.join(out, "packed_train"))
        # every clean doc got a split; only train docs got packed
        assert splits.count() == clean.count()
        n_train = splits.filter(F.col("split") == "train").count()
        assert packed.count() == n_train
        assert audit["split_counts"].get("train", 0) == n_train
        # fingerprints unique after dedup
        assert clean.count() == clean.select("fingerprint").distinct().count()
