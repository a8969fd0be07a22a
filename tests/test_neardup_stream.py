"""Streaming near-dup materializer (streaming/neardup_stream.py):
drained stream == batch incremental dedup == full-corpus restriction;
re-delivery of the same files adds nothing (idempotent)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.dedup import minhash_lsh_pairs
from etl_data_warehouse_spark.operators.dedup_index import (
    build_minhash_index,
)
from etl_data_warehouse_spark.sources.catalog import load_table
from etl_data_warehouse_spark.streaming.neardup_stream import (
    read_neardup_pairs,
    start_neardup_stream,
)


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 12))
        for r in df.collect()
    }


class TestNeardupStream:
    def test_streamed_batches_equal_full_corpus_restriction(
        self, spark, sf_dir, tmp_path
    ):
        docs = load_table(spark, "documents", sf_dir)
        corpus = docs.filter(F.col("doc_id") % 3 == 0)
        new = docs.filter(F.col("doc_id") % 3 != 0)
        idx = str(tmp_path / "lsh_index")
        input_dir = str(tmp_path / "in")
        pairs_dir = str(tmp_path / "pairs")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)

        build_minhash_index(corpus, idx)
        # two microbatch files, drained one file per trigger
        for pred in [F.col("doc_id") % 3 == 1, F.col("doc_id") % 3 == 2]:
            new.filter(pred).coalesce(1).write.mode("append").parquet(
                input_dir
            )
        q = start_neardup_stream(
            spark, input_dir, idx, pairs_dir, ckpt, max_files=1
        )
        q.awaitTermination(300)

        got = _pairs_set(read_neardup_pairs(spark, pairs_dir))
        expected = _pairs_set(
            minhash_lsh_pairs(docs).filter(
                (F.col("doc_a") % 3 != 0) | (F.col("doc_b") % 3 != 0)
            )
        )
        assert got == expected
        assert got  # planted dups must exist

        # the index now equals a full build: a SECOND stream over the
        # SAME files (fresh checkpoint = re-delivery) must add nothing
        n_bands = spark.read.parquet(f"{idx}/bands").count()
        q2 = start_neardup_stream(
            spark, input_dir, idx, pairs_dir,
            str(tmp_path / "ckpt2"), max_files=1,
        )
        q2.awaitTermination(300)
        assert spark.read.parquet(f"{idx}/bands").count() == n_bands
        assert _pairs_set(read_neardup_pairs(spark, pairs_dir)) == expected

    def test_bucketed_index_stream_matches_plain(
        self, spark, sf_dir, tmp_path
    ):
        """The 100 TB configuration — stream dedup against a BUCKETED
        index (Exchange-free index side, appends preserve the bucket
        spec) — must produce exactly the plain-index pair set."""
        docs = load_table(spark, "documents", sf_dir)
        corpus = docs.filter(F.col("doc_id") % 3 == 0)
        new = docs.filter(F.col("doc_id") % 3 != 0)
        idx = str(tmp_path / "lsh_idx_bk")
        input_dir = str(tmp_path / "in_bk")
        pairs_dir = str(tmp_path / "pairs_bk")
        os.makedirs(input_dir)
        spark.sql("DROP TABLE IF EXISTS t_stream_lsh_bands")
        spark.sql("DROP TABLE IF EXISTS t_stream_lsh_shingles")

        build_minhash_index(
            corpus, idx, buckets=4, table_prefix="t_stream_lsh"
        )
        for pred in [F.col("doc_id") % 3 == 1, F.col("doc_id") % 3 == 2]:
            new.filter(pred).coalesce(1).write.mode("append").parquet(
                input_dir
            )
        q = start_neardup_stream(
            spark, input_dir, idx, pairs_dir,
            str(tmp_path / "ckpt_bk"),
            buckets=4, table_prefix="t_stream_lsh", max_files=1,
        )
        q.awaitTermination(300)

        got = _pairs_set(read_neardup_pairs(spark, pairs_dir))
        expected = _pairs_set(
            minhash_lsh_pairs(docs).filter(
                (F.col("doc_a") % 3 != 0) | (F.col("doc_b") % 3 != 0)
            )
        )
        assert got == expected
        assert got
