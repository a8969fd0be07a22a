"""Streaming corpus-cleaning funnel == batch funnel (corpus_stream.py)."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_data_warehouse_spark.sources.catalog import load_table
from etl_data_warehouse_spark.streaming.corpus_stream import (
    clean_document_stream,
    start_corpus_clean_stream,
)


class TestStreamingCorpusFunnel:
    def test_streaming_equals_batch_funnel(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, "documents", sf_dir)
        input_dir = str(tmp_path / "in")
        out_path = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)

        # batch expectation: the q52 gates + min-doc_id dedup
        cleaned = clean_document_stream(docs)
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        expected = {
            r["doc_id"]
            for r in cleaned.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        }
        assert expected, "gate should pass some documents"

        # feed the corpus in two doc_id-ordered batches, one run each
        # (sequential AvailableNow runs pin the batch order)
        cut = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
        for pred in [F.col("doc_id") <= cut, F.col("doc_id") > cut]:
            docs.filter(pred).coalesce(1).write.mode("append").parquet(
                input_dir
            )
            q = start_corpus_clean_stream(spark, input_dir, out_path, ckpt)
            q.awaitTermination(120)

        out = spark.read.parquet(out_path)
        got = {r["doc_id"] for r in out.select("doc_id").collect()}
        assert got == expected
        # fingerprints unique in the sink (cross-batch dedup held)
        assert out.count() == out.select("fingerprint").distinct().count()

    def test_replay_is_idempotent(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, "documents", sf_dir).limit(100)
        input_dir = str(tmp_path / "in")
        out_path = str(tmp_path / "out")
        os.makedirs(input_dir)
        docs.coalesce(1).write.mode("append").parquet(input_dir)

        q = start_corpus_clean_stream(
            spark, input_dir, out_path, str(tmp_path / "ckpt1")
        )
        q.awaitTermination(120)
        n1 = spark.read.parquet(out_path).count()
        # fresh checkpoint replays the same files: sink dedup absorbs it
        q2 = start_corpus_clean_stream(
            spark, input_dir, out_path, str(tmp_path / "ckpt2")
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(out_path).count() == n1
