"""Streaming ANN materializer (streaming/ann_stream.py): a drained
stream leaves the persisted index equal to a frozen-state encode of
everything ingested, materializes neighbors for every streamed vector,
and re-delivery adds nothing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators import pq
from etl_data_warehouse_spark.operators.ann_index import (
    build_ivf_pq_index,
    load_ivf_pq_index,
)
from etl_data_warehouse_spark.sources.catalog import load_table
from etl_data_warehouse_spark.streaming.ann_stream import (
    read_ann_neighbors,
    read_corpus_vectors,
    start_ann_index_stream,
)


class TestAnnStream:
    def test_streamed_batches_complete_the_index(self, spark, sf_dir, tmp_path):
        vecs = load_table(spark, "embeddings", sf_dir)
        corpus = vecs.filter(F.col("vec_id") % 3 == 0)
        new = vecs.filter(F.col("vec_id") % 3 != 0)
        idx = str(tmp_path / "ann_idx")
        input_dir = str(tmp_path / "in")
        vectors_dir = str(tmp_path / "vectors")
        neighbors_dir = str(tmp_path / "neighbors")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)

        build_ivf_pq_index(
            corpus, idx, n_cells=8, m=4, codes=8, pq_train_limit=None
        )
        corpus.write.mode("overwrite").parquet(f"{vectors_dir}/batch=0")
        for pred in [F.col("vec_id") % 3 == 1, F.col("vec_id") % 3 == 2]:
            new.filter(pred).coalesce(1).write.mode("append").parquet(
                input_dir
            )
        q = start_ann_index_stream(
            spark, input_dir, idx, vectors_dir, neighbors_dir, ckpt,
            k=3, max_files=1,
        )
        q.awaitTermination(300)

        # index content == frozen-state encode of everything ingested
        state = load_ivf_pq_index(spark, idx)
        want_packed = pq.pack_codes(
            pq.pq_encode(vecs, state["codebooks"]), state["codebooks"]
        )
        assert state["packed"].count() == want_packed.count() == vecs.count()
        assert state["packed"].exceptAll(want_packed).isEmpty()
        assert state["assigned"].count() == vecs.count()

        # corpus-of-record complete, no duplicate raw rows
        cv = read_corpus_vectors(spark, vectors_dir)
        assert cv.count() == vecs.count()
        assert cv.select("vec_id").distinct().count() == vecs.count()

        # every streamed vector got a neighbor list with valid ranks
        nb = read_ann_neighbors(spark, neighbors_dir)
        streamed = {r["vec_id"] for r in new.select("vec_id").collect()}
        got_src = {r["src_id"] for r in nb.select("src_id").collect()}
        assert got_src == streamed
        assert nb.filter((F.col("rank") < 1) | (F.col("rank") > 3)).isEmpty()

        # re-delivery of the same files adds nothing (idempotent)
        n_packed = state["packed"].count()
        n_nb = nb.count()
        q2 = start_ann_index_stream(
            spark, input_dir, idx, vectors_dir, neighbors_dir, ckpt,
            k=3, max_files=1,
        )
        q2.awaitTermination(300)
        assert load_ivf_pq_index(spark, idx)["packed"].count() == n_packed
        assert read_ann_neighbors(spark, neighbors_dir).count() == n_nb
