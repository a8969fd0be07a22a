"""Fixed-point embedding Gramian (operators/similarity.gramian_*):
arrow scale path bit-identical to the fold/explode oracle path,
numpy-reference correctness, partition independence."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.similarity import (
    GRAMIAN_SCALE,
    gramian_arrow,
    gramian_fixed_point,
)
from etl_data_warehouse_spark.sources.catalog import load_table

DIM = 64


def _rows(df):
    return sorted((r["i"], r["j"], r["g"]) for r in df.collect())


class TestGramian:
    def test_arrow_matches_fold_bit_for_bit(self, spark, sf_dir):
        emb = load_table(spark, "embeddings", sf_dir)
        fold = _rows(gramian_fixed_point(emb, dim=DIM))
        arrow = _rows(gramian_arrow(emb, dim=DIM))
        # integer sums commute: equality is exact, not ulp-close
        assert fold == arrow
        assert len(fold) == DIM * (DIM + 1) // 2

    def test_matches_numpy_reference(self, spark, sf_dir):
        emb = load_table(spark, "embeddings", sf_dir)
        rows = emb.select("vec_id", "embedding").collect()
        V = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
        )
        Q = np.floor(V * GRAMIAN_SCALE).astype(np.int64)
        G = Q.T @ Q
        iu, ju = np.triu_indices(DIM)
        want = sorted(
            (int(i), int(j), int(G[i, j])) for i, j in zip(iu, ju)
        )
        assert _rows(gramian_fixed_point(emb, dim=DIM)) == want

    def test_partition_independence(self, spark, sf_dir):
        # order-independence is the point: any partitioning, same bits
        emb = load_table(spark, "embeddings", sf_dir)
        a = _rows(gramian_arrow(emb.repartition(3), dim=DIM))
        b = _rows(gramian_arrow(emb.repartition(17, "vec_id"), dim=DIM))
        assert a == b
