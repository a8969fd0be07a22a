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


class TestPca:
    def test_model_matches_numpy_pca(self, spark, sf_dir):
        from etl_data_warehouse_spark.operators.similarity import (
            pca_model,
            pca_project,
        )

        emb = load_table(spark, "embeddings", sf_dir)
        mean, W, evals = pca_model(emb, dim=DIM, k=8)
        rows = emb.select("vec_id", "embedding").collect()
        V = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
        )
        # reference PCA on the SAME quantized data the model saw
        Q = np.floor(V * GRAMIAN_SCALE) / GRAMIAN_SCALE
        mu_ref = Q.mean(axis=0)
        cov_ref = (Q - mu_ref).T @ (Q - mu_ref) / len(Q)
        ev_ref = np.sort(np.linalg.eigvalsh(cov_ref))[::-1][:8]
        assert np.allclose(mean, mu_ref, atol=1e-9)
        assert np.allclose(evals, ev_ref, rtol=1e-6, atol=1e-12)
        # components orthonormal, eigenvalues descending
        assert np.allclose(W @ W.T, np.eye(8), atol=1e-8)
        assert all(evals[i] >= evals[i + 1] for i in range(7))

        # distributed projection == numpy projection (same mean/W)
        proj = {
            r["vec_id"]: np.asarray(r["projected"])
            for r in pca_project(emb, mean, W).collect()
        }
        P_ref = (V - mean) @ W.T
        for i, r in enumerate(rows):
            assert np.allclose(proj[r["vec_id"]], P_ref[i], atol=1e-6)

    def test_whitened_projection_has_unit_variance(self, spark, sf_dir):
        from etl_data_warehouse_spark.operators.similarity import (
            pca_model,
            pca_project,
        )

        emb = load_table(spark, "embeddings", sf_dir)
        mean, W, evals = pca_model(emb, dim=DIM, k=4)
        P = np.stack(
            [
                np.asarray(r["projected"])
                for r in pca_project(
                    emb, mean, W, eigenvalues=evals
                ).collect()
            ]
        )
        # population variance of each whitened component ~ 1 (up to
        # the O(1/SCALE) quantization gap between model and raw data)
        var = P.var(axis=0)
        assert np.allclose(var, 1.0, rtol=1e-2)
