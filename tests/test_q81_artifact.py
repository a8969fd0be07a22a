"""q81's frozen trained-quantizer artifact: committed parquet both
engines load at query time (tools/freeze_q81.py is the generator).

Pins three contracts:
  1. the artifact exists with the frozen shape/schema (16 centroids x
     64 dims; 4 subspaces x 16 codes x 16 dims),
  2. retraining with the documented parameters reproduces the
     committed artifact BIT-FOR-BIT (the freeze script is a real,
     auditable generator — not a one-off),
  3. the Spark-side loader returns exactly the artifact rows.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as papq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from etl_data_warehouse_spark.plans.llm_ops import (  # noqa: E402
    _Q81_ARTIFACT_DIR,
    _q81_frozen_state,
)

SF_DIR = "/root/testdata/sf0.001"


def _artifact():
    c = papq.read_table(os.path.join(_Q81_ARTIFACT_DIR, "centroids.parquet"))
    b = papq.read_table(os.path.join(_Q81_ARTIFACT_DIR, "codebooks.parquet"))
    return c, b


class TestQ81Artifact:
    def test_shape_and_schema(self):
        c, b = _artifact()
        assert c.num_rows == 16
        assert sorted(c.column("cell_id").to_pylist()) == list(range(1, 17))
        assert all(len(v) == 64 for v in c.column("cv").to_pylist())
        assert b.num_rows == 64
        rows = sorted(
            zip(b.column("subspace").to_pylist(), b.column("code_id").to_pylist())
        )
        assert rows == [(s, k) for s in range(4) for k in range(1, 17)]
        assert all(len(v) == 16 for v in b.column("cv").to_pylist())

    def test_retrain_reproduces_artifact_bit_for_bit(self, spark):
        # the freeze script's own trainer, against the live artifact —
        # proves the committed state is regenerable (round-9 ADVICE:
        # the generator must be committed and auditable). Reuses the
        # suite's session (freeze_q81.train would spawn its own).
        from etl_data_warehouse_spark.operators.pq import train_pq_codebooks
        from etl_data_warehouse_spark.operators.similarity import (
            kmeans_centroids,
        )
        from etl_data_warehouse_spark.sources.catalog import load_table

        import freeze_q81 as fz

        emb = load_table(spark, "embeddings", SF_DIR)
        cents = sorted(
            (r["cell_id"], list(r["cv"]))
            for r in kmeans_centroids(
                emb, n_cells=fz.N_CELLS, max_iterations=fz.COARSE_ITERS
            ).collect()
        )
        books = sorted(
            (r["subspace"], r["code_id"], list(r["cv"]))
            for r in train_pq_codebooks(
                emb, m=fz.M, codes=fz.CODES, max_iterations=fz.PQ_ITERS
            )
            .select("subspace", "code_id", "cv")
            .collect()
        )
        have_c, have_b = fz.read_artifact()
        assert cents == have_c
        assert [tuple(x) for x in books] == [tuple(x) for x in have_b]

    def test_spark_loader_matches_artifact(self, spark):
        c, b = _artifact()
        cents_df, books_df = _q81_frozen_state(spark)
        got_c = sorted(
            (r["cell_id"], list(r["cv"])) for r in cents_df.collect()
        )
        want_c = sorted(
            zip(
                c.column("cell_id").to_pylist(),
                [list(v) for v in c.column("cv").to_pylist()],
            )
        )
        assert got_c == want_c
        got_b = sorted(
            (r["subspace"], r["code_id"], list(r["cv"]))
            for r in books_df.select("subspace", "code_id", "cv").collect()
        )
        want_b = sorted(
            zip(
                b.column("subspace").to_pylist(),
                b.column("code_id").to_pylist(),
                [list(v) for v in b.column("cv").to_pylist()],
            )
        )
        assert got_b == want_b
        # cnorm2 is derived Spark-side, same as before the artifact move
        assert "cnorm2" in books_df.columns
