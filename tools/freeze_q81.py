"""Train and freeze q81's IVF-PQ quantizer artifact.

q81 (plans/llm_ops.q81_ivfadc_topk) replays IVFADC *inference* under a
TRAINED, FROZEN quantizer — the production trained-artifact pattern
(training happens offline, inference replays deterministically in any
engine; reference parity target: the analytics queries in
reference/analytics/queries.sql are all inference-side).

This script IS the offline training step. It is deterministic end to
end — both trainers seed from the n lowest vec_ids, break ties on
cell/code id, and fold distances left-to-right — so re-running it on
the same sf0.001 embeddings reproduces the committed artifact
BIT-FOR-BIT (verified in tests/test_q81_artifact.py, and `--verify`
here re-proves it on demand).

Training parameters (the round-9 freeze invocation, now committed
here so the hash-gated artifact is regenerable and auditable):

    coarse IVF:  kmeans_centroids(n_cells=16, max_iterations=4)
    PQ:          train_pq_codebooks(m=4, codes=16, max_iterations=4)
    corpus:      /root/testdata/sf0.001/embeddings.parquet (1000x64)

Artifact layout (small single-file parquet, written via pyarrow so no
Spark commit clutter):

    etl_data_warehouse_spark/artifacts/q81_quantizer/centroids.parquet
        (cell_id int32, cv list<double>)           -- 16 rows
    etl_data_warehouse_spark/artifacts/q81_quantizer/codebooks.parquet
        (subspace int32, code_id int32, cv list<double>)  -- 64 rows

Both engines load the SAME files at query time: Spark via
spark.read.parquet, the DuckDB oracle via read_parquet() — the state
cannot diverge between the twins.

Usage:
    python tools/freeze_q81.py            # retrain + overwrite artifact
    python tools/freeze_q81.py --verify   # retrain + compare, no write
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq_

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACT_DIR = os.path.join(
    REPO, "etl_data_warehouse_spark", "artifacts", "q81_quantizer"
)
N_CELLS, COARSE_ITERS = 16, 4
M, CODES, PQ_ITERS = 4, 16, 4


def train(sf_dir: str):
    """Returns (centroid_rows, codebook_rows) as plain sorted lists."""
    from pyspark.sql import SparkSession

    from etl_data_warehouse_spark.operators.pq import train_pq_codebooks
    from etl_data_warehouse_spark.operators.similarity import (
        kmeans_centroids,
    )
    from etl_data_warehouse_spark.sources.catalog import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = load_table(spark, "embeddings", sf_dir)
    cents = sorted(
        (r["cell_id"], list(r["cv"]))
        for r in kmeans_centroids(
            emb, n_cells=N_CELLS, max_iterations=COARSE_ITERS
        ).collect()
    )
    books = sorted(
        (r["subspace"], r["code_id"], list(r["cv"]))
        for r in train_pq_codebooks(
            emb, m=M, codes=CODES, max_iterations=PQ_ITERS
        )
        .select("subspace", "code_id", "cv")
        .collect()
    )
    spark.stop()
    return cents, books


def write_artifact(cents, books) -> None:
    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "cell_id": pa.array(
                    [c for c, _ in cents], type=pa.int32()
                ),
                "cv": pa.array(
                    [v for _, v in cents], type=pa.list_(pa.float64())
                ),
            }
        ),
        os.path.join(ARTIFACT_DIR, "centroids.parquet"),
    )
    pq_.write_table(
        pa.table(
            {
                "subspace": pa.array(
                    [s for s, _, _ in books], type=pa.int32()
                ),
                "code_id": pa.array(
                    [c for _, c, _ in books], type=pa.int32()
                ),
                "cv": pa.array(
                    [v for _, _, v in books],
                    type=pa.list_(pa.float64()),
                ),
            }
        ),
        os.path.join(ARTIFACT_DIR, "codebooks.parquet"),
    )


def read_artifact():
    c = pq_.read_table(os.path.join(ARTIFACT_DIR, "centroids.parquet"))
    b = pq_.read_table(os.path.join(ARTIFACT_DIR, "codebooks.parquet"))
    cents = sorted(
        zip(
            c.column("cell_id").to_pylist(),
            [list(v) for v in c.column("cv").to_pylist()],
        )
    )
    books = sorted(
        zip(
            b.column("subspace").to_pylist(),
            b.column("code_id").to_pylist(),
            [list(v) for v in b.column("cv").to_pylist()],
        )
    )
    return cents, books


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--verify",
        action="store_true",
        help="retrain and compare against the committed artifact "
        "(bit-for-bit); exit 1 on mismatch, write nothing",
    )
    args = ap.parse_args()
    cents, books = train(args.sf_dir)
    if args.verify:
        have_c, have_b = read_artifact()
        ok = have_c == cents and [tuple(x) for x in have_b] == [
            tuple(x) for x in books
        ]
        print(f"artifact matches retrain bit-for-bit: {ok}")
        return 0 if ok else 1
    write_artifact(cents, books)
    print(f"wrote {ARTIFACT_DIR} ({len(cents)} centroids, "
          f"{len(books)} codebook rows)")
    return 0


if __name__ == "__main__":
    main()
