"""Train and freeze q157's PCA-whitening model artifact.

q157 (plans/llm_ops.q157_whitened_semantic_dedup) runs SemDeDup's
published whitening step (Abbas et al. 2023, arXiv:2303.09540 §3)
under a TRAINED, FROZEN whitening model — the same trained-artifact
pattern as q81's quantizer (tools/freeze_q81.py): training happens
offline here, inference (project + cluster + prune) replays
deterministically in BOTH engines from the same committed parquet
files, so the whitened path sits under the driver's full hash gate
instead of being pytest-only.

This script IS the offline training step: one distributed fixed-point
Gramian pass over the sf0.001 planted-twin corpus (the q41/q82
corpus — base embeddings plus deterministic perturbed twins) trains
the PCA model (operators/similarity.pca_model), the d x d
eigendecomposition runs on the driver, and eigenvector SIGNS are
canonicalized (largest-|coefficient| positive — eigh's sign choice is
the only LAPACK-version-dependent bit) so re-running on the same
corpus reproduces the committed artifact BIT-FOR-BIT (`--verify`
re-proves on demand; tests/test_q157_artifact.py pins it).

Training parameters:

    corpus: /root/testdata/sf0.001/embeddings.parquet (500 x 64)
            + deterministic twins (llm_ops._twin_corpus) = 1000 x 64
    model:  pca_model(dim=64, k=K_COMPONENTS) — mean, top-K
            components, eigenvalues; whitening scale = 1/sqrt(eval)
            precomputed HERE so both engines only ever multiply by
            the same frozen double (divide-vs-multiply would drift).

Artifact layout (single-file parquet via pyarrow):

    etl_data_warehouse_spark/artifacts/q157_whitening/mean.parquet
        (mean list<double>)                         -- 1 row
    etl_data_warehouse_spark/artifacts/q157_whitening/components.parquet
        (comp_id int32, w list<double>, scale double)  -- K rows

Both engines load the SAME files at query time: Spark via
spark.read.parquet, the DuckDB oracle via read_parquet().

Usage:
    python tools/freeze_q157.py            # retrain + overwrite artifact
    python tools/freeze_q157.py --verify   # retrain + compare, no write
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
    REPO, "etl_data_warehouse_spark", "artifacts", "q157_whitening"
)
DIM = 64
K_COMPONENTS = 32


def train(sf_dir: str):
    """Returns (mean list, comps list-of-(comp_id, w, scale))."""
    import numpy as np
    from pyspark.sql import SparkSession

    from etl_data_warehouse_spark.operators.similarity import pca_model
    from etl_data_warehouse_spark.plans.llm_ops import _twin_corpus
    from etl_data_warehouse_spark.sources.catalog import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    corpus = _twin_corpus(load_table(spark, "embeddings", sf_dir))
    mean, comps, evals = pca_model(corpus, DIM, K_COMPONENTS)
    spark.stop()
    # Canonical eigenvector sign: largest-|coefficient| positive.
    for j in range(comps.shape[0]):
        pivot = int(np.argmax(np.abs(comps[j])))
        if comps[j, pivot] < 0:
            comps[j] = -comps[j]
    scales = 1.0 / np.sqrt(evals)
    return (
        [float(x) for x in mean],
        [
            (j, [float(x) for x in comps[j]], float(scales[j]))
            for j in range(comps.shape[0])
        ],
    )


def write_artifact(mean, comps) -> None:
    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    pq_.write_table(
        pa.table({"mean": pa.array([mean], type=pa.list_(pa.float64()))}),
        os.path.join(ARTIFACT_DIR, "mean.parquet"),
    )
    pq_.write_table(
        pa.table(
            {
                "comp_id": pa.array(
                    [j for j, _, _ in comps], type=pa.int32()
                ),
                "w": pa.array(
                    [w for _, w, _ in comps], type=pa.list_(pa.float64())
                ),
                "scale": pa.array(
                    [s for _, _, s in comps], type=pa.float64()
                ),
            }
        ),
        os.path.join(ARTIFACT_DIR, "components.parquet"),
    )


def read_artifact():
    m = pq_.read_table(os.path.join(ARTIFACT_DIR, "mean.parquet"))
    c = pq_.read_table(os.path.join(ARTIFACT_DIR, "components.parquet"))
    mean = [float(x) for x in m.column("mean").to_pylist()[0]]
    comps = sorted(
        zip(
            c.column("comp_id").to_pylist(),
            [[float(x) for x in w] for w in c.column("w").to_pylist()],
            [float(s) for s in c.column("scale").to_pylist()],
        )
    )
    return mean, [(j, w, s) for j, w, s in comps]


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
    mean, comps = train(args.sf_dir)
    if args.verify:
        have_mean, have_comps = read_artifact()
        ok = have_mean == mean and have_comps == comps
        print("VERIFY:", "MATCH" if ok else "MISMATCH")
        return 0 if ok else 1
    write_artifact(mean, comps)
    print(f"wrote {ARTIFACT_DIR} (K={len(comps)}, dim={DIM})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
