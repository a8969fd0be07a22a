"""XL evidence for whitened SemDeDup (r9 judge task #4): 1M vectors,
whiten (fixed-point Gramian PCA train + Arrow projection) + semantic
dedup, fresh session — the published-SemDeDup shape at the 10^6
operating point.

Also records the whitened incremental arm: a whitened IVF-PQ index on
the 1M standing corpus + a 100K-batch verdict under the frozen model
(the O(batch) daily path; corpus passed PRE-PROJECTED — the persisted
state shape — so the refine's semi-join prune reaches the scan).

Usage: python tools/xl_whitened.py [--n=1000000] [--n-batch=100000]
Merges into BENCH_XL.json under "whitened_semantic_dedup".
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_data_warehouse_spark.operators import similarity  # noqa: E402
from etl_data_warehouse_spark.operators.ann_index import (  # noqa: E402
    build_whitened_ivf_pq_index,
    incremental_semantic_dedup_whitened,
    load_whitening,
)
from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.sources.generators import (  # noqa: E402
    generate_clustered_embeddings,
)

DIM = 64


def main() -> int:
    n = 1_000_000
    n_batch = 100_000
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--n-batch="):
            n_batch = int(a.split("=", 1)[1])

    spark = get_spark("xl-whitened")
    spark.sparkContext.setLogLevel("ERROR")
    para = spark.sparkContext.defaultParallelism

    corpus = (
        generate_clustered_embeddings(spark, n, dim=DIM, n_clusters=1024)
        .repartition(para)
        .localCheckpoint()
    )

    # --- one-shot whitened SemDeDup over the full corpus --------------
    t0 = time.time()
    verdicts = similarity.whitened_semantic_dedup(
        corpus,
        threshold=0.95,
        dim=DIM,
        n_cells=1024,
        assign_arrow=True,
        pairs_arrow=True,
    )
    agg = verdicts.agg(
        F.count("*").alias("n"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).first()
    full_sec = round(time.time() - t0, 3)
    print("whiten+dedup_sec", full_sec, dict(n=agg["n"], kept=agg["kept"]))

    # --- incremental arm under the frozen model ------------------------
    # different seed: the batch gets its own cluster geometry, so
    # verdicts are a realistic mix instead of the shared-seed
    # generator's every-vector-is-a-dup degenerate outcome (the
    # candidate/refine WORK is the same either way)
    batch = (
        generate_clustered_embeddings(
            spark, n_batch, dim=DIM, n_clusters=1024, seed=43
        )
        .withColumn("vec_id", F.col("vec_id") + 10_000_000)
        .repartition(para)
        .localCheckpoint()
    )
    idx = tempfile.mkdtemp(prefix="xl_whitened_idx_")
    proj_state = tempfile.mkdtemp(prefix="xl_whitened_proj_")
    t0 = time.time()
    build_whitened_ivf_pq_index(
        corpus,
        idx,
        n_cells=1024,
        m=4,
        codes=16,
        coarse_train_limit=131_072,
        assign_arrow=True,
    )
    # persist the projected standing vectors — the state table the
    # daily path keeps next to the packed codes
    model = load_whitening(idx)
    similarity.pca_project(corpus, model[0], model[1], model[2]).select(
        "vec_id", F.col("projected").alias("embedding")
    ).write.mode("overwrite").parquet(proj_state + "/data")
    build_sec = round(time.time() - t0, 3)
    print("whitened_index_build_sec", build_sec)

    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    inc = incremental_semantic_dedup_whitened(
        spark.read.parquet(proj_state + "/data"),
        batch,
        idx,
        threshold=0.95,
        corpus_projected=True,
        assign_arrow=True,
        refine_arrow=True,
    )
    iagg = inc.agg(
        F.count("*").alias("n"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).first()
    verdict_sec = round(time.time() - t0, 3)
    print("whitened_incremental_verdict_sec", verdict_sec,
          dict(n=iagg["n"], kept=iagg["kept"]))

    from bench import _merge_bench_xl  # shared read-merge-write

    row = {
        "n_corpus": n,
        "n_batch": n_batch,
        "dim": DIM,
        "method": "fresh_session_single_run",
        "whiten_plus_dedup_sec": full_sec,
        "full_kept": agg["kept"],
        "whitened_index_build_sec": build_sec,
        "incremental_verdict_sec": verdict_sec,
        "incremental_kept": iagg["kept"],
    }
    _merge_bench_xl("/root/repo", {"whitened_semantic_dedup": row})
    print(json.dumps(row))
    shutil.rmtree(idx, ignore_errors=True)
    shutil.rmtree(proj_state, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
