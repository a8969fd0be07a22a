"""XL evidence for whitened SemDeDup (r9 judge task #4): 1M vectors,
whiten (fixed-point Gramian PCA train + Arrow projection) + semantic
dedup, fresh session — the published-SemDeDup shape at the 10^6
operating point.

Also records the whitened incremental arm: a whitened IVF-PQ index on
the 1M standing corpus + a 100K-batch verdict under the frozen model
(the O(batch) daily path; the corpus side is the index's OWN
``projected/`` state table — build materializes it in one pass since
r11 — so the refine's semi-join prune reaches the scan).

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
        sort=False,
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
    t0 = time.time()
    # build materializes projected/batch=0 itself since r11 — the
    # projection runs ONCE and the state table the daily path needs
    # falls out of the build (no separate caller-side projection pass)
    build_whitened_ivf_pq_index(
        corpus,
        idx,
        n_cells=1024,
        m=4,
        codes=16,
        coarse_train_limit=131_072,
        assign_arrow=True,
    )
    build_sec = round(time.time() - t0, 3)
    print("whitened_index_build_sec", build_sec)

    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    inc = incremental_semantic_dedup_whitened(
        None,  # corpus=None: the index's own projected/ state table
        batch,
        idx,
        threshold=0.95,
        assign_arrow=True,
        refine_arrow=True,
        sort=False,
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
        "method": "fresh_isolated_session_single_run",
        "whiten_plus_dedup_sec": full_sec,
        "full_kept": agg["kept"],
        "whitened_index_build_sec": build_sec,
        "incremental_verdict_sec": verdict_sec,
        "incremental_kept": iagg["kept"],
    }
    _merge_bench_xl("/root/repo", {"whitened_semantic_dedup": row})
    print(json.dumps(row))
    shutil.rmtree(idx, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
