"""XL evidence for incremental semantic dedup: 1M-vector persisted
IVF-PQ index + a 100K-vector daily batch verdict, fresh session.

The number that matters is verdict_sec — the DAILY marginal cost of
semantic dedup against the standing corpus (the full-corpus
semantic_dedup twin re-pays the whole O(sum cell^2) every day). The
index build is one-time/offline and is recorded separately (see also
BENCH_XL.ivf_pq_index.build_sec for the query-index variant).

Usage: python tools/xl_semdedup_inc.py [--n=1000000] [--n-batch=100000]
Merges into BENCH_XL.json under "semantic_dedup_incremental".
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_data_warehouse_spark.operators.ann_index import (  # noqa: E402
    build_ivf_pq_index,
    incremental_semantic_dedup,
)
from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.sources.generators import (  # noqa: E402
    generate_clustered_embeddings,
)


def main() -> int:
    n = 1_000_000
    n_batch = 100_000
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--n-batch="):
            n_batch = int(a.split("=", 1)[1])

    spark = get_spark("xl-semdedup-inc")
    spark.sparkContext.setLogLevel("ERROR")
    para = spark.sparkContext.defaultParallelism

    corpus = generate_clustered_embeddings(
        spark, n, dim=16, n_clusters=256
    ).repartition(para).localCheckpoint()
    # the daily batch: same cluster geometry (same seed/centers), ids
    # offset above every corpus id — the append ordering the keep-
    # lowest-id policy assumes
    batch = (
        generate_clustered_embeddings(spark, n_batch, dim=16, n_clusters=256)
        .withColumn("vec_id", F.col("vec_id") + 10_000_000)
        .repartition(para)
        .localCheckpoint()
    )

    idx = tempfile.mkdtemp(prefix="xl_semdedup_idx_")
    t0 = time.time()
    build_ivf_pq_index(
        corpus,
        idx,
        n_cells=1024,
        m=4,
        codes=16,
        coarse_train_limit=131_072,
        assign_arrow=True,
    )
    build_sec = round(time.time() - t0, 3)
    print("build_sec", build_sec)

    runs: dict[str, list] = {"fold": [], "arrow": []}
    counts = None
    for mode in ("fold", "arrow", "fold", "arrow"):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        verdicts = incremental_semantic_dedup(
            corpus,
            batch,
            idx,
            threshold=0.95,
            assign_arrow=True,
            refine_arrow=(mode == "arrow"),
            sort=False,
        )
        agg = verdicts.agg(
            F.count("*").alias("n"),
            F.sum(F.col("kept").cast("long")).alias("kept"),
        ).first()
        runs[mode].append(round(time.time() - t0, 3))
        counts = {"n_verdicts": agg["n"], "kept": agg["kept"]}
        print(mode, "verdict_sec", runs[mode][-1], counts)

    # --- embedding day-2 arm (r9 judge task #9): fold THIS batch's
    # semantic verdict edges into a 1M-doc standing cluster mapping —
    # update_clusters wall time with edges from
    # incremental_semantic_dedup, not synthetic MinHash-style pairs.
    from etl_data_warehouse_spark.operators.cluster_index import (
        update_clusters,
    )

    state = tempfile.mkdtemp(prefix="xl_semdedup_clusters_")
    standing_pairs = spark.range(0, n, 2).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    ).repartition(para)
    update_clusters(standing_pairs, state)  # standing state, untimed

    sem_edges = (
        verdicts.filter(~F.col("kept"))
        .select(
            F.col("dup_of").alias("doc_a"),
            F.col("vec_id").alias("doc_b"),
        )
        .localCheckpoint()
    )
    n_edges = sem_edges.count()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    update_clusters(sem_edges, state).count()
    cluster_fold_sec = round(time.time() - t0, 3)
    print("semantic_cluster_fold_sec", cluster_fold_sec,
          "edges", n_edges)

    from bench import _merge_bench_xl  # shared read-merge-write

    row = {
        "n_corpus": n,
        "n_batch": n_batch,
        "method": "fresh_isolated_session_min_of_2",
        "index_build_sec": build_sec,
        "verdict_sec": min(runs["fold"]),
        "verdict_arrow_sec": min(runs["arrow"]),
        **counts,
    }
    _merge_bench_xl("/root/repo", {"semantic_dedup_incremental": row})
    _merge_bench_xl(
        "/root/repo",
        {
            "cluster_maintenance_semantic": {
                "n_docs_standing": n,
                "n_semantic_edges": n_edges,
                "method": "fresh_isolated_session_single_run",
                "batch_update_sec": cluster_fold_sec,
            }
        },
    )
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
