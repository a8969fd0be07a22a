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
        )
        agg = verdicts.agg(
            F.count("*").alias("n"),
            F.sum(F.col("kept").cast("long")).alias("kept"),
        ).first()
        runs[mode].append(round(time.time() - t0, 3))
        counts = {"n_verdicts": agg["n"], "kept": agg["kept"]}
        print(mode, "verdict_sec", runs[mode][-1], counts)

    from bench import _merge_bench_xl  # shared read-merge-write

    row = {
        "n_corpus": n,
        "n_batch": n_batch,
        "method": "fresh_session_min_of_2",
        "index_build_sec": build_sec,
        "verdict_sec": min(runs["fold"]),
        "verdict_arrow_sec": min(runs["arrow"]),
        **counts,
    }
    _merge_bench_xl("/root/repo", {"semantic_dedup_incremental": row})
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
