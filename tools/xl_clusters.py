"""XL evidence for incremental cluster maintenance: a 1M-doc standing
(doc_id, component) mapping + a 100K-pair daily batch folded in with
operators/cluster_index.update_clusters.

Pair GENERATION at 1M is already measured (BENCH_XL
queries.incremental_dedup_batch); this times the cluster-state HALF of
the daily chain in isolation: the batch merges 25K existing cluster
pairs, links 25K singletons into existing clusters, and opens 25K new
2-doc clusters — the three update shapes — so the affected-subgraph
path (semi-joins + star edges + subgraph CC + versioned commit) runs
on a realistic mix.

Usage: python tools/xl_clusters.py [--n=1000000] [--n-pairs=100000]
Merges into BENCH_XL.json under "cluster_maintenance".
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_data_warehouse_spark.operators.cluster_index import (  # noqa: E402
    read_clusters,
    update_clusters,
)
from etl_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    n = 1_000_000
    n_pairs = 100_000
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--n-pairs="):
            n_pairs = int(a.split("=", 1)[1])

    spark = get_spark("xl-clusters")
    spark.sparkContext.setLogLevel("ERROR")
    para = spark.sparkContext.defaultParallelism
    state = tempfile.mkdtemp(prefix="xl_cluster_state_")

    # standing state: n docs in n/2 two-doc clusters (component = the
    # even member), committed as version 1 the normal way
    base_pairs = spark.range(0, n, 2).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    ).repartition(para)
    t0 = time.time()
    update_clusters(base_pairs, state)
    build_sec = round(time.time() - t0, 3)
    print("standing_state_sec", build_sec)

    third = n_pairs // 3
    merges = spark.range(third).select(
        (F.col("id") * 8).alias("doc_a"),       # component reps ...
        (F.col("id") * 8 + 4).alias("doc_b"),   # ... of the next cluster
    )
    links = spark.range(third).select(
        (F.col("id") * 8 + 2).alias("doc_a"),   # existing member
        (F.col("id") + 2 * n).alias("doc_b"),   # brand-new doc
    )
    fresh = spark.range(third).select(
        (F.col("id") * 2 + 4 * n).alias("doc_a"),
        (F.col("id") * 2 + 4 * n + 1).alias("doc_b"),
    )
    batch = merges.unionByName(links).unionByName(fresh).repartition(para)

    t0 = time.time()
    out = update_clusters(batch, state)
    n_rows = out.count()
    update_sec = round(time.time() - t0, 3)
    n_components = (
        read_clusters(spark, state).select("component").distinct().count()
    )
    print("batch_update_sec", update_sec, "rows", n_rows,
          "components", n_components)

    from bench import _merge_bench_xl  # shared read-merge-write

    row = {
        "n_docs_standing": n,
        "n_batch_pairs": 3 * third,
        "method": "fresh_isolated_session_single_run",
        "standing_state_sec": build_sec,
        "batch_update_sec": update_sec,
        "mapping_rows": n_rows,
        "n_components": n_components,
    }
    _merge_bench_xl("/root/repo", {"cluster_maintenance": row})
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
