"""Stage-level profile of build_ivf_pq_index at the XL operating point
(1M x dim16, n_cells=4096, coarse_train_limit=64*4096, assign_arrow) —
the decomposition behind BENCH_XL.ivf_pq_index.build_sec. Each stage is
timed the way build_ivf_pq_index runs it (same inputs, same flags), so
the sum reproduces the build and the max names the target.

Usage: python tools/profile_ivfpq_build.py [--n=1000000] [--cells=4096]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_data_warehouse_spark.operators import pq  # noqa: E402
from etl_data_warehouse_spark.operators import ann_index, similarity  # noqa: E402
from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.sources.generators import (  # noqa: E402
    generate_clustered_embeddings,
)


def main() -> int:
    n, n_cells, m, codes = 1_000_000, 4096, 4, 16
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--cells="):
            n_cells = int(a.split("=", 1)[1])
    coarse_limit = 64 * n_cells

    spark = get_spark("ivfpq-profile")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(tempfile.gettempdir(), "spark_graft_ivfpq_prof")
    shutil.rmtree(base, ignore_errors=True)
    para = spark.sparkContext.defaultParallelism
    generate_clustered_embeddings(
        spark, n, dim=16, n_clusters=max(1, n // 4), noise=0.02
    ).repartition(para).write.parquet(f"{base}/vecs.parquet")
    data = spark.read.parquet(f"{base}/vecs.parquet")

    out: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *exc):
                out[name] = round(time.time() - self.t0, 3)
                print(f"{name}: {out[name]}s", file=sys.stderr)

        return _T()

    sc = spark.sparkContext
    # --- stage 1: coarse k-means over the training subsample ---------
    sc.setJobDescription("coarse kmeans")
    with timed("coarse_kmeans"):
        train_c = data.orderBy("vec_id").limit(coarse_limit)
        cents = similarity.kmeans_centroids(
            train_c, n_cells=n_cells, max_iterations=4, assign_arrow=True
        )
    # --- stage 2: PQ codebooks over the 10K subsample (both trainers)
    sc.setJobDescription("pq codebooks (fold)")
    with timed("pq_codebooks_fold"):
        train = data.orderBy("vec_id").limit(10000)
        books = pq.train_pq_codebooks(
            train, m=m, codes=codes, max_iterations=4
        )
    sc.setJobDescription("pq codebooks (numpy)")
    with timed("pq_codebooks_numpy"):
        books_np = pq.train_pq_codebooks_numpy(
            train, m=m, codes=codes, max_iterations=4
        )
    books_np.count()
    # --- stage 3: state writes ----------------------------------------
    sc.setJobDescription("write quantizer state")
    with timed("write_state"):
        cents.write.mode("overwrite").parquet(f"{base}/ivfpq/centroids")
        books.write.mode("overwrite").parquet(f"{base}/ivfpq/codebooks")
    # --- stage 4: corpus encode (pack_encode_arrow) -------------------
    sc.setJobDescription("pack_encode_arrow")
    with timed("encode_packed"):
        pq.pack_encode_arrow(data, books).write.mode("overwrite").parquet(
            f"{base}/ivfpq/packed/batch=0"
        )
    # --- stage 5: corpus cell assignment -------------------------------
    sc.setJobDescription("assign cells")
    with timed("assign_cells"):
        ann_index._assign_cells(data, cents, True, "embedding").write.mode(
            "overwrite"
        ).parquet(f"{base}/ivfpq/assigned/batch=0")

    out["total"] = round(sum(v for v in out.values()), 3)
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"op": "ivf_pq_build_profile", "n": n,
                      "n_cells": n_cells, "stages": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
