"""Stage-level profiles of the XL scale-killers the r13 verdict names:
semantic_dedup (62.8s/1M) and hyperplane_lsh_wide (83.9s/1M). Same
corpus recipe as bench._xl_section / tools/xl_one.py; stages are timed
with noop-sink/count actions that match what the operator itself pays.

Usage: python tools/profile_xl_ops.py semantic_dedup|hyperplane [--n=N]
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

from etl_data_warehouse_spark.operators import similarity  # noqa: E402
from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.sources.generators import (  # noqa: E402
    generate_clustered_embeddings,
)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    op = sys.argv[1]
    n = 1_000_000
    for a in sys.argv[2:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])

    spark = get_spark("xl-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = os.path.join(tempfile.gettempdir(), "spark_graft_xlprof")
    shutil.rmtree(base, ignore_errors=True)
    para = sc.defaultParallelism
    generate_clustered_embeddings(
        spark, n, dim=16, n_clusters=max(1, n // 4), noise=0.02
    ).repartition(para).write.parquet(f"{base}/ndvecs.parquet")
    data = spark.read.parquet(f"{base}/ndvecs.parquet")

    out: dict[str, object] = {}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 3)
        print(f"{name}: {out[name]}s", file=sys.stderr)
        return r

    if op == "semantic_dedup":
        n_cells = max(256, n // 64)
        # stage 1: norm + arrow assignment + checkpoint (as the op does)
        sc.setJobDescription("assign")
        v = similarity.with_norm(data).select(
            F.col("vec_id").alias("vid"),
            F.col("_v").alias("vv"),
            F.col("_norm").alias("vn"),
        )
        cents = (
            similarity.with_norm(data)
            .orderBy("vec_id")
            .limit(n_cells)
            .select(
                F.col("vec_id").alias("cell_id"),
                F.col("_v").alias("cv"),
                F.col("_norm").alias("cn"),
            )
        )
        assigned = timed(
            "assign_ckpt",
            lambda: similarity.rank_cells(v, cents, 1, assign_arrow=True)
            .filter(F.col("r") == 0)
            .select("vid", "vv", "vn", "cell_id")
            .localCheckpoint(),
        )
        # stage 2: the pairs_arrow applyInPandas + dup agg
        sc.setJobDescription("pairs")
        import numpy as np
        import pandas as pd

        tau = 0.90

        def prune(pdf):
            if len(pdf) < 2:
                return pd.DataFrame({"vec_id": [], "dup_of": []}).astype(
                    {"vec_id": "int64", "dup_of": "int64"}
                )
            order = np.argsort(pdf["vid"].to_numpy(), kind="stable")
            ids = pdf["vid"].to_numpy()[order]
            V = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["vv"]]
            )[order]
            V = V / pdf["vn"].to_numpy()[order][:, None]
            hits = np.triu(V @ V.T >= tau, k=1)
            any_dup = hits.any(axis=0)
            first = hits.argmax(axis=0)
            return pd.DataFrame(
                {"vec_id": ids[any_dup], "dup_of": ids[first[any_dup]]}
            )

        dups = assigned.groupBy("cell_id").applyInPandas(
            prune, "vec_id bigint, dup_of bigint"
        )
        timed("pairs_noop", lambda: _noop(dups))
        # stage 3: verdict join WITHOUT the final global sort
        sc.setJobDescription("verdict join (no sort)")
        verdict = (
            assigned.select(F.col("vid").alias("vec_id"), "cell_id")
            .join(dups, "vec_id", "left")
            .select(
                "vec_id", "cell_id",
                F.col("dup_of").isNull().alias("kept"), "dup_of",
            )
        )
        timed("verdict_nosort_noop", lambda: _noop(verdict))
        # stage 4: verdict join WITH the orderBy (the shipped shape)
        sc.setJobDescription("verdict join (sorted)")
        timed("verdict_sorted_noop", lambda: _noop(verdict.orderBy("vec_id")))
        # reference: whole operator end to end
        sc.setJobDescription("full operator")
        timed(
            "full_op",
            lambda: _noop(
                similarity.semantic_dedup(
                    data, threshold=0.90, n_cells=n_cells,
                    assign_arrow=True, pairs_arrow=True,
                )
            ),
        )
    elif op == "hyperplane":
        n_planes, bands, threshold = 384, 16, 0.90
        import math

        sc.setJobDescription("signatures")
        sig = timed(
            "signatures_ckpt",
            lambda: similarity.srp_signatures(
                data, n_planes, bands, 0x51A7
            ).localCheckpoint(),
        )
        keyed = sig.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.col(f"band_{b}").alias("bv"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("k"),
        ).select("vec_id", "k.band", "k.bv")
        a = keyed.select(F.col("vec_id").alias("vec_a"), "band", "bv")
        b = keyed.select(F.col("vec_id").alias("vec_b"), "band", "bv")
        raw = (
            a.join(b, ["band", "bv"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
        )
        sc.setJobDescription("bucket join only")
        timed("bucket_join_count", lambda: raw.count())
        q_thr = math.acos(min(1.0, max(-1.0, threshold))) / math.pi
        sigma = math.sqrt(q_thr * (1.0 - q_thr) / n_planes)
        max_bits = int(math.ceil(n_planes * (q_thr + 4.0 * sigma)))
        sig_a = sig.select(
            F.col("vec_id").alias("vec_a"),
            *[F.col(f"band_{i}").alias(f"sa_{i}") for i in range(bands)],
        )
        sig_b = sig.select(
            F.col("vec_id").alias("vec_b"),
            *[F.col(f"band_{i}").alias(f"sb_{i}") for i in range(bands)],
        )
        hamming = sum(
            F.bit_count(F.col(f"sa_{i}").bitwiseXOR(F.col(f"sb_{i}")))
            for i in range(bands)
        )
        cands = (
            raw.join(sig_a, "vec_a")
            .join(sig_b, "vec_b")
            .filter(hamming <= F.lit(max_bits))
            .select("vec_a", "vec_b")
            .distinct()
        )
        sc.setJobDescription("joins+prefilter+distinct")
        out["n_candidates"] = timed("prefilter_distinct_count",
                                    lambda: cands.count())
        sc.setJobDescription("full operator")
        timed(
            "full_op",
            lambda: _noop(
                similarity.hyperplane_lsh_neardup(
                    data, threshold=threshold, n_planes=n_planes,
                    bands=bands,
                )
            ),
        )
    else:
        raise SystemExit(f"unknown op {op}")

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"op": op, "n": n, "stages": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
