"""Run ONE XL-scale operator in a brand-new process/SparkSession.

bench.py's --xl-only mode runs the whole XL suite in one JVM, which is
the honest "daily pipeline" shape — but op ORDER inside that JVM still
colors individual numbers (the 8 GB local-mode heap never fully
reclaims a prior op's litter; see the op-order note in bench._xl_section
and the CLAUDE.md fresh-session rule). When ONE number needs an
uncontaminated reading (drift questions like semantic_dedup r4=82s vs
r6/r7=128-146s), this tool generates the same corpus and runs exactly
that operator, alone, MIN of --runs executions.

Usage:  python tools/xl_one.py semantic_dedup [--n=1000000] [--runs=2]
Ops:    semantic_dedup | hyperplane_lsh_wide | exact_dedup |
        simhash_blocked | lm_perplexity | doc_chunking | dup_span_removal |
        eval_decontamination | training_shards | gramian_arrow
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

from etl_data_warehouse_spark.operators import dedup, similarity  # noqa: E402
from etl_data_warehouse_spark.operators import corpus as corpus_ops  # noqa: E402
from etl_data_warehouse_spark.plans.text_quality import (  # noqa: E402
    remove_dup_spans,
)
from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.sources.generators import (  # noqa: E402
    generate_clustered_embeddings,
    generate_documents,
)


def _decontaminate(data):
    from etl_data_warehouse_spark.plans.text_quality import (
        decontaminate_spans,
    )

    train = data.filter(F.col("doc_id") % 10 != 0)
    evals = data.filter(F.col("doc_id") % 10 == 0)
    return decontaminate_spans(
        train, evals, hash_keys=True, broadcast_banned=False
    )


def main() -> int:
    op = sys.argv[1]
    n = 1_000_000
    runs = 2
    for a in sys.argv[2:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])

    spark = get_spark("xl-one")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(tempfile.gettempdir(), "spark_graft_xl_one")
    shutil.rmtree(base, ignore_errors=True)
    para = spark.sparkContext.defaultParallelism

    # identical corpora to bench._xl_section
    if op == "gramian_arrow":
        # driver-shaped dim (64) at 1M rows: the q151 scale path
        generate_clustered_embeddings(
            spark, n, dim=64, n_clusters=256
        ).repartition(para).write.parquet(f"{base}/gvecs.parquet")
        data = spark.read.parquet(f"{base}/gvecs.parquet")
    elif op in (
        "semantic_dedup", "hyperplane_lsh_wide", "ivf_pq_index",
        "srp_candidates",
    ):
        generate_clustered_embeddings(
            spark, n, dim=16, n_clusters=max(1, n // 4), noise=0.02
        ).repartition(para).write.parquet(f"{base}/ndvecs.parquet")
        data = spark.read.parquet(f"{base}/ndvecs.parquet")
    else:
        generate_documents(spark, n).repartition(para).write.parquet(
            f"{base}/docs.parquet"
        )
        data = spark.read.parquet(f"{base}/docs.parquet")

    ops = {
        "semantic_dedup": lambda: similarity.semantic_dedup(
            data, threshold=0.90, n_cells=max(256, n // 64),
            assign_arrow=True, pairs_arrow=True, sort=False,
        ),
        "hyperplane_lsh_wide": lambda: similarity.hyperplane_lsh_neardup(
            data, threshold=0.90, n_planes=384, bands=16
        ),
        "exact_dedup": lambda: dedup.exact_dedup_groups(data),
        "simhash_blocked": lambda: dedup.simhash_pairs_blocked(
            data, signatures=dedup.simhash_signatures
        ),
        "lm_perplexity": lambda: corpus_ops.lm_perplexity_score(
            data, data.filter(F.col("doc_id") % 5 == 0)
        ),
        "doc_chunking": lambda: corpus_ops.chunk_documents(data),
        "dup_span_removal": lambda: remove_dup_spans(data, hash_keys=True),
        # q128's operator in its LARGE-eval-set configuration: a 10%
        # eval slice of the corpus is far past broadcast size at 1M, so
        # the banned-gram join runs as a shuffled semi-join on hashed
        # 8-byte gram keys (the registered q128 uses the broadcast path
        # because real benchmark sets are small)
        "eval_decontamination": lambda: _decontaminate(data),
        "gramian_arrow": lambda: similarity.gramian_arrow(data, dim=64),
    }
    if op == "containment_indexed":
        # 1M docs + 200K planted lead-snippets (every 5th doc's first
        # 22 tokens under id+10M): the one-sided bottom-k candidate
        # path at the 10^6 operating point — true-subset recall is
        # deterministic, so the snippet count pins correctness at scale
        toks = F.split(F.trim("text"), " +")
        snips = (
            data.filter(F.col("doc_id") % 5 == 0)
            .select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.array_join(F.slice(toks, 1, 22), " ").alias("text"),
            )
        )
        corpus = (
            data.select("doc_id", "text").unionByName(snips)
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint()
        )
        from etl_data_warehouse_spark.operators.dedup import (
            containment_pairs_indexed,
        )

        times, n_pairs, n_snip = [], None, None
        for _ in range(runs):
            t0 = time.time()
            got = containment_pairs_indexed(corpus, threshold=0.9)
            agg = got.agg(
                F.count("*").alias("n"),
                F.sum(
                    (F.col("doc_inner") >= 10_000_000).cast("long")
                ).alias("n_snip"),
            ).first()
            times.append(round(time.time() - t0, 3))
            n_pairs, n_snip = agg["n"], agg["n_snip"]
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        shutil.rmtree(base, ignore_errors=True)
        print(json.dumps({
            "op": op, "n": n, "n_snippets": n // 5,
            "method": "isolated_fresh_session",
            "min_sec": min(times), "all": times,
            "n_pairs": n_pairs, "snippet_inner_pairs": n_snip,
        }))
        return 0
    if op == "incremental_dedup_batch":
        # the daily LSH shape: one-time bucketed index build over 90%
        # of the corpus, then the 10% batch joined Exchange-free
        # against it — index_build timed once (it is the amortized
        # one-time cost), the BATCH probe min-of-runs
        from etl_data_warehouse_spark.operators import dedup_index

        cut = int(n * 0.9)
        spark.sql("DROP TABLE IF EXISTS xlone_lsh_bands")
        spark.sql("DROP TABLE IF EXISTS xlone_lsh_shingles")
        t0 = time.time()
        dedup_index.build_minhash_index(
            data.filter(F.col("doc_id") < cut), f"{base}/lsh_index",
            buckets=32, table_prefix="xlone_lsh",
        )
        build_sec = round(time.time() - t0, 3)
        batch = data.filter(F.col("doc_id") >= cut)
        times = []
        for _ in range(runs):
            t0 = time.time()
            dedup_index.incremental_dedup(
                spark, batch, f"{base}/lsh_index",
                bands_table="xlone_lsh_bands",
                shingles_table="xlone_lsh_shingles",
            ).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        shutil.rmtree(base, ignore_errors=True)
        print(json.dumps({
            "op": op, "n": n, "method": "isolated_fresh_session",
            "index_build_sec": build_sec,
            "min_sec": min(times), "all": times,
        }))
        return 0
    if op == "ivf_pq_index":
        # persisted-ANN headline: one-time 1M build (n_cells=4096, the
        # ~4*sqrt(N) sizing), then a 1K-query batch against the
        # persisted index min-of-runs, with recall vs brute force
        from etl_data_warehouse_spark.operators import ann_index

        t0 = time.time()
        ann_index.build_ivf_pq_index(
            data, f"{base}/ivfpq", n_cells=4096, m=4, codes=16,
            coarse_train_limit=64 * 4096, assign_arrow=True,
        )
        build_sec = round(time.time() - t0, 3)
        qv = data.filter(F.col("vec_id") < 1000).localCheckpoint()
        times, ann = [], None
        for _ in range(runs):
            t0 = time.time()
            ann = ann_index.query_ivf_pq_index(
                data, qv, f"{base}/ivfpq", k=3, nprobe=8,
                assign_arrow=True,
            ).localCheckpoint()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        from bench import _recall_at_k

        recall = _recall_at_k(ann, data, qv, k=3)
        shutil.rmtree(base, ignore_errors=True)
        print(json.dumps({
            "op": op, "n": n, "n_queries": 1000,
            "method": "isolated_fresh_session",
            "build_sec": build_sec,
            "query_batch_min_sec": min(times), "all": times,
            "recall_at3_vs_brute_force": recall,
        }))
        return 0
    if op == "srp_candidates":
        # candidate-volume probes for both band shapes (counts only —
        # never materializes pairs)
        c16, m16 = similarity.srp_candidate_count(
            data, n_planes=256, bands=16
        )
        c24, m24 = similarity.srp_candidate_count(
            data, n_planes=384, bands=16
        )
        shutil.rmtree(base, ignore_errors=True)
        print(json.dumps({
            "op": op, "n": n, "method": "isolated_fresh_session",
            "bands16x16bit": {"candidates": c16, "max_bucket": m16},
            "bands16x24bit": {"candidates": c24, "max_bucket": m24},
        }))
        return 0
    if op == "training_shards":
        # real write path (not a noop sink): one-shot shard write of the
        # full corpus, then one 10%-sized incremental batch append
        from etl_data_warehouse_spark.sources import shards

        cut = int(n * 0.9)
        out = f"{base}/shards"
        t0 = time.time()
        shards.write_training_shards(
            data.filter(F.col("doc_id") < cut), out, n_shards=64
        ).write.format("noop").mode("overwrite").save()
        write_sec = round(time.time() - t0, 3)
        t0 = time.time()
        shards.append_training_batch(
            data.filter(F.col("doc_id") >= cut), f"{base}/shards_inc", 0,
            n_shards=64,
        )
        shards.append_training_batch(
            data.filter(F.col("doc_id") < cut), f"{base}/shards_inc", 1,
            n_shards=64,
        )
        append_sec = round(time.time() - t0, 3)
        shutil.rmtree(base, ignore_errors=True)
        print(json.dumps({
            "op": op, "n": n, "method": "isolated_fresh_session",
            "oneshot_write_sec": write_sec,
            "two_batch_append_sec": append_sec,
        }))
        return 0
    times = []
    for _ in range(runs):
        t0 = time.time()
        ops[op]().write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({
        "op": op, "n": n, "method": "isolated_fresh_session",
        "min_sec": min(times), "all": times,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
