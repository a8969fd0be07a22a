"""XL evidence for the composed day-2 ingest pipeline (r9 judge task
#1): bootstrap a 1M-doc / 1M-vector standing state as day 1, then time
the WHOLE day-2 chain — curation gates → clean funnel → incremental
MinHash + semantic dedup → cluster maintenance → index/vector appends
→ shard append — for a 100K batch.

The number that matters is day2_sec: the daily marginal cost of the
full pipeline at the 10^6 operating point (every link is O(batch) /
O(affected); a full rebuild re-pays the corpus every day).

Sources are hash-spread over ~1000 values (≈11K hosts) so the
curation rank window parallelizes the way a real crawl's domain grain
does — two synthetic sources would put 1M rows into 2 window
partitions and measure skew, not the pipeline.

Usage: python tools/xl_day2.py [--n=1000000] [--n-batch=100000]
Merges into BENCH_XL.json under "day2_pipeline".
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_data_warehouse_spark.plans.day2_pipeline import (  # noqa: E402
    run_day2_ingest,
)
from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.sources.generators import (  # noqa: E402
    generate_clustered_embeddings,
    generate_documents,
)

DIM = 16


def _slice(spark, lo: int, hi: int, para: int, day: int):
    """Docs + matching vectors for ids in [lo, hi): near-dup TEXTS
    planted by the generator (~10% point at earlier ids — mostly
    cross-day, the realistic re-crawl mix); embeddings get a PER-DAY
    cluster geometry (seed varies) and wide noise, so the semantic arm
    does full candidate/refine work without the degenerate
    every-vector-is-a-dup outcome the shared-seed generator produces
    (its clusters are built FOR ANN recall, cosine ~0.999 within)."""
    n_total = hi  # generator plants dups against ids < hi
    docs = (
        generate_documents(spark, n_total, n_words=40, dup_rate=0.1)
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .withColumn(
            "source",
            F.concat(F.lit("s"), F.pmod(F.xxhash64("doc_id"), F.lit(1000))),
        )
        .repartition(para)
        .localCheckpoint()
    )
    vecs = (
        generate_clustered_embeddings(
            spark, n_total, dim=DIM, n_clusters=1024,
            noise=2.0, seed=42 + day,
        )
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .repartition(para)
        .localCheckpoint()
    )
    return docs, vecs


def main() -> int:
    n = 1_000_000
    n_batch = 100_000
    containment = False
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--n-batch="):
            n_batch = int(a.split("=", 1)[1])
        if a == "--containment":
            # third dedup arm ON: records under its own BENCH_XL key so
            # the base day2_pipeline row stays comparable across rounds
            containment = True

    spark = get_spark("xl-day2")
    spark.sparkContext.setLogLevel("ERROR")
    para = spark.sparkContext.defaultParallelism
    state = tempfile.mkdtemp(prefix="xl_day2_state_")

    cfg = dict(
        domain_cap=1_000_000_000,  # non-binding at XL (binding is
        # covered by the contract tests; an XL binding cap would only
        # measure the same window)
        n_cells=1024,
        m=4,
        codes=16,
        n_shards=64,
        pack_budget=2048,
    )
    if containment:
        cfg["containment"] = True  # k=8 / max_df=1000 defaults

    # Standing state is built the way the pipeline is DESIGNED to build
    # it — day by day in batch-sized slices (n // n_batch prior days),
    # never a single 1M banded-LSH pass (the CLAUDE.md candidate bound:
    # full minhash_lsh_pairs is fine at 100K and fatal at 1M; the
    # incremental path is the 10^6 operating mode).
    n_days = max(1, n // n_batch)
    boot_secs = []
    for day in range(n_days):
        d, v = _slice(spark, day * n_batch, (day + 1) * n_batch, para, day)
        t0 = time.time()
        run_day2_ingest(
            d, v, state, batch_id=day + 1, semantic_arrow=True, minhash_arrow=True, **cfg
        )
        boot_secs.append(round(time.time() - t0, 3))
        print(f"bootstrap day {day + 1}/{n_days}", boot_secs[-1])
        # bench.py's _release_session_state discipline: Python gc FIRST
        # (py4j proxies keep prior days' localCheckpoint RDDs alive
        # through System.gc() otherwise), then the JVM GC — without it
        # late bootstrap days and the day-under-test inherit the whole
        # run's heap litter (xl3 r13: days 2-7 at 53-60s, day 10 at 91s)
        import gc

        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)

    d2, v2 = _slice(spark, n, n + n_batch, para, n_days)
    t0 = time.time()
    a2 = run_day2_ingest(
        d2, v2, state, batch_id=n_days + 1, semantic_arrow=True, minhash_arrow=True, **cfg
    )
    day2_sec = round(time.time() - t0, 3)
    print("day2_sec", day2_sec, a2)

    from bench import _merge_bench_xl  # shared read-merge-write

    row = {
        "n_standing": n,
        "n_batch": n_batch,
        "method": "fresh_isolated_session_single_run",
        "minhash_buckets": 32,  # the r11 bucketed-index default
        "semantic_arrow": True,  # the 10^6 execution mode (Arrow twins)
        "minhash_arrow": True,  # numpy signature twin (r12, bit-identical)
        "containment": containment,
        "bootstrap_days": n_days,
        "bootstrap_total_sec": round(sum(boot_secs), 3),
        "bootstrap_last_day_sec": boot_secs[-1],
        "day2_sec": day2_sec,
        "day2_stage_sec": a2["stage_sec"],
        "day2_clean_survivors": a2["clean_survivors"],
        "day2_near_dup_edges": a2["near_dup_edges"],
        "day2_containment_dropped": a2.get("containment_dropped", 0),
        "day2_kept_docs": a2["kept_docs"],
    }
    key = "day2_pipeline_containment" if containment else "day2_pipeline"
    _merge_bench_xl("/root/repo", {key: row})
    print(json.dumps(row))
    shutil.rmtree(state, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
