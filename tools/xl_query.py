"""Run REGISTRY queries against a generated XL corpus (default 1M docs).

tools/xl_one.py times individual OPERATORS at 1M; this tool times whole
registered QUERIES by materializing a temporary sf-dir-shaped directory
(documents.parquet + embeddings.parquet from the seeded generators) and
pointing the registry callables at it — the same code path the driver
runs, at 10-2000x the driver's data. Results merge into BENCH_XL.json
under "registry_at_n" so the per-round XL evidence survives non-XL
bench runs.

Usage:
  python tools/xl_query.py [--n=1000000] [--n-emb=100000] q122_dsir_weights ...
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.sources.generators import (  # noqa: E402
    generate_clustered_embeddings,
    generate_documents,
    generate_events,
)


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 1_000_000
    n_emb = 100_000
    n_events = 1_000_000
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--n-emb="):
            n_emb = int(a.split("=", 1)[1])
        if a.startswith("--n-events="):
            n_events = int(a.split("=", 1)[1])

    from etl_data_warehouse_spark.plans.registry import QUERIES

    unknown = set(names) - set(QUERIES)
    if unknown:
        print(f"ERROR unknown query names: {sorted(unknown)}")
        return 2

    spark = get_spark("xl-query")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(tempfile.gettempdir(), "spark_graft_xl_query")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    para = spark.sparkContext.defaultParallelism
    generate_documents(spark, n).repartition(para).write.parquet(
        f"{base}/documents.parquet"
    )
    generate_clustered_embeddings(
        spark, n_emb, dim=16, n_clusters=256
    ).repartition(para).write.parquet(f"{base}/embeddings.parquet")
    generate_events(spark, n_events).repartition(para).write.parquet(
        f"{base}/events.parquet"
    )

    results = {}
    for name in names:
        t0 = time.time()
        QUERIES[name](spark, base).write.format("noop").mode(
            "overwrite"
        ).save()
        results[name] = round(time.time() - t0, 3)
        print(name, results[name])
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    shutil.rmtree(base, ignore_errors=True)

    path = "/root/repo/BENCH_XL.json"
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, json.JSONDecodeError):
        doc = {}
    section = doc.setdefault("registry_at_n", {})
    section.update(
        {
            "n_docs": n,
            "n_embeddings": n_emb,
            "n_events": n_events,
            "method": "fresh_session_single_run",
            "queries": {**section.get("queries", {}), **results},
        }
    )
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({"registry_at_n": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
