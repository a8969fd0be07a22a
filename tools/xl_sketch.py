"""XL evidence for the portable-sketch family: 1M-event sketch panel
(build / append / rollups from state) and a 1M-key Bloom filter —
fresh-session single runs, merged into BENCH_XL.json["sketch_panel"]
so later non-XL bench runs can't erase the numbers.

Usage:  python tools/xl_sketch.py [--n-events=1000000]
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

from etl_data_warehouse_spark.operators import sketch_store  # noqa: E402
from etl_data_warehouse_spark.operators import sketches  # noqa: E402
from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.sources.generators import (  # noqa: E402
    generate_events,
)

_BLOOM_M_XL = 1 << 23  # 8.4M bits for ~500K member keys -> fp ~2.8%


def main() -> int:
    n_events = 1_000_000
    for a in sys.argv[1:]:
        if a.startswith("--n-events="):
            n_events = int(a.split("=", 1)[1])

    spark = get_spark("xl-sketch")
    spark.sparkContext.setLogLevel("ERROR")
    para = spark.sparkContext.defaultParallelism
    base = os.path.join(tempfile.gettempdir(), "spark_graft_xl_sketch")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    generate_events(spark, n_events).repartition(para).write.parquet(
        f"{base}/events.parquet"
    )
    events = spark.read.parquet(f"{base}/events.parquet")
    out: dict = {"n_events": n_events, "method": "fresh_isolated_session_single_run"}

    # --- panel: build full feed, then a 10% incremental batch --------
    store = f"{base}/panel"
    cut = int(n_events * 0.9)
    t0 = time.time()
    sketch_store.build_sketch_store(
        events.filter(F.col("event_id") < cut), store
    )
    out["panel_build_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    sketch_store.append_sketch_batch(
        events.filter(F.col("event_id") >= cut), store, batch_id=1
    )
    out["panel_append_10pct_sec"] = round(time.time() - t0, 3)

    # --- rollups answered from state (no fact rescan) -----------------
    t0 = time.time()
    month = F.date_trunc("month", F.col("day"))
    sketch_store.panel_distinct(spark, store, month, "month").collect()
    out["panel_distinct_by_month_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    sketch_store.panel_quantiles(
        spark, store, month, "month", [50, 90, 99]
    ).collect()
    out["panel_quantiles_by_month_sec"] = round(time.time() - t0, 3)
    probes = (
        events.select("user_id").distinct().limit(1000).select("user_id")
    )
    t0 = time.time()
    sketch_store.panel_frequency(spark, store, probes, "user_id").write.format(
        "noop"
    ).mode("overwrite").save()
    out["panel_frequency_1k_probes_sec"] = round(time.time() - t0, 3)

    # --- 1M-key Bloom: build over 500K members, probe 1M keys ---------
    keys = events.select("event_id")
    members = keys.filter(F.col("event_id") % 2 == 0)
    t0 = time.time()
    bitmap = sketches.bloom_build(members, "event_id", m_bits=_BLOOM_M_XL)
    verdict = sketches.bloom_probe(
        keys, "event_id", bitmap, m_bits=_BLOOM_M_XL
    )
    fp = (
        verdict.join(
            members.withColumnRenamed("event_id", "m_id"),
            verdict["event_id"] == F.col("m_id"),
            "left_anti",
        )
        .filter("bloom_pass")
        .count()
    )
    out["bloom_build_probe_1m_sec"] = round(time.time() - t0, 3)
    out["bloom_fp_rate_nonmembers"] = round(fp / (n_events / 2), 5)
    out["bloom_fp_count"] = fp

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))

    path = "/root/repo/BENCH_XL.json"
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["sketch_panel"] = out
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
