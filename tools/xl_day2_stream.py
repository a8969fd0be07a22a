"""XL evidence for the STREAMING day-2 twin (r11 verdict task #5):
the batch chain's day-cost claim must hold when the same days arrive
as files in a watched drop directory.

Everything goes through the public stream entry
(streaming/day2_stream.start_day2_stream) — including the bootstrap:
the standing corpus is delivered as n//n_batch day-files and drained
in ONE availableNow pass (max_files=1 → one file per microbatch, so
streaming epochs reproduce the per-day batch_id sequence exactly).
Then the day-under-test file lands and a second drain is timed — the
marginal streamed day at 1M standing + 100K batch, directly comparable
to BENCH_XL's day2_pipeline.day2_sec (same generator slices, same
config, same Arrow mode).

Usage: python tools/xl_day2_stream.py [--n=1000000] [--n-batch=100000]
Merges into BENCH_XL.json under "day2_stream".
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.streaming.day2_stream import (  # noqa: E402
    start_day2_stream,
)
from xl_day2 import _slice  # noqa: E402  (same planted slices as batch XL)

_AUDITS: list[dict] = []


def _write_day_file(df, input_dir: str, name: str, mtime: int) -> None:
    """One day's docs as exactly ONE parquet file with a pinned mod
    time (the file source delivers oldest-first)."""
    tmp = os.path.join(input_dir, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(input_dir, name)
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


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
            # third dedup arm ON through the stream: records under its
            # own BENCH_XL key (day2_stream_containment) so the base
            # stream row stays round-comparable — xl_day2's discipline
            containment = True

    spark = get_spark("xl-day2-stream")
    spark.sparkContext.setLogLevel("ERROR")
    para = spark.sparkContext.defaultParallelism
    base = tempfile.mkdtemp(prefix="xl_day2_stream_")
    input_dir = os.path.join(base, "drop")
    vectors_dir = os.path.join(base, "vectors")
    state = os.path.join(base, "state")
    checkpoint = os.path.join(base, "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    cfg = dict(  # identical to tools/xl_day2.py's batch row
        domain_cap=1_000_000_000,
        n_cells=1024,
        m=4,
        codes=16,
        n_shards=64,
        pack_budget=2048,
    )
    if containment:
        cfg["containment"] = True  # k=8 / max_df=1000 defaults

    # hook the per-batch audits out of the foreachBatch closure so the
    # streamed day's stage_sec is recorded next to the batch twin's
    import etl_data_warehouse_spark.streaming.day2_stream as d2s

    real_ingest = d2s.run_day2_ingest

    def traced(*args, **kw):
        audit = real_ingest(*args, **kw)
        _AUDITS.append(audit)
        return audit

    d2s.run_day2_ingest = traced

    n_days = max(1, n // n_batch)
    for day in range(n_days):
        d, v = _slice(spark, day * n_batch, (day + 1) * n_batch, para, day)
        _write_day_file(d, input_dir, f"day{day + 1:03d}.parquet", 1_000 + day)
        v.write.mode("append").parquet(vectors_dir)
    t0 = time.time()
    q = start_day2_stream(
        spark, input_dir, vectors_dir, state, checkpoint,
        semantic_arrow=True, minhash_arrow=True, **cfg,
    )
    q.awaitTermination()
    bootstrap_sec = round(time.time() - t0, 3)
    print(f"bootstrap drain ({n_days} day-files)", bootstrap_sec, flush=True)
    # the xl_day2 inter-day cleanup discipline (Python gc first — py4j
    # proxies otherwise pin the bootstrap drain's checkpoint blocks
    # through System.gc())
    import gc

    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)

    d2, v2 = _slice(spark, n, n + n_batch, para, n_days)
    _write_day_file(d2, input_dir, "day_test.parquet", 2_000)
    v2.write.mode("append").parquet(vectors_dir)
    t0 = time.time()
    q = start_day2_stream(
        spark, input_dir, vectors_dir, state, checkpoint,
        semantic_arrow=True, minhash_arrow=True, **cfg,
    )
    q.awaitTermination()
    day2_sec = round(time.time() - t0, 3)
    a2 = _AUDITS[-1]
    assert a2["batch_id"] == n_days + 1 and not a2["bootstrap"]
    print("streamed day2_sec", day2_sec, a2, flush=True)

    from bench import _merge_bench_xl

    row = {
        "n_standing": n,
        "n_batch": n_batch,
        "method": "fresh_isolated_session_single_run",
        "minhash_buckets": 32,
        "semantic_arrow": True,
        "minhash_arrow": True,
        "bootstrap_drain_sec": bootstrap_sec,
        "day2_sec": day2_sec,
        "day2_stage_sec": a2["stage_sec"],
        "day2_clean_survivors": a2["clean_survivors"],
        "day2_near_dup_edges": a2["near_dup_edges"],
        "day2_containment_dropped": a2.get("containment_dropped", 0),
        "day2_kept_docs": a2["kept_docs"],
    }
    key = "day2_stream_containment" if containment else "day2_stream"
    _merge_bench_xl("/root/repo", {key: row})
    print(json.dumps(row))
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
