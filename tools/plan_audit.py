"""Executed-plan audit over the whole registry.

Runs every registered query at a small SF, collects it, and records
final-AQE-plan shape counters (FileScan / Generate explode / Exchange /
CartesianProduct / BatchEvalPython) to PLAN_AUDIT.json. The point is
the 100 TB smell test as a MEASURED artifact: a query whose final plan
scans the corpus 4x (q122's first cut) or grew a cartesian product
shows up here as a number, not a code-review hope.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_data_warehouse_spark.session import get_spark  # noqa: E402


def final_plan(df) -> str:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from etl_data_warehouse_spark.plans.registry import QUERIES

    unknown = only - set(QUERIES)
    if unknown:
        print(f"ERROR unknown query names: {sorted(unknown)}")
        return 2

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # Session warmup so the FIRST timed entry doesn't absorb JVM /
    # codegen / parquet-footer initialization (r8's audit carried
    # 7-9s first-in-session sec values next to 0.3s neighbors): a
    # scan + shuffle + window + collect exercise every cold path the
    # audited plans touch. sec stays a single-run wall clock — use
    # tools/fresh_min.py when a number matters on its own.
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    warm = spark.read.parquet(f"{sf_dir}/orders.parquet")
    warm.groupBy("o_orderstatus").count().collect()
    warm.select(
        _F.row_number()
        .over(_W.partitionBy("o_orderstatus").orderBy("o_orderkey"))
        .alias("r")
    ).filter("r <= 2").collect()

    out: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.collect()
            p = final_plan(df)
            out[name] = {
                "scans": p.count("FileScan parquet"),
                "explodes": p.count("Generate explode"),
                "exchanges": p.count("Exchange hashpartitioning")
                + p.count("Exchange RoundRobin")
                + p.count("Exchange SinglePartition"),
                "cartesian": p.count("CartesianProduct"),
                "python_udf": p.count("BatchEvalPython"),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as exc:  # noqa: BLE001 — audit keeps going
            out[name] = {"error": str(exc)[:200]}
        flag = " <-- cartesian" if out[name].get("cartesian") else ""
        print(name, json.dumps(out[name]), flag)
    path = "/root/repo/PLAN_AUDIT.json"
    merged = out
    if only:
        # subset run: refresh those entries, keep the rest
        try:
            with open(path) as fh:
                prior = json.load(fh).get("plans", {})
        except (OSError, json.JSONDecodeError):
            prior = {}
        prior.update(out)
        merged = prior
    with open(path, "w") as fh:
        json.dump(
            {
                "sf_dir": sf_dir,
                "method": "single_run_after_session_warmup",
                "plans": merged,
            },
            fh,
            indent=1,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
