"""Fresh-session MIN timing probe for drift questions.

CLAUDE.md rule: when chasing perf regressions compare MIN times in a
fresh session — p50 in a long warm session reflects heap litter, not
the plan. This tool runs the named registry queries in a brand-new
SparkSession (nothing else has touched the heap), takes MIN of
``--runs`` executions each, and writes DRIFT_CHECK.json, which
bench.py merges into BENCH_DETAIL.json on its next run.

Usage:  python tools/fresh_min.py q08_fact_daily_sales q25_simhash_pairs
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import BENCH_OVERRIDES  # noqa: E402
    from etl_data_warehouse_spark.plans.registry import QUERIES  # noqa: E402

    spark = get_spark("fresh-min")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    out = {
        "method": f"fresh_session_min_of_{runs}",
        "sf_dir": sf_dir,
        "measured_at": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
        "queries": {},
    }
    for name in args:
        fn = BENCH_OVERRIDES.get(name) or QUERIES[name]
        times = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        out["queries"][name] = {
            "min": round(min(times), 3),
            "all": [round(t, 3) for t in times],
        }
        print(name, out["queries"][name])
    with open("/root/repo/DRIFT_CHECK.json", "w") as fh:
        json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
