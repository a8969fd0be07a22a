"""Capture .explain('formatted') for every bench query into plans/r13/.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/r13/<query>_<suffix>.txt. Default: all BENCH_QUERIES
(including BENCH_OVERRIDES, which are what the bench times).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from bench import BENCH_OVERRIDES, BENCH_QUERIES  # noqa: E402
from etl_data_warehouse_spark.plans.registry import QUERIES  # noqa: E402
from etl_data_warehouse_spark.session import get_spark  # noqa: E402

OUT = "/root/repo/plans/r13"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        fn = BENCH_OVERRIDES.get(name) or QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name} (not found)")
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001
            txt = f"ERROR: {ex}"
        with open(f"{OUT}/{name}_{suffix}.txt", "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
