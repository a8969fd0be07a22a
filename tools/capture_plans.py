"""Capture .explain('formatted') for bench queries into plans/<round>/.

Usage: python tools/capture_plans.py --round rNN <suffix> [query ...]
Writes plans/<round>/<query>_<suffix>.txt. Default queries: all
BENCH_QUERIES (including BENCH_OVERRIDES, which are what the bench
times).
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BENCH_OVERRIDES, BENCH_QUERIES  # noqa: E402
from etl_data_warehouse_spark.plans.registry import QUERIES  # noqa: E402
from etl_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("suffix", help="file suffix, e.g. before / after")
    ap.add_argument("queries", nargs="*", help="default: all BENCH_QUERIES")
    ap.add_argument(
        "--round",
        required=True,
        help="plans/ subdirectory to write into, e.g. r14",
    )
    args = ap.parse_args()
    out = os.path.join(REPO, "plans", args.round)
    names = args.queries or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
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
        with open(f"{out}/{name}_{args.suffix}.txt", "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{args.suffix}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
