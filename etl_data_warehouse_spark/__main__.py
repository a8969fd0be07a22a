"""Command-line entry point: the reference's `airflow trigger` surface
as a plain module runner (reference: airflow/dags/etl_daily_pipeline.py
— scheduling is an orchestration concern; cron/dagster/airflow can all
shell out to these).

    python -m etl_data_warehouse_spark pipeline --sf-dir DIR --out DIR
    python -m etl_data_warehouse_spark corpus   --sf-dir DIR --out DIR
    python -m etl_data_warehouse_spark query NAME [--sf-dir DIR] [-n 20]
    python -m etl_data_warehouse_spark list
"""

from __future__ import annotations

import argparse
import json
import sys

_DEFAULT_SF = "/root/testdata/sf0.01"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_data_warehouse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("pipeline", help="run the warehouse ETL DAG")
    sp.add_argument("--sf-dir", default=_DEFAULT_SF)
    sp.add_argument("--out", required=True)

    sc = sub.add_parser("corpus", help="run the training-corpus pipeline")
    sc.add_argument("--sf-dir", default=_DEFAULT_SF)
    sc.add_argument("--out", required=True)
    sc.add_argument(
        "--curate",
        action="store_true",
        help="prepend the URL/domain curation stage (blocklist + cap)",
    )
    sc.add_argument(
        "--domain-cap",
        type=int,
        default=None,
        help="max docs kept per domain (requires --curate; omit for "
        "blocklist-only curation)",
    )

    sq = sub.add_parser("query", help="run one registry query")
    sq.add_argument("name")
    sq.add_argument("--sf-dir", default=_DEFAULT_SF)
    sq.add_argument("-n", "--rows", type=int, default=20)

    sub.add_parser("list", help="list registry queries")

    args = p.parse_args(argv)
    if getattr(args, "domain_cap", None) is not None and not args.curate:
        p.error("--domain-cap requires --curate")

    from .plans.registry import QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            print(name)
        return 0

    from .session import get_spark

    spark = get_spark("etl-data-warehouse-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "pipeline":
        from .plans.pipeline import run_pipeline

        print(json.dumps(run_pipeline(spark, args.sf_dir, args.out),
                         default=str, indent=1))
        return 0
    if args.cmd == "corpus":
        from .plans.corpus_pipeline import run_corpus_pipeline

        print(json.dumps(
            run_corpus_pipeline(
                spark,
                args.sf_dir,
                args.out,
                curate=args.curate,
                domain_cap=args.domain_cap,
            ),
            default=str, indent=1,
        ))
        return 0
    if args.cmd == "query":
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        QUERIES[args.name](spark, args.sf_dir).show(args.rows, truncate=False)
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
