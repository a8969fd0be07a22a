"""Fresh-session MIN timing probe for drift questions.

CLAUDE.md rule: when chasing perf regressions compare MIN times in a
fresh session — p50 in a long warm session reflects heap litter, not
the plan. This tool runs the named registry queries (and, with
``--scale=op1,op2``, the named bench scale-section operators on a
freshly generated corpus) in a brand-new SparkSession (nothing else
has touched the heap), takes MIN of ``--runs`` executions each, and
MERGES the rows into DRIFT_CHECK.json (per-query upsert — a later
probe of different queries never erases earlier evidence), which
bench.py merges into BENCH_DETAIL.json on its next run.

bench.py also invokes this tool automatically at the end of every run
for the top-5 most expensive headline queries, so each round's bench
artifact carries standing min-of-fresh rows next to the warm-session
p50s (VERDICT r7 #1).

Usage:  python tools/fresh_min.py q08_fact_daily_sales q25_simhash_pairs
        python tools/fresh_min.py --scale=minhash_lsh_pairs,ivf_topk_arrow
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_data_warehouse_spark.session import get_spark  # noqa: E402

DRIFT_PATH = "/root/repo/DRIFT_CHECK.json"


def _now() -> str:
    return datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )


def _min_of(make_df, runs: int) -> dict:
    times = []
    for _ in range(runs):
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return {
        "min": round(min(times), 3),
        "all": [round(t, 3) for t in times],
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    scale_ops: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--scale="):
            scale_ops = [s for s in a.split("=", 1)[1].split(",") if s]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import BENCH_OVERRIDES, _build_scale_ops  # noqa: E402
    from etl_data_warehouse_spark.plans.registry import QUERIES  # noqa: E402

    spark = get_spark("fresh-min")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    method = f"fresh_session_min_of_{runs}"
    rows: dict[str, dict] = {}
    for name in args:
        fn = BENCH_OVERRIDES.get(name) or QUERIES[name]
        rows[name] = dict(
            _min_of(lambda: fn(spark, sf_dir), runs),
            method=method,
            sf_dir=sf_dir,
            measured_at=_now(),
        )
        print(name, rows[name]["min"], rows[name]["all"])
    if scale_ops:
        import shutil
        import tempfile

        n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "100000"))
        base = os.path.join(
            tempfile.gettempdir(), "spark_graft_fresh_min_scale"
        )
        ops, _v, _q, _n = _build_scale_ops(spark, base, n_docs)
        for name in scale_ops:
            if name not in ops:
                print(f"ERROR unknown scale op {name!r}; "
                      f"known: {sorted(ops)}")
                return 2
            rows[f"scale:{name}"] = dict(
                _min_of(ops[name], runs),
                method=method,
                n_docs=n_docs,
                measured_at=_now(),
            )
            print(f"scale:{name}", rows[f"scale:{name}"]["min"],
                  rows[f"scale:{name}"]["all"])
        shutil.rmtree(base, ignore_errors=True)

    merged = {"queries": {}}
    if os.path.exists(DRIFT_PATH):
        try:
            with open(DRIFT_PATH) as fh:
                old = json.load(fh)
            # pre-r8 layout had top-level method/sf_dir; keep only rows
            merged["queries"] = dict(old.get("queries", {}))
        except (json.JSONDecodeError, OSError):
            pass
    merged["queries"].update(rows)
    with open(DRIFT_PATH, "w") as fh:
        json.dump(merged, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
