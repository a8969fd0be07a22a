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

from pyspark.sql import functions as F  # noqa: E402

from etl_data_warehouse_spark.session import get_spark  # noqa: E402
from etl_data_warehouse_spark.sources.generators import (  # noqa: E402
    generate_clustered_embeddings,
    generate_documents,
    generate_events,
)

_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
_SEGMENTS = [
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
]


def _pick(options, key):
    n = len(options)
    idx = F.pmod(F.xxhash64(F.lit(key), F.col("id")), F.lit(n))
    return F.element_at(
        F.array(*[F.lit(o) for o in options]), (idx + 1).cast("int")
    )


def _money(key, lo, hi):
    span = int((hi - lo) * 100)
    cents = F.pmod(F.xxhash64(F.lit(key), F.col("id")), F.lit(span))
    return (cents.cast("double") / 100.0 + lo)


def write_tpch_xl(spark, base: str, scale: int) -> None:
    """TPC-H-lite tables at ``scale``x the sf0.1 row counts, with the
    driver testdata's schemas/types/domains (DOUBLE money, TIMESTAMP
    dates 1995-2001, same status/priority/segment vocabularies, FK
    ranges intact) — all xxhash64-derived, so reproducible on any
    partitioning. Lets tools/xl_query.py time the warehouse-side
    registry queries (sketch estimators, stratified sampling, LPA,
    column stats) at 10-100x the driver's scale."""
    para = spark.sparkContext.defaultParallelism
    n_orders = 150_000 * scale
    n_cust = 15_000 * scale
    n_supp = 1_000 * scale
    n_part = 20_000 * scale
    n_li = 600_000 * scale

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.format_string("NATION_%02d", F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    nation.write.mode("overwrite").parquet(f"{base}/nation.parquet")
    spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.format_string("REGION_%d", F.col("id")).alias("r_name"),
    ).write.mode("overwrite").parquet(f"{base}/region.parquet")

    spark.range(1, n_cust + 1).repartition(para).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        F.pmod(F.xxhash64(F.lit("cn"), F.col("id")), F.lit(25))
        .cast("int")
        .alias("c_nationkey"),
        _money("cab", -999.99, 9999.99).alias("c_acctbal"),
        _pick(_SEGMENTS, "seg").alias("c_mktsegment"),
    ).write.mode("overwrite").parquet(f"{base}/customer.parquet")

    spark.range(1, n_supp + 1).repartition(para).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        F.pmod(F.xxhash64(F.lit("sn"), F.col("id")), F.lit(25))
        .cast("int")
        .alias("s_nationkey"),
        _money("sab", -999.99, 9999.99).alias("s_acctbal"),
    ).write.mode("overwrite").parquet(f"{base}/supplier.parquet")

    spark.range(1, n_part + 1).repartition(para).select(
        F.col("id").alias("p_partkey"),
        F.format_string("Part#%09d", F.col("id")).alias("p_name"),
        _pick(["BRASS", "COPPER", "NICKEL", "STEEL", "TIN"], "ptype")
        .alias("p_type"),
        _money("prp", 900.0, 2000.0).alias("p_retailprice"),
    ).write.mode("overwrite").parquet(f"{base}/part.parquet")

    day = F.pmod(F.xxhash64(F.lit("od"), F.col("id")), F.lit(2400))
    spark.range(1, n_orders + 1).repartition(para).select(
        F.col("id").alias("o_orderkey"),
        (
            F.pmod(F.xxhash64(F.lit("oc"), F.col("id")), F.lit(n_cust)) + 1
        ).alias("o_custkey"),
        _pick(["F", "O", "P"], "ost").alias("o_orderstatus"),
        _money("otp", 1000.0, 500000.0).alias("o_totalprice"),
        F.date_add(F.lit("1995-01-01").cast("date"), day.cast("int"))
        .cast("timestamp")
        .alias("o_orderdate"),
        _pick(_PRIORITIES, "opr").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(f"{base}/orders.parquet")

    sday = F.pmod(F.xxhash64(F.lit("sd"), F.col("id")), F.lit(2400))
    spark.range(n_li).repartition(para).select(
        (
            F.pmod(F.xxhash64(F.lit("lo"), F.col("id")), F.lit(n_orders)) + 1
        ).alias("l_orderkey"),
        (
            F.pmod(F.xxhash64(F.lit("lp"), F.col("id")), F.lit(n_part)) + 1
        ).alias("l_partkey"),
        (
            F.pmod(F.xxhash64(F.lit("ls"), F.col("id")), F.lit(n_supp)) + 1
        ).alias("l_suppkey"),
        (F.pmod(F.col("id"), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
        (
            F.pmod(F.xxhash64(F.lit("lq"), F.col("id")), F.lit(50)) + 1
        ).cast("double").alias("l_quantity"),
        _money("lep", 900.0, 100000.0).alias("l_extendedprice"),
        (
            F.pmod(F.xxhash64(F.lit("ld"), F.col("id")), F.lit(11))
            .cast("double") / 100.0
        ).alias("l_discount"),
        (
            F.pmod(F.xxhash64(F.lit("lt"), F.col("id")), F.lit(9))
            .cast("double") / 100.0
        ).alias("l_tax"),
        _pick(["A", "N", "R"], "lrf").alias("l_returnflag"),
        _pick(["F", "O"], "lls").alias("l_linestatus"),
        F.date_add(F.lit("1995-01-01").cast("date"), sday.cast("int"))
        .cast("timestamp")
        .alias("l_shipdate"),
    ).write.mode("overwrite").parquet(f"{base}/lineitem.parquet")


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 1_000_000
    n_emb = 100_000
    n_events = 1_000_000
    tpch_scale = 10  # 10x sf0.1 -> 1.5M orders / 6M lineitem
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--n-emb="):
            n_emb = int(a.split("=", 1)[1])
        if a.startswith("--n-events="):
            n_events = int(a.split("=", 1)[1])
        if a.startswith("--tpch-scale="):
            tpch_scale = int(a.split("=", 1)[1])

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
    write_tpch_xl(spark, base, tpch_scale)

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
            "tpch_scale_x_sf01": tpch_scale,
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
