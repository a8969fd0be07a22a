"""TPC-H classic query pack (q62-q66): Q1, Q3, Q5, Q6, Q10 re-expressed
on the driver's TPC-H-ish tables.

Beyond the reference surface (its 5 analytics queries are
warehouse-mart-shaped, plans/analytics.py) — these are the canonical
OLAP shapes every engine is judged on, and they are genuine SCALE paths:
lineitem-grain scans, multi-way fact⋈dim joins, and selective-predicate
aggregation, all of which grow with SF (unlike the fixed-size document
tables).

Money policy (CLAUDE.md): all sums over exact decimals, DOUBLE only at
the output boundary. Multi-factor terms keep every operand small enough
that Spark's product precision (p1+p2+1, s1+s2) never exceeds 38 — no
precision-loss rounding, so Spark's decimal math is bit-identical to
DuckDB's: price DECIMAL(12,2), discount/tax DECIMAL(4,2) →
price*(1-disc)*(1+tax) is DECIMAL(24,6), exact in both engines.

Scale notes per query:
- Q1 (q62): single lineitem scan, shipdate pushed to parquet, one
  map-side-partial agg on a 4-group key. The reference pattern for
  'would still work at 100 TB'.
- Q3 (q63): segment filter prunes customer BEFORE the join (broadcast),
  orders⋈lineitem SMJ on orderkey, top-10 via rank pushdown.
- Q5 (q64): region→nation broadcast chain, the c_nationkey=s_nationkey
  locality predicate applied as a join condition (not post-filter).
- Q6 (q65): pure scan-and-sum; every predicate reaches PushedFilters.
- Q10 (q66): returned-items quarter, customer rollup, top-20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def _price(col: str = "l_extendedprice") -> F.Column:
    return F.col(col).cast("decimal(12,2)")


def _pct(col: str) -> F.Column:  # discount / tax: 0.00-0.10 at 2dp
    return F.col(col).cast("decimal(4,2)")


def _one() -> F.Column:  # Column exprs need a live session -> lazy
    return F.lit(1).cast("decimal(4,2)")

# DuckDB twins of the decimal terms (identical operand types)
_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
_SQL_CHARGE = (
    f"{_SQL_DISC_PRICE} * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"
)


def q62_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark,
        "lineitem",
        sf_dir,
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    disc_price = _price() * (_one() - _pct("l_discount"))
    charge = disc_price * (_one() + _pct("l_tax"))
    n = F.count("*")
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(_price()).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
                / n.cast("double")
            ).alias("avg_qty"),
            (F.sum(_price()).cast("double") / n.cast("double")).alias("avg_price"),
            (
                F.sum(_pct("l_discount")).cast("double") / n.cast("double")
            ).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q62_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE)                      AS sum_disc_price,
       CAST(SUM({_SQL_CHARGE}) AS DOUBLE)                          AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)::DOUBLE
                                                                   AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)::DOUBLE
                                                                   AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)::DOUBLE
                                                                   AS avg_disc,
       COUNT(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q63_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(
        spark, "customer", sf_dir, columns=["c_custkey", "c_mktsegment"]
    ).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = load_table(
        spark,
        "lineitem",
        sf_dir,
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).filter(F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp"))
    revenue = F.sum(_price() * (_one() - _pct("l_discount")))
    building_orders = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    top = (
        li.join(building_orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(revenue.cast("double").alias("revenue"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("revenue"), F.col("o_orderkey"))
            ),
        )
        .filter(F.col("rk") <= 10)
        .drop("rk")
    )
    return top.select(
        "o_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "revenue"
    ).orderBy(F.desc("revenue"), "o_orderkey")


Q63_ORACLE = f"""
SELECT o_orderkey, o_orderdate::DATE AS o_orderdate,
       CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q64_tpch_q5_local_supplier_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "ASIA"
    )
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir, columns=["c_custkey", "c_nationkey"])
    supp = load_table(spark, "supplier", sf_dir, columns=["s_suppkey", "s_nationkey"])
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(
        spark,
        "lineitem",
        sf_dir,
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    # local-supplier condition: customer and supplier share the nation
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(asia_nations), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(_price() * (_one() - _pct("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q64_ORACLE = f"""
SELECT n_name, CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q65_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark,
        "lineitem",
        sf_dir,
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_price() * _pct("l_discount")).cast("double").alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )


Q65_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS line_count
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q66_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(
        spark, "customer", sf_dir, columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    )
    nation = load_table(spark, "nation", sf_dir, columns=["n_nationkey", "n_name"])
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(
        spark,
        "lineitem",
        sf_dir,
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_price() * (_one() - _pct("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("revenue"), F.col("c_custkey"))
            ),
        )
        .filter(F.col("rk") <= 20)
        .drop("rk")
        .orderBy(F.desc("revenue"), "c_custkey")
    )


Q66_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


QUERIES = {
    "q62_tpch_q1_pricing_summary": q62_tpch_q1_pricing_summary,
    "q63_tpch_q3_shipping_priority": q63_tpch_q3_shipping_priority,
    "q64_tpch_q5_local_supplier_volume": q64_tpch_q5_local_supplier_volume,
    "q65_tpch_q6_forecast_revenue": q65_tpch_q6_forecast_revenue,
    "q66_tpch_q10_returned_items": q66_tpch_q10_returned_items,
}
ORACLES = {
    "q62_tpch_q1_pricing_summary": Q62_ORACLE,
    "q63_tpch_q3_shipping_priority": Q63_ORACLE,
    "q64_tpch_q5_local_supplier_volume": Q64_ORACLE,
    "q65_tpch_q6_forecast_revenue": Q65_ORACLE,
    "q66_tpch_q10_returned_items": Q66_ORACLE,
}
