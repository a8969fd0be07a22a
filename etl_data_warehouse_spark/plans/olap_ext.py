"""OLAP surface extension (q53): exact discrete quantiles.

q53: discrete (rank-selection) quantiles of order value per month —
exact and engine-portable BY CONSTRUCTION: the quantile is the VALUE at
row ceil(q*n) in value-sorted order, a selection, never an
interpolation (interpolated quantiles multiply doubles in
engine-specific association order; selection is bit-stable).

(ROLLUP/CUBE already live in plans/warehouse.py q17/q18.)

Scale: one window per month partition — the month grain bounds every
sort; no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_QS = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p90", 0.9)]


def q53_order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    base = orders.select(month, "o_totalprice", "o_orderkey")
    w = Window.partitionBy("order_month").orderBy("o_totalprice", "o_orderkey")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("order_month"))
    )
    aggs = [F.count("*").alias("n_orders")] + [
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")),
                F.col("o_totalprice"),
            )
        ).alias(name)
        for name, q in _QS
    ]
    # count("*") over ranked double-counts nothing: ranked is row-per-order
    return (
        ranked.groupBy("order_month")
        .agg(*aggs)
        .withColumn("n_orders", F.col("n_orders").cast("long"))
        .orderBy("order_month")
    )


Q53_ORACLE = f"""
WITH ranked AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           o_totalprice,
           row_number() OVER (
               PARTITION BY strftime(o_orderdate, '%Y-%m')
               ORDER BY o_totalprice, o_orderkey) AS rn,
           COUNT(*) OVER (
               PARTITION BY strftime(o_orderdate, '%Y-%m')) AS n
    FROM orders
)
SELECT order_month,
       COUNT(*)::BIGINT AS n_orders,
       {", ".join(
           f"MAX(CASE WHEN rn = ceil({q} * n) THEN o_totalprice END) AS {name}"
           for name, q in _QS
       )}
FROM ranked
GROUP BY order_month
ORDER BY order_month
"""


QUERIES = {"q53_order_value_quantiles": q53_order_value_quantiles}
ORACLES = {"q53_order_value_quantiles": Q53_ORACLE}
