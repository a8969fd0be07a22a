"""The five reference analytics queries, Spark-first.

Each query has a DataFrame implementation (the engine path) and a
DuckDB-ANSI oracle SQL twin over the same raw Parquet views. Shapes
follow reference: warehouse/analytics_queries.sql:15-246, re-based on
the driver's TPC-H-ish tables (status mapping: 'F'≡COMPLETED,
'O'≡PENDING, 'P'≡PROCESSING).

Determinism rules (SURVEY.md §7.3/§7.4): money aggregates use exact
DECIMAL sums (order-insensitive) cast to DOUBLE at the boundary;
windowed AVG is frame-SUM/frame-COUNT; every ranking window carries a
unique tiebreaker so NTILE/ROW_NUMBER are well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, dsum
from ..operators.star import build_dim_date
from ..sources.catalog import load_table

# ---------------------------------------------------------------------------
# Q1 — Monthly revenue trend with running total
# (reference: warehouse/analytics_queries.sql:15-45)
# Scale: fact→dim_date broadcast join (dim ≤ ~10k rows even for a century);
# one shuffle on (year, month); the window over months is tiny (≤ #months).
# ---------------------------------------------------------------------------


def q01_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    dim_date = build_dim_date(spark, sf_dir)
    monthly = (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(
            F.broadcast(dim_date),
            F.to_date("o_orderdate") == F.col("full_date"),
        )
        .groupBy("year", "month", "month_name")
        .agg(
            F.sum(dec("o_totalprice")).alias("revenue_dec"),
            F.count("*").alias("order_count"),
        )
    )
    w = Window.orderBy("year", "month")
    run = Window.orderBy("year", "month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    revenue = F.col("revenue_dec").cast("double")
    prev = F.lag(revenue).over(w)
    return (
        monthly.select(
            "year",
            "month",
            "month_name",
            revenue.alias("revenue"),
            "order_count",
            # Unrounded: both engines divide identical doubles → bit-exact.
            # (round(double) disagrees across engines at half-way points.)
            (revenue / F.col("order_count").cast("double")).alias(
                "avg_order_value"
            ),
            prev.alias("prev_month_revenue"),
            ((revenue - prev) / F.nullif(prev, F.lit(0.0)) * 100.0).alias(
                "mom_change_pct"
            ),
            F.sum("revenue_dec").over(run).cast("double").alias("running_total"),
        )
        .orderBy("year", "month")
    )


Q01_ORACLE = """
WITH dim_date AS (
    SELECT unnest(generate_series(
               (SELECT min(o_orderdate)::DATE FROM orders),
               (SELECT max(o_orderdate)::DATE FROM orders),
               INTERVAL 1 DAY))::DATE AS full_date
),
monthly AS (
    SELECT year(full_date)::INT                       AS year,
           month(full_date)::INT                      AS month,
           monthname(full_date)                       AS month_name,
           SUM(CAST(o_totalprice AS DECIMAL(18,2)))   AS revenue_dec,
           COUNT(*)                                   AS order_count
    FROM orders
    JOIN dim_date ON o_orderdate::DATE = full_date
    WHERE o_orderstatus = 'F'
    GROUP BY 1, 2, 3
)
SELECT
    year,
    month,
    month_name,
    CAST(revenue_dec AS DOUBLE)                                   AS revenue,
    order_count,
    CAST(revenue_dec AS DOUBLE) / order_count                     AS avg_order_value,
    CAST(LAG(revenue_dec) OVER (ORDER BY year, month) AS DOUBLE)  AS prev_month_revenue,
    (CAST(revenue_dec AS DOUBLE)
           - CAST(LAG(revenue_dec) OVER (ORDER BY year, month) AS DOUBLE))
          / NULLIF(CAST(LAG(revenue_dec) OVER (ORDER BY year, month) AS DOUBLE), 0)
          * 100.0                                                 AS mom_change_pct,
    CAST(SUM(revenue_dec) OVER (ORDER BY year, month
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
FROM monthly
ORDER BY year, month
"""
