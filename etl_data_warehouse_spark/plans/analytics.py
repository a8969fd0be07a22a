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

from ..functions.numeric import dec
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


# ---------------------------------------------------------------------------
# Q2 — Customer tier analysis with percentile ranking
# (reference: warehouse/analytics_queries.sql:54-85)
# Scale: the join shuffles on o_custkey unless customer broadcasts; at 100 TB
# the customer dim (~100s of M rows max) may exceed broadcast size → AQE
# picks SMJ; windows partition by tier (5 partitions) — acceptable because
# the post-aggregation row count is one per customer, far smaller than fact.
# NTILE carries c_custkey as tiebreaker so ties are deterministic.
# ---------------------------------------------------------------------------


def q02_customer_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    spend = (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .agg(
            F.sum(dec("o_totalprice")).alias("spend_dec"),
            F.count("o_orderkey").alias("total_orders"),
        )
    )
    wq = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("spend_dec"), F.col("c_custkey")
    )
    wp = Window.partitionBy("c_mktsegment")
    total_spend = F.col("spend_dec").cast("double")
    tier_avg = F.sum("spend_dec").over(wp).cast("double") / F.count("*").over(
        wp
    ).cast("double")
    return (
        spend.select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("customer_tier"),
            F.col("c_acctbal").cast("double").alias("lifetime_value"),
            total_spend.alias("total_spend"),
            "total_orders",
            F.ntile(4).over(wq).alias("spend_quartile"),
            tier_avg.alias("tier_avg_spend"),
            (total_spend - tier_avg).alias("vs_tier_avg"),
        )
        .orderBy("customer_tier", F.desc("total_spend"), "customer_id")
    )


Q02_ORACLE = """
WITH spend AS (
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec,
           COUNT(o_orderkey)                        AS total_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus IN ('F', 'O')
    GROUP BY 1, 2, 3, 4
)
SELECT
    c_custkey                        AS customer_id,
    c_name                           AS customer_name,
    c_mktsegment                     AS customer_tier,
    c_acctbal::DOUBLE                AS lifetime_value,
    CAST(spend_dec AS DOUBLE)        AS total_spend,
    total_orders,
    NTILE(4) OVER (PARTITION BY c_mktsegment
                   ORDER BY spend_dec DESC, c_custkey)::INT       AS spend_quartile,
    CAST(SUM(spend_dec) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
        / COUNT(*) OVER (PARTITION BY c_mktsegment)               AS tier_avg_spend,
    CAST(spend_dec AS DOUBLE)
      - (CAST(SUM(spend_dec) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY c_mktsegment))             AS vs_tier_avg
FROM spend
ORDER BY customer_tier, total_spend DESC, customer_id
"""


# ---------------------------------------------------------------------------
# Q3 — Product category performance with ranking
# (reference: warehouse/analytics_queries.sql:94-126)
# Scale: lineitem→part join broadcasts part (product dims are small relative
# to facts); one shuffle on (partkey, brand); windows partition by brand.
# ---------------------------------------------------------------------------


def q03_product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir, columns=["p_partkey", "p_brand"])
    perf = (
        li.filter(F.col("l_returnflag") == "N")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.sum(dec("l_extendedprice")).alias("rev_dec"),
            F.count("*").alias("product_orders"),
        )
    )
    wr = Window.partitionBy("p_brand").orderBy(F.desc("rev_dec"), F.col("p_partkey"))
    wp = Window.partitionBy("p_brand")
    rev = F.col("rev_dec").cast("double")
    cat_total = F.sum("rev_dec").over(wp).cast("double")
    return (
        perf.select(
            F.col("p_partkey").alias("product_id"),
            F.col("p_brand").alias("product_category"),
            rev.alias("product_revenue"),
            "product_orders",
            F.rank().over(wr).alias("category_rank"),
            (rev * F.lit(100.0) / cat_total).alias("pct_of_category"),
            cat_total.alias("category_total"),
        )
        .orderBy("product_category", "category_rank", "product_id")
    )


Q03_ORACLE = """
WITH perf AS (
    SELECT p_partkey, p_brand,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec,
           COUNT(*)                                    AS product_orders
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_returnflag = 'N'
    GROUP BY 1, 2
)
SELECT
    p_partkey                   AS product_id,
    p_brand                     AS product_category,
    CAST(rev_dec AS DOUBLE)     AS product_revenue,
    product_orders,
    RANK() OVER (PARTITION BY p_brand
                 ORDER BY rev_dec DESC, p_partkey)::INT  AS category_rank,
    CAST(rev_dec AS DOUBLE) * 100.0
        / CAST(SUM(rev_dec) OVER (PARTITION BY p_brand) AS DOUBLE)
                                                         AS pct_of_category,
    CAST(SUM(rev_dec) OVER (PARTITION BY p_brand) AS DOUBLE) AS category_total
FROM perf
ORDER BY product_category, category_rank, product_id
"""


# ---------------------------------------------------------------------------
# Q4 — Customer retention cohort analysis
# (reference: warehouse/analytics_queries.sql:135-184). The reference's
# correlated scalar subquery (J11, :158-160) is decorrelated here: the
# cohort CTE already carries customer_id, so activity joins on it directly
# (SURVEY.md §4.1) — the idiomatic plan Spark and any sane engine want.
# Scale: two shuffles on o_custkey (first-order agg + activity join; the
# join key reuses the aggregation partitioning) then tiny cohort-month aggs.
# ---------------------------------------------------------------------------


def q04_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_custkey", "o_orderdate"]
    )
    cohort = (
        orders.groupBy("o_custkey")
        .agg(F.min(F.to_date("o_orderdate")).alias("first_order_date"))
        .select(
            "o_custkey", F.trunc("first_order_date", "month").alias("cohort_month")
        )
    )
    activity = orders.select(
        F.col("o_custkey").alias("a_custkey"),
        F.trunc(F.to_date("o_orderdate"), "month").alias("activity_month"),
    )
    monthly = (
        activity.join(cohort, activity.a_custkey == cohort.o_custkey)
        .groupBy("cohort_month", "activity_month")
        .agg(F.countDistinct("a_custkey").alias("active_customers"))
        .withColumn(
            "months_since_signup",
            F.months_between("activity_month", "cohort_month").cast("int"),
        )
    )
    sizes = cohort.groupBy("cohort_month").agg(
        F.countDistinct("o_custkey").alias("cohort_size")
    )
    return (
        monthly.join(sizes, "cohort_month")
        .filter(F.col("months_since_signup").between(0, 6))
        .select(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
            "cohort_size",
            "months_since_signup",
            "active_customers",
            (
                F.col("active_customers") * F.lit(100.0) / F.col("cohort_size")
            ).alias("retention_pct"),
        )
        .orderBy("cohort", "months_since_signup")
    )


Q04_ORACLE = """
WITH cohort AS (
    SELECT o_custkey,
           date_trunc('month', min(o_orderdate)::DATE) AS cohort_month
    FROM orders
    GROUP BY 1
),
monthly AS (
    SELECT c.cohort_month,
           date_trunc('month', o.o_orderdate::DATE)  AS activity_month,
           COUNT(DISTINCT o.o_custkey)               AS active_customers
    FROM orders o
    JOIN cohort c ON o.o_custkey = c.o_custkey
    GROUP BY 1, 2
),
sizes AS (
    SELECT cohort_month, COUNT(DISTINCT o_custkey) AS cohort_size
    FROM cohort
    GROUP BY 1
)
SELECT
    strftime(m.cohort_month, '%Y-%m')                          AS cohort,
    s.cohort_size,
    date_diff('month', m.cohort_month, m.activity_month)::INT  AS months_since_signup,
    m.active_customers,
    m.active_customers * 100.0 / s.cohort_size                 AS retention_pct
FROM monthly m
JOIN sizes s ON m.cohort_month = s.cohort_month
WHERE date_diff('month', m.cohort_month, m.activity_month) BETWEEN 0 AND 6
ORDER BY cohort, months_since_signup
"""


# ---------------------------------------------------------------------------
# Q5 — Daily sales anomaly detection (7-day moving stats excluding current)
# (reference: warehouse/analytics_queries.sql:194-246)
# Determinism: the moving average is an EXACT decimal frame-sum / count
# (bit-identical across engines, left unrounded); the moving stddev uses
# each engine's native windowed sample-stddev ROUNDed to 2dp (reference
# semantics, analytics_queries.sql:220-225) because stddev algorithms
# differ in ulps across engines — rounding absorbs that.
# Scale: one shuffle to the daily grain; the global-ordered window runs on
# ≤ #days rows (tiny). day attrs come from a broadcast dim_date join (J3).
# ---------------------------------------------------------------------------


def q05_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    dim_date = build_dim_date(spark, sf_dir).select(
        "full_date", "day_name", "is_weekend"
    )
    daily = (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(F.to_date("o_orderdate").alias("full_date"))
        .agg(
            F.sum(dec("o_totalprice")).alias("daily_dec"),
            F.count("o_orderkey").alias("daily_orders"),
        )
        .join(F.broadcast(dim_date), "full_date")
        .withColumn("daily_total_d", F.col("daily_dec").cast("double"))
    )
    w = Window.orderBy("full_date").rowsBetween(-7, -1)
    n = F.count("daily_dec").over(w).cast("double")
    s1 = F.sum("daily_dec").over(w).cast("double")
    moving_avg = s1 / n
    moving_std = F.round(F.stddev_samp("daily_total_d").over(w), 2)
    daily_total = F.col("daily_dec").cast("double")
    flagged = daily.select(
        "full_date",
        "day_name",
        "is_weekend",
        daily_total.alias("daily_total"),
        "daily_orders",
        moving_avg.alias("moving_avg_7d"),
        moving_std.alias("moving_stddev_7d"),
        (daily_total - moving_avg).alias("deviation"),
        F.when(
            (moving_std > 0)
            & (F.abs(daily_total - moving_avg) > 2 * moving_std),
            "ANOMALY",
        )
        .otherwise("NORMAL")
        .alias("anomaly_flag"),
    )
    return flagged.filter(F.col("moving_avg_7d").isNotNull()).orderBy("full_date")


Q05_ORACLE = """
WITH daily AS (
    SELECT o_orderdate::DATE                          AS full_date,
           SUM(CAST(o_totalprice AS DECIMAL(18,2)))   AS daily_dec,
           COUNT(o_orderkey)                          AS daily_orders
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
    GROUP BY 1
),
framed AS (
    SELECT *,
        COUNT(daily_dec) OVER w::DOUBLE                        AS n,
        CAST(SUM(daily_dec) OVER w AS DOUBLE)                  AS s1,
        ROUND(STDDEV_SAMP(CAST(daily_dec AS DOUBLE)) OVER w, 2) AS mstd
    FROM daily
    WINDOW w AS (ORDER BY full_date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT
    full_date,
    dayname(full_date)                              AS day_name,
    isodow(full_date) >= 6                          AS is_weekend,
    CAST(daily_dec AS DOUBLE)                       AS daily_total,
    daily_orders,
    s1 / n                                          AS moving_avg_7d,
    mstd                                            AS moving_stddev_7d,
    CAST(daily_dec AS DOUBLE) - s1 / n              AS deviation,
    CASE
        WHEN mstd > 0
             AND ABS(CAST(daily_dec AS DOUBLE) - s1 / n) > 2 * mstd
        THEN 'ANOMALY' ELSE 'NORMAL'
    END                                             AS anomaly_flag
FROM framed
WHERE n > 0
ORDER BY full_date
"""
