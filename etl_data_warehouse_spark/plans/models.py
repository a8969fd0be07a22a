"""The dbt-model surface: staging views + marts as temp views.

The reference's dbt project materializes staging models as views and
marts as tables, chained by ref() (reference: dbt_warehouse/
dbt_project.yml:9-14, models/staging/*.sql, models/marts/*.sql;
SURVEY.md §3.2). Spark twin: every model is a temp view —
``{{ ref('stg_orders') }}`` ≡ ``stg_orders`` in SQL — and Catalyst sees
through ALL view boundaries and optimizes the whole tree globally
(better than dbt, which materializes at each boundary). Materialize any
mart by writing the view's DataFrame.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.catalog import register_views

STAGING_MODELS: dict[str, str] = {
    # reference: models/staging/stg_orders.sql — rename, normalize, derive
    "stg_orders": """
        SELECT o_orderkey                    AS order_id,
               o_custkey                     AS customer_id,
               upper(trim(o_orderstatus))    AS status,
               CAST(o_totalprice AS DOUBLE)  AS total_amount,
               o_orderdate                   AS order_date,
               month(o_orderdate)            AS order_month,
               year(o_orderdate)             AS order_year,
               o_orderpriority               AS order_priority
        FROM orders
        WHERE o_orderkey IS NOT NULL
    """,
    # reference: models/staging/stg_customers.sql
    "stg_customers": """
        SELECT c_custkey                  AS customer_id,
               lower(trim(c_name))        AS customer_name,
               c_nationkey                AS nation_key,
               upper(trim(c_mktsegment))  AS customer_tier,
               CAST(c_acctbal AS DOUBLE)  AS lifetime_value
        FROM customer
        WHERE c_custkey IS NOT NULL
    """,
    # reference: models/staging/stg_reviews.sql (lineitem plays reviews)
    "stg_lineitem": """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               l_quantity, l_extendedprice, l_discount, l_tax,
               upper(trim(l_returnflag)) AS return_flag,
               l_shipdate
        FROM lineitem
        WHERE l_orderkey IS NOT NULL
    """,
    # reference: models/staging/stg_products.sql — aggregate-derived
    "stg_products": """
        SELECT l_partkey AS product_id,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(l_extendedprice) AS avg_price,
               COUNT(*) AS total_lineitems
        FROM stg_lineitem
        GROUP BY l_partkey
    """,
}

MART_MODELS: dict[str, str] = {
    # reference: models/marts/dim_customers.sql (ROW_NUMBER key at :5)
    "mart_dim_customers": """
        SELECT ROW_NUMBER() OVER (ORDER BY customer_id) AS customer_key, *
        FROM stg_customers
    """,
    # reference: models/marts/dim_products.sql
    "mart_dim_products": """
        SELECT ROW_NUMBER() OVER (ORDER BY p.p_partkey) AS product_key,
               p.p_partkey AS product_id, p.p_name AS product_name,
               p.p_brand AS product_category, s.avg_price, s.total_lineitems
        FROM part p LEFT JOIN stg_products s ON p.p_partkey = s.product_id
    """,
    # reference: models/marts/fact_orders.sql (3 left joins, DATE() key)
    "mart_fact_orders": """
        SELECT o.order_id AS order_key, c.customer_key, o.customer_id,
               CAST(date_format(o.order_date, 'yyyyMMdd') AS INT) AS date_key,
               to_date(o.order_date) AS order_date,
               o.status, o.total_amount, o.order_priority
        FROM stg_orders o
        LEFT JOIN mart_dim_customers c ON o.customer_id = c.customer_id
    """,
    # reference: models/marts/fact_orders.sql:14-20 — the FULL 3-dim FK
    # chain (customers, products, date). Orders carry no product in this
    # corpus, so the complete shape is lineitem-grain.
    "mart_fact_lineitem": """
        SELECT l.l_orderkey AS order_key, l.l_linenumber AS line_number,
               c.customer_key, o.customer_id,
               p.product_key, l.l_partkey AS product_id,
               CAST(date_format(l.l_shipdate, 'yyyyMMdd') AS INT) AS date_key,
               to_date(l.l_shipdate) AS ship_date,
               CAST(l.l_quantity AS DOUBLE) AS quantity,
               CAST(l.l_extendedprice AS DOUBLE) AS amount,
               l.return_flag
        FROM stg_lineitem l
        JOIN stg_orders o ON l.l_orderkey = o.order_id
        LEFT JOIN mart_dim_customers c ON o.customer_id = c.customer_id
        LEFT JOIN mart_dim_products p ON l.l_partkey = p.product_id
    """,
    # reference: models/marts/fact_daily_sales.sql (left joins + filter)
    "mart_fact_daily_sales": """
        SELECT CAST(date_format(l.l_shipdate, 'yyyyMMdd') AS INT) AS date_key,
               p.product_key,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_sales_amount,
               COUNT(*) AS total_line_count,
               SUM(CASE WHEN l.return_flag = 'A' THEN 1 ELSE 0 END)
                   AS cancelled_count
        FROM stg_lineitem l
        LEFT JOIN mart_dim_products p ON l.l_partkey = p.product_id
        WHERE p.product_key IS NOT NULL
        GROUP BY 1, 2
    """,
}


def register_models(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register sources + staging + marts as temp views in ref() order.
    Returns the registered model names (the 'dbt run' manifest)."""
    register_views(spark, sf_dir)
    registered = []
    for name, sql in {**STAGING_MODELS, **MART_MODELS}.items():
        spark.sql(sql).createOrReplaceTempView(name)
        registered.append(name)
    return registered
