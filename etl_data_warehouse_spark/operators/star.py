"""Star-schema builders over the raw tables.

Role mapping (FIXTURES.md §6): ``orders``+``lineitem`` play the raw
fact sources, ``customer`` the customer dimension source, ``part`` the
product dimension source; ``dim_date`` is generated. Marts are full
rebuilds (dbt semantics, reference: dbt_warehouse/models/marts/*) —
deterministic surrogate keys via ROW_NUMBER over the business key
(reference: dbt_warehouse/models/marts/dim_customers.sql:5).

Scale notes (100 TB posture):
- dims stay small (≤ millions of rows) → always broadcast to fact joins;
- ``dim_date`` is ≤ tens of thousands of rows for any horizon → broadcast;
- fact assembly is a map-side (broadcast) join chain, zero fact shuffles;
- ``fact_daily_sales`` shuffles once on its grain (date_key, part) —
  that shuffle is the rollup itself, irreducible; partial aggregation
  (map-side combine) happens automatically in Spark's HashAggregate.
- surrogate-key ROW_NUMBER over an unpartitioned window is a deliberate
  single-partition sort, acceptable only at dimension scale
  (SURVEY.md §4.2); facts never do this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.datetime_utils import (
    date_key,
    day_name,
    is_weekend,
    month_name,
    weekday0,
)
from ..functions.numeric import davg, dec, dsum
from ..sources.catalog import load_table


def build_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumerate every date spanned by orders with calendar attributes.

    Spark twin of the reference's date-dimension generator
    (reference: loaders/warehouse_loader.py:157-212): one
    ``explode(sequence(min, max))`` instead of a Python day loop.
    """
    orders = load_table(spark, "orders", sf_dir, columns=["o_orderdate"])
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    dates = bounds.select(F.explode(F.sequence("d0", "d1")).alias("full_date"))
    return dates.select(
        "full_date",
        date_key("full_date").alias("date_key"),
        F.year("full_date").cast("int").alias("year"),
        F.month("full_date").cast("int").alias("month"),
        F.dayofmonth("full_date").cast("int").alias("day"),
        F.quarter("full_date").cast("int").alias("quarter"),
        month_name("full_date").alias("month_name"),
        day_name("full_date").alias("day_name"),
        weekday0("full_date").alias("weekday0"),
        is_weekend("full_date").alias("is_weekend"),
    )


def build_dim_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dimension with a deterministic surrogate key.

    ``c_mktsegment`` plays the reference's ``customer_tier``,
    ``c_acctbal`` its ``lifetime_value``
    (reference: warehouse/target_schema.sql:13-28).
    """
    cust = load_table(spark, "customer", sf_dir)
    w = Window.orderBy("c_custkey")
    return cust.select(
        F.row_number().over(w).cast("long").alias("customer_key"),
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_nationkey").alias("nation_key"),
        F.col("c_mktsegment").alias("customer_tier"),
        F.col("c_acctbal").cast("double").alias("lifetime_value"),
    )


def build_dim_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product dimension derived by aggregating the line-level fact.

    Twin of the reference's reviews→dim_products rollup
    (reference: airflow/dags/etl_daily_pipeline.py:170-177;
    dbt stg_products.sql:4-13): groupBy product → rounded AVG + COUNT,
    joined back to the product attributes, surrogate key by ROW_NUMBER.
    """
    part = load_table(spark, "part", sf_dir)
    li = load_table(
        spark, "lineitem", sf_dir, columns=["l_partkey", "l_extendedprice"]
    )
    stats = li.groupBy("l_partkey").agg(
        # Unrounded exact-sum/count: bit-exact across engines (see numeric.py).
        davg("l_extendedprice").alias("avg_price"),
        F.count("*").alias("total_lineitems"),
    )
    w = Window.orderBy("p_partkey")
    return (
        part.join(stats, part.p_partkey == stats.l_partkey, "left")
        .select(
            F.row_number().over(w).cast("long").alias("product_key"),
            F.col("p_partkey").alias("product_id"),
            F.col("p_name").alias("product_name"),
            F.col("p_brand").alias("product_category"),
            F.col("p_type").alias("product_type"),
            F.col("p_size").alias("product_size"),
            F.col("p_retailprice").cast("double").alias("retail_price"),
            F.col("avg_price"),
            F.coalesce("total_lineitems", F.lit(0)).alias("total_lineitems"),
        )
    )


def build_fact_orders(
    spark: SparkSession, sf_dir: str, dim_customers: DataFrame | None = None
) -> DataFrame:
    """Order-grain fact with FK surrogate keys resolved via broadcast joins.

    Twin of the reference's fact assembly
    (reference: etl_daily_pipeline.py:188-236; dbt fact_orders.sql:14-20):
    left joins to dims on business keys + date_key derivation. Dims are
    explicitly broadcast — at 100 TB the fact side never shuffles here.

    ``dim_customers`` overrides the default full-rebuild dim: the
    incremental pipeline passes its stable-keyed dim so the fact's
    customer_key matches the keys actually stored in the warehouse
    (sinks.merge_upsert_stable).
    """
    orders = load_table(spark, "orders", sf_dir)
    if dim_customers is None:
        dim_customers = build_dim_customers(spark, sf_dir)
    dim_c = dim_customers.select("customer_key", "customer_id")
    return (
        orders.join(
            F.broadcast(dim_c),
            orders.o_custkey == dim_c.customer_id,
            "left",
        )
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("customer_key"),
            F.col("o_custkey").alias("customer_id"),
            date_key("o_orderdate").alias("date_key"),
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").cast("double").alias("total_amount"),
            F.col("o_orderpriority").alias("order_priority"),
        )
    )


def build_fact_lineitem(
    spark: SparkSession,
    sf_dir: str,
    dim_customers: DataFrame | None = None,
    dim_products: DataFrame | None = None,
) -> DataFrame:
    """Line-grain fact with the reference's FULL 3-dim FK chain.

    The reference's fact_orders left-joins customers, products AND date
    (reference: dbt_warehouse/models/marts/fact_orders.sql:14-20); TPC-H
    orders carry no product, so the complete shape lives at lineitem
    grain: customer_key via orders, product_key via part, date_key from
    the ship date.

    Scale: lineitem ⋈ orders is the one irreducible fact-fact join —
    shuffle on orderkey (or zero-Exchange SMJ when both sides are
    bucketed on it, sources/bucketing.py); both dim joins broadcast, so
    the fact shuffles exactly once.
    """
    li = load_table(spark, "lineitem", sf_dir)
    ords = load_table(spark, "orders", sf_dir, columns=["o_orderkey", "o_custkey"])
    if dim_customers is None:
        dim_customers = build_dim_customers(spark, sf_dir)
    if dim_products is None:
        dim_products = build_dim_products(spark, sf_dir)
    dim_c = dim_customers.select("customer_key", "customer_id")
    dim_p = dim_products.select("product_key", "product_id")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(dim_c), ords.o_custkey == dim_c.customer_id, "left")
        .join(F.broadcast(dim_p), li.l_partkey == dim_p.product_id, "left")
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").cast("int").alias("line_number"),
            F.col("customer_key"),
            F.col("o_custkey").alias("customer_id"),
            F.col("product_key"),
            F.col("l_partkey").alias("product_id"),
            date_key("l_shipdate").alias("date_key"),
            F.to_date("l_shipdate").alias("ship_date"),
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_extendedprice").cast("double").alias("amount"),
            F.col("l_returnflag").alias("return_flag"),
        )
    )


def build_fact_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodic-snapshot rollup at (date_key, product) grain.

    Twin of the reference's daily-sales rollup with conditional
    aggregates (reference: etl_daily_pipeline.py:220-233; dbt
    fact_daily_sales.sql:4-21). The two pandas lambda UDAFs of the
    reference become built-in ``sum(when(...))`` — zero Python UDFs.
    'R' (returned) plays REFUNDED, 'A' plays CANCELLED.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy(
            date_key("l_shipdate").alias("date_key"),
            F.col("l_partkey").alias("product_id"),
        )
        .agg(
            dsum("l_extendedprice").alias("total_sales_amount"),
            F.count("*").alias("total_line_count"),
            F.countDistinct("l_orderkey").alias("total_orders_count"),
            davg("l_extendedprice").alias("avg_sale_value"),
            F.sum(
                F.when(F.col("l_returnflag") == "A", 1).otherwise(0)
            ).alias("cancelled_count"),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R", dec("l_extendedprice")
                ).otherwise(dec(F.lit(0)))
            )
            .cast("double")
            .alias("refunded_amount"),
        )
    )
