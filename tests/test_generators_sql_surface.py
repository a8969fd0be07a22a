"""Generators (S13 twin) + the spark.sql surface (entry point 3a):
the same analytics expressed as SQL text over registered views must
equal the DataFrame plans exactly."""

from __future__ import annotations

import pytest

from etl_data_warehouse_spark.plans.registry import QUERIES
from etl_data_warehouse_spark.sources.catalog import register_views
from etl_data_warehouse_spark.sources.generators import (
    generate_customers,
    generate_orders,
    generate_reviews,
)


class TestGenerators:
    def test_orders_shape_and_determinism(self, spark):
        a = generate_orders(spark, 1000, seed=7)
        assert a.count() == 1000
        assert {r["status"] for r in a.select("status").distinct().collect()} <= {
            "COMPLETED", "PENDING", "CANCELLED", "REFUNDED"
        }
        b = generate_orders(spark, 1000, seed=7)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_orders_distribution(self, spark):
        df = generate_orders(spark, 20000, seed=1)
        frac = (
            df.filter("status = 'COMPLETED'").count() / 20000
        )
        assert 0.75 < frac < 0.85  # weighted .80

    def test_customers_nullable_phone_and_tiers(self, spark):
        df = generate_customers(spark, 5000, seed=3)
        null_rate = df.filter("phone IS NULL").count() / 5000
        assert 0.02 < null_rate < 0.08
        tiers = {r["customer_tier"] for r in df.select("customer_tier").distinct().collect()}
        assert tiers == {"BRONZE", "SILVER", "GOLD", "PLATINUM"}

    def test_reviews_rating_domain(self, spark):
        df = generate_reviews(spark, 5000, seed=5)
        assert df.filter("rating NOT BETWEEN 1 AND 5").count() == 0
        five_frac = df.filter("rating = 5").count() / 5000
        assert 0.40 < five_frac < 0.50  # weighted .45


# Spark-dialect SQL twins (q01 / q03 shapes) — the engine exposes both
# the DataFrame and the SQL surface; results must be identical.
Q01_SPARK_SQL = """
WITH monthly AS (
    SELECT year(o_orderdate)                        AS year,
           month(o_orderdate)                       AS month,
           date_format(o_orderdate, 'MMMM')         AS month_name,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue_dec,
           COUNT(*)                                 AS order_count
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY 1, 2, 3
)
SELECT year, month, month_name,
       CAST(revenue_dec AS DOUBLE)                    AS revenue,
       order_count,
       CAST(revenue_dec AS DOUBLE) / order_count      AS avg_order_value,
       CAST(LAG(revenue_dec) OVER (ORDER BY year, month) AS DOUBLE)
           AS prev_month_revenue,
       (CAST(revenue_dec AS DOUBLE)
          - CAST(LAG(revenue_dec) OVER (ORDER BY year, month) AS DOUBLE))
         / NULLIF(CAST(LAG(revenue_dec) OVER (ORDER BY year, month) AS DOUBLE), 0)
         * 100.0                                      AS mom_change_pct,
       CAST(SUM(revenue_dec) OVER (ORDER BY year, month
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           AS running_total
FROM monthly
ORDER BY year, month
"""


class TestSqlSurface:
    def test_q01_sql_equals_dataframe(self, spark, sf_dir):
        register_views(spark, sf_dir)
        sql_rows = [tuple(r) for r in spark.sql(Q01_SPARK_SQL).collect()]
        df_rows = [
            tuple(r) for r in QUERIES["q01_monthly_revenue"](spark, sf_dir).collect()
        ]
        assert sql_rows == df_rows

    def test_reference_sql_idioms_parse(self, spark, sf_dir):
        register_views(spark, sf_dir)
        # NTILE / RANK / moving frames / NULLIF / date_trunc — the
        # Postgres-isms of the reference all run on the Spark SQL surface
        df = spark.sql(
            """
            SELECT c_mktsegment,
                   NTILE(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS q,
                   RANK()   OVER (ORDER BY c_acctbal DESC)            AS r,
                   AVG(c_acctbal) OVER (PARTITION BY c_mktsegment)    AS seg_avg,
                   NULLIF(c_acctbal, 0)                               AS nz,
                   date_trunc('month', current_date())                AS m
            FROM customer
            """
        )
        assert df.count() > 0


class TestDocumentGenerator:
    def test_determinism_and_shape(self, spark):
        from etl_data_warehouse_spark.sources.generators import (
            generate_documents,
        )

        a = generate_documents(spark, 500, seed=9)
        assert a.columns == ["doc_id", "text", "lang", "source", "n_chars"]
        assert a.count() == 500
        b = generate_documents(spark, 500, seed=9).repartition(7)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_planted_near_dups_recovered_by_minhash(self, spark):
        """Every planted near-dup (1 of 40 words rewritten, J ≈ 0.95)
        must surface as a MinHash-LSH pair with its base document."""
        from etl_data_warehouse_spark.operators import dedup
        from etl_data_warehouse_spark.sources.generators import (
            generate_documents,
        )

        docs = generate_documents(spark, 400, dup_rate=0.10, seed=5)
        pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8).collect()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs}
        dups = docs.filter("source = 'synthetic_dup'").count()
        assert dups == 40
        # every dup id (>= 360) appears in at least one pair
        dup_ids = {
            i for a, b in found for i in (a, b) if i >= 360
        }
        assert len(dup_ids) == 40
