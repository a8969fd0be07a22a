"""Exact rank-selection quantiles (plans/olap_ext.py)."""

from __future__ import annotations

from etl_data_warehouse_spark.plans.olap_ext import q53_order_value_quantiles


class TestQuantiles:
    def test_quantiles_are_ordered_and_real_values(self, spark, sf_dir):
        rows = q53_order_value_quantiles(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["p25"] <= r["p50"] <= r["p75"] <= r["p90"]
            assert r["n_orders"] >= 1

    def test_median_matches_python(self, spark, sf_dir):
        import math

        from etl_data_warehouse_spark.sources.catalog import load_table

        orders = load_table(spark, "orders", sf_dir)
        one_month = (
            q53_order_value_quantiles(spark, sf_dir).limit(1).collect()[0]
        )
        month = one_month["order_month"]
        vals = sorted(
            r["o_totalprice"]
            for r in orders.collect()
            if r["o_orderdate"].strftime("%Y-%m") == month
        )
        assert one_month["p50"] == vals[math.ceil(0.5 * len(vals)) - 1]
