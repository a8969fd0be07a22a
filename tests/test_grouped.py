"""Grouped-map Arrow operator vs Catalyst twin (operators/grouped.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.grouped import (
    groupwise_zscore,
    groupwise_zscore_native,
)
from etl_data_warehouse_spark.sources.catalog import load_table


class TestGroupwiseZscore:
    def _frames(self, spark, sf_dir):
        orders = load_table(
            spark, "orders", sf_dir,
            columns=["o_orderkey", "o_orderdate", "o_totalprice"],
        ).withColumn(
            "order_month", F.date_format("o_orderdate", "yyyy-MM")
        ).drop("o_orderdate")
        arrow = groupwise_zscore(orders, ["order_month"], "o_totalprice")
        native = groupwise_zscore_native(orders, ["order_month"], "o_totalprice")
        return arrow, native

    def test_arrow_equals_native(self, spark, sf_dir):
        arrow, native = self._frames(spark, sf_dir)
        a = {r["o_orderkey"]: r["zscore"] for r in arrow.collect()}
        b = {r["o_orderkey"]: r["zscore"] for r in native.collect()}
        assert a.keys() == b.keys()
        # same statistic, different accumulation order -> fp-tolerant
        assert all(abs(a[k] - b[k]) < 1e-9 for k in a)

    def test_zscore_invariants(self, spark, sf_dir):
        arrow, _ = self._frames(spark, sf_dir)
        stats = (
            arrow.groupBy("order_month")
            .agg(
                F.avg("zscore").alias("m"),
                F.stddev_pop("zscore").alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        for r in stats:
            assert abs(r["m"]) < 1e-9
            if r["n"] > 1:
                assert abs(r["s"] - 1.0) < 1e-9

    def test_constant_group_is_zero_not_nan(self, spark):
        df = spark.createDataFrame(
            [("g", 5.0), ("g", 5.0), ("h", 1.0)], "k string, v double"
        )
        for fn in (groupwise_zscore, groupwise_zscore_native):
            got = {(r["k"], r["v"], r["zscore"]) for r in fn(df, ["k"], "v").collect()}
            assert ("g", 5.0, 0.0) in got
            assert ("h", 1.0, 0.0) in got
