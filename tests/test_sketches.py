"""HLL sketch operators (operators/sketches.py): accuracy vs exact,
and the merge-consistency contract that justifies pre-aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.sketches import (
    daily_distinct_sketches,
    daily_topk_sketches,
    global_topk,
    rollup_distinct,
    rollup_topk,
    total_distinct,
)
from etl_data_warehouse_spark.sources.catalog import load_table


class TestHllSketches:
    def test_monthly_rollup_within_error_bound(self, spark, sf_dir):
        events = load_table(spark, "events", sf_dir)
        daily = daily_distinct_sketches(events).cache()
        monthly = rollup_distinct(
            daily, F.date_trunc("month", F.col("day")), "month"
        )
        exact = (
            events.groupBy(
                F.date_trunc("month", F.to_date("ts")).alias("month")
            )
            .agg(F.countDistinct("user_id").alias("exact"))
        )
        joined = monthly.join(exact, "month").collect()
        assert joined
        for r in joined:
            # lg_k=12 -> rse ~1.6%; allow 5% (3 sigma + slack)
            assert abs(r["approx_distinct"] - r["exact"]) <= max(
                0.05 * r["exact"], 2.0
            ), r
        daily.unpersist()

    def test_merge_of_partials_equals_one_pass_sketch(self, spark, sf_dir):
        """Union of per-day sketches must estimate EXACTLY what a single
        sketch over the raw data estimates — the lossless-merge property
        that makes persisting daily sketches safe."""
        events = load_table(spark, "events", sf_dir)
        merged_est = total_distinct(daily_distinct_sketches(events))
        one_pass = events.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        ).first()["est"]
        assert merged_est == int(one_pass)

    def test_no_expand_in_sketch_plan(self, spark, sf_dir):
        """The sketch path must not pay COUNT(DISTINCT)'s Expand node —
        that is its reason to exist at scale."""
        events = load_table(spark, "events", sf_dir)
        daily = daily_distinct_sketches(events)
        plan = daily._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan
        assert "hll_sketch_agg" in plan


class TestTopKSketches:
    """Frequent-items sketches: exactness on bounded-cardinality
    columns, merge == one-pass, and the no-Expand scale contract."""

    def test_rollup_matches_exact_counts(self, spark, sf_dir):
        events = load_table(spark, "events", sf_dir)
        daily = daily_topk_sketches(events).cache()
        monthly = rollup_topk(
            daily, F.date_trunc("month", F.col("day")), k=5, grain_name="month"
        )
        exact = {
            (r["month"], r["event_type"]): r["n"]
            for r in events.groupBy(
                F.date_trunc("month", F.to_date("ts")).alias("month"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        rows = monthly.collect()
        assert rows
        for r in rows:
            # 5 distinct event types, maxItemsTracked=1024 -> exact
            got = {e["item"]: e["count"] for e in r["top_k"]}
            want = {
                t: n for (m, t), n in exact.items() if m == r["month"]
            }
            assert got == want, (r["month"], got, want)
        daily.unpersist()

    def test_global_topk_exact(self, spark, sf_dir):
        events = load_table(spark, "events", sf_dir)
        top = global_topk(daily_topk_sketches(events), k=5)
        exact = {
            r["event_type"]: r["n"]
            for r in events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert {e["item"]: e["count"] for e in top} == exact

    def test_no_expand_in_topk_plan(self, spark, sf_dir):
        events = load_table(spark, "events", sf_dir)
        daily = daily_topk_sketches(events)
        plan = daily._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan
        assert "approx_top_k_accumulate" in plan


class TestPortableHll:
    """Cross-engine register HLL (hll_register_cols family): merge
    property, accuracy, and bit-exactness of the register math vs a
    pure-Python md5 reference."""

    def test_merge_of_group_registers_equals_direct_union(
        self, spark, sf_dir
    ):
        from etl_data_warehouse_spark.operators.sketches import (
            hll_merge_registers,
            hll_registers,
        )

        events = load_table(spark, "events", sf_dir)
        per_type = hll_registers(events, "user_id", ["event_type"])
        merged = hll_merge_registers(
            per_type.drop("event_type").withColumn(
                "g", F.lit("all")
            ),
            ["g"],
        ).drop("g")
        direct = hll_registers(
            events.withColumn("g", F.lit("all")), "user_id", ["g"]
        ).drop("g")
        m = {r["hll_idx"]: r["m_j"] for r in merged.collect()}
        d = {r["hll_idx"]: r["m_j"] for r in direct.collect()}
        assert m == d

    def test_estimate_within_error_bound(self, spark):
        from etl_data_warehouse_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        n = 5000
        df = spark.range(n).select(
            F.lit("g").alias("g"), F.col("id").alias("v")
        )
        est = hll_estimate(
            hll_registers(df, "v", ["g"]), ["g"]
        ).first()["hll_estimate"]
        # m=256 -> rse ~6.5%; 20% is ~3 sigma
        assert abs(est - n) / n < 0.20, est

    def test_register_math_matches_python_reference(self, spark):
        import hashlib

        from etl_data_warehouse_spark.operators.sketches import (
            hll_register_cols,
        )

        keys = list(range(100))
        df = spark.range(100).select(F.col("id").alias("k"))
        idx, rho = hll_register_cols("k")
        got = {
            r["k"]: (r["hll_idx"], r["hll_rho"])
            for r in df.select("k", idx, rho).collect()
        }
        for k in keys:
            h = int(
                hashlib.md5(f"hll{k}".encode()).hexdigest()[:15], 16
            )
            w = h >> 8
            exp_rho = 53 if w == 0 else 53 - w.bit_length()
            assert got[k] == (h & 255, exp_rho), k
