"""TPC-H classic pack (plans/tpch.py) — plan-shape assertions.

Values are covered by the oracle gate (q62-q66 hash-match DuckDB);
these tests pin the PHYSICAL properties the pack exists to demonstrate.
"""

from __future__ import annotations

from etl_data_warehouse_spark.plans import tpch


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


class TestTpchPlans:
    def test_no_cartesian_anywhere(self, spark, sf_dir):
        for name, fn in tpch.QUERIES.items():
            plan = _final_plan(fn(spark, sf_dir))
            assert "CartesianProduct" not in plan, name
            assert "BroadcastNestedLoopJoin" not in plan, name

    def test_q1_predicate_and_pruning_reach_scan(self, spark, sf_dir):
        plan = _final_plan(tpch.q62_tpch_q1_pricing_summary(spark, sf_dir))
        assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
        # projection pruned to the 7 referenced columns
        assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]

    def test_q5_dims_broadcast(self, spark, sf_dir):
        df = tpch.q64_tpch_q5_local_supplier_volume(spark, sf_dir)
        df.collect()
        assert _final_plan(df).count("BroadcastHashJoin") >= 3

    def test_q6_aggregates_map_side(self, spark, sf_dir):
        df = tpch.q65_tpch_q6_forecast_revenue(spark, sf_dir)
        df.collect()
        plan = _final_plan(df)
        assert "partial_sum" in plan or "merge_sum" in plan
