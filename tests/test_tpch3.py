"""TPC-H classic pack III (plans/tpch3.py) — plan-shape assertions.

Values are covered by the oracle gate (q99-q103 hash-match DuckDB at
sf0.001 and sf0.01); these pin the physical properties: the
decorrelated MIN join-back stays broadcast, the NOT-IN exclusion plans
as an anti join, the dominant-supplier filter ends in a semi join, and
nothing falls back to a cartesian product.
"""

from __future__ import annotations

from etl_data_warehouse_spark.plans import tpch3


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


class TestTpch3Plans:
    def test_no_cartesian_anywhere(self, spark, sf_dir):
        # q100's scalar-threshold comparison legitimately plans a 1-row
        # BroadcastNestedLoopJoin (the canonical decorrelation of a
        # scalar subquery); everything else must be hash-joined.
        for name, fn in tpch3.QUERIES.items():
            plan = _final_plan(fn(spark, sf_dir))
            assert "CartesianProduct" not in plan, name
            if name != "q100_tpch_q11_important_stock":
                assert "BroadcastNestedLoopJoin" not in plan, name

    def test_q2_min_join_back_is_broadcast(self, spark, sf_dir):
        plan = _final_plan(
            tpch3.q99_tpch_q2_min_cost_supplier(spark, sf_dir)
        )
        # the per-part MIN table joins back via broadcast — the big
        # derived-partsupp side must not shuffle a second time for it
        assert "BroadcastHashJoin" in plan

    def test_q16_not_in_plans_as_anti_join(self, spark, sf_dir):
        plan = _final_plan(tpch3.q102_tpch_q16_supplier_count(spark, sf_dir))
        assert "LeftAnti" in plan

    def test_q20_ends_in_semi_join(self, spark, sf_dir):
        plan = _final_plan(
            tpch3.q103_tpch_q20_dominant_supplier(spark, sf_dir)
        )
        assert "LeftSemi" in plan
