"""TPC-H classic pack II (plans/tpch2.py) — plan-shape assertions.

Values are covered by the oracle gate (q68-q79 hash-match DuckDB at
sf0.001 and sf0.01); these tests pin the PHYSICAL properties each
query exists to demonstrate: semi/anti join strategies, disjunctive
equi-key extraction, and the absence of unplanned nested loops.
"""

from __future__ import annotations

from etl_data_warehouse_spark.plans import tpch2


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


class TestTpch2Plans:
    def test_no_cartesian_anywhere(self, spark, sf_dir):
        # q79's scalar-avg comparison legitimately plans a 1-row
        # BroadcastNestedLoopJoin (the broadcast side is a single
        # aggregate row); everything else must be hash-joined.
        for name, fn in tpch2.QUERIES.items():
            plan = _final_plan(fn(spark, sf_dir))
            assert "CartesianProduct" not in plan, name
            if name != "q79_tpch_q22_lapsed_customers":
                assert "BroadcastNestedLoopJoin" not in plan, name

    def test_q4_exists_plans_as_semi_join(self, spark, sf_dir):
        plan = _final_plan(tpch2.q68_tpch_q4_priority_check(spark, sf_dir))
        assert "LeftSemi" in plan
        # the returnflag filter is applied BEFORE the semi join's build
        assert "PushedFilters: [IsNotNull(l_returnflag)" in plan

    def test_q19_disjunction_keeps_equi_hash_join(self, spark, sf_dir):
        df = tpch2.q77_tpch_q19_disjunctive_revenue(spark, sf_dir)
        plan = _final_plan(df)
        # the OR-of-ANDs must not defeat the l_partkey = p_partkey
        # equi-key: one hash join with the disjunction as residual
        assert plan.count("BroadcastHashJoin") == 1
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q22_not_exists_plans_as_anti_join(self, spark, sf_dir):
        plan = _final_plan(tpch2.q79_tpch_q22_lapsed_customers(spark, sf_dir))
        assert "LeftAnti" in plan

    def test_q13_outer_join_keeps_zero_order_customers(self, spark, sf_dir):
        rows = tpch2.q72_tpch_q13_order_counts(spark, sf_dir).collect()
        # histogram totals must cover every customer exactly once
        from etl_data_warehouse_spark.sources.catalog import load_table

        n_cust = load_table(spark, "customer", sf_dir).count()
        assert sum(r["custdist"] for r in rows) == n_cust

    def test_q18_having_filters_before_dim_join(self, spark, sf_dir):
        plan = _final_plan(tpch2.q76_tpch_q18_large_orders(spark, sf_dir))
        # the quantity rollup (and its >250 filter) must sit below the
        # customer join: the filter appears on the agg output column
        assert "qty_dec" in plan
        agg_idx = plan.find("qty_dec")
        assert agg_idx != -1 and "Filter" in plan
