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


class TestPivotUnpivot:
    def test_pivot_is_null_free_and_partitions_totals(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_data_warehouse_spark.plans.olap_ext import q57_status_pivot
        from etl_data_warehouse_spark.sources.catalog import load_table

        wide = q57_status_pivot(spark, sf_dir)
        rows = wide.collect()
        assert rows
        for r in rows:
            for c in wide.columns:
                assert r[c] is not None
        # per-month status counts must re-add to the plain count
        plain = {
            r["order_month"]: r["n"]
            for r in load_table(spark, "orders", sf_dir)
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for r in rows:
            assert r["cnt_f"] + r["cnt_o"] + r["cnt_p"] == plain[r["order_month"]]

    def test_unpivot_round_trips_pivot(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.olap_ext import (
            q57_status_pivot,
            q58_status_unpivot,
        )

        wide = {r["order_month"]: r for r in q57_status_pivot(spark, sf_dir).collect()}
        long_rows = q58_status_unpivot(spark, sf_dir).collect()
        assert len(long_rows) == 3 * len(wide)
        for r in long_rows:
            assert r["revenue"] == wide[r["order_month"]][f"rev_{r['status'].lower()}"]


class TestOlapPlanShapes:
    def _plan(self, df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_grouping_sets_is_one_expand_not_a_union(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.olap_ext import q60_grouping_sets

        plan = self._plan(q60_grouping_sets(spark, sf_dir))
        assert "Expand" in plan  # one scan fanned to the 3 grouping sets
        assert "Union" not in plan  # NOT 3 rescans of the fact

    def test_distribution_windows_share_one_shuffle(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.olap_ext import (
            q61_distribution_windows,
        )

        df = q61_distribution_windows(spark, sf_dir)
        df.collect()  # finalize AQE
        plan = self._plan(df)
        # AQE toString prints Final Plan then Initial Plan — grade the final
        final = plan.split("== Initial Plan ==")[0]
        # both window specs hash-partition on order_month; the top-5
        # filter window reuses it -> exactly one exchange on the column
        assert final.count("Exchange hashpartitioning(order_month") == 1
        # the rank<=5 predicate was pushed into the sort (top-k, not full)
        assert "WindowGroupLimit" in final


class TestSketchQuantiles:
    def test_percentile_approx_within_rank_error_of_exact(self, spark, sf_dir):
        """percentile_approx (KLL-style sketch) is the 100-TB path when
        q53's per-partition exact selection is too expensive; bound its
        RANK error against the exact rank-selection values: with
        accuracy=10000 the sketch quantile must land within 1% of the
        sorted position the exact quantile occupies."""
        from pyspark.sql import functions as F

        from etl_data_warehouse_spark.sources.catalog import load_table

        orders = load_table(spark, "orders", sf_dir)
        month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        approx = {
            r["order_month"]: r["qs"]
            for r in orders.select(month, "o_totalprice")
            .groupBy("order_month")
            .agg(
                F.percentile_approx(
                    "o_totalprice", [0.25, 0.5, 0.75, 0.9], 10000
                ).alias("qs")
            )
            .collect()
        }
        import bisect

        vals_by_month: dict[str, list] = {}
        for r in orders.select(month, "o_totalprice").collect():
            vals_by_month.setdefault(r["order_month"], []).append(
                r["o_totalprice"]
            )
        for m, vals in vals_by_month.items():
            vals.sort()
            n = len(vals)
            for q, got in zip([0.25, 0.5, 0.75, 0.9], approx[m]):
                rank = bisect.bisect_left(vals, got)
                assert abs(rank - q * n) <= max(2, 0.01 * n), (m, q)


class TestSketchPlanReuse:
    """The round-8 ReuseExchange discipline, pinned as regression
    tests: multi-consumer subplans in the sketch queries must share
    ONE materialization (final-executed-plan scan counts), per the
    three splitter classes documented in CLAUDE.md / the q136/q139
    docstrings. collect() first — .write spawns its own
    QueryExecution (the q122 audit rule)."""

    @staticmethod
    def _final_plan(df):
        df.collect()
        return (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )

    def test_q136_two_scans_shared_bitmap(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.olap_ext import (
            q136_bloom_prune,
        )

        plan = self._final_plan(q136_bloom_prune(spark, sf_dir))
        # orders once + customer once; bitmap build and member list
        # each reused, never recomputed
        assert plan.count("FileScan parquet") == 2, plan.count(
            "FileScan parquet"
        )
        assert (
            plan.count("ReusedExchange") + plan.count("ReusedQueryStage")
            >= 2
        )

    def test_q139_single_events_scan(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.olap_ext import (
            q139_rolling_distinct_sketch,
        )

        plan = self._final_plan(q139_rolling_distinct_sketch(spark, sf_dir))
        assert plan.count("FileScan parquet") == 1, plan.count(
            "FileScan parquet"
        )

    def test_q142_single_events_scan(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.olap_ext import (
            q142_kmv_audience_overlap,
        )

        plan = self._final_plan(
            q142_kmv_audience_overlap(spark, sf_dir)
        )
        assert plan.count("FileScan parquet") == 1, plan.count(
            "FileScan parquet"
        )
        assert "CartesianProduct" not in plan


class TestColumnStatsMerge:
    """q147's level-1 partials must merge exactly across disjoint row
    slices — the incremental re-profiling contract: register m_j by
    MAX, counts by SUM, min/max by MIN/MAX equal a one-shot profile
    of the union (exact-NDV partials are value-grain and NOT in this
    contract — the register estimate is the mergeable NDV)."""

    def test_merged_partials_equal_full_profile(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_data_warehouse_spark.plans.olap_ext import (
            _Q147_COLS,
            column_stats_parts,
        )
        from etl_data_warehouse_spark.sources.catalog import load_table

        orders = load_table(
            spark, "orders", sf_dir, columns=list(_Q147_COLS)
        )
        a = orders.filter(F.col("o_orderkey") % 2 == 0)
        b = orders.filter(F.col("o_orderkey") % 2 == 1)
        merged = (
            column_stats_parts(a, _Q147_COLS)
            .unionByName(column_stats_parts(b, _Q147_COLS))
            .groupBy("col_name", "hll_idx")
            .agg(
                F.max("m_j").alias("m_j"),
                F.sum("n_rows_part").cast("long").alias("n_rows_part"),
                F.sum("n_nulls_part").cast("long").alias("n_nulls_part"),
                F.min("min_part").alias("min_part"),
                F.max("max_part").alias("max_part"),
            )
        )
        full = column_stats_parts(orders, _Q147_COLS)

        def key(rows, fields):
            return {
                (r["col_name"], r["hll_idx"]): tuple(
                    r[f] for f in fields
                )
                for r in rows
            }

        fields = ["m_j", "n_rows_part", "n_nulls_part", "min_part", "max_part"]
        assert key(merged.collect(), fields) == key(
            full.collect(), fields
        )
