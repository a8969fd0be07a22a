"""Sharded manifest closers (operators/manifest.py, q129/q130):
keyed_global_rank == global row_number, ntile_from_rank == native
NTILE, sharded registry variants bit-identical to their global twins,
and the executed plans carry no corpus-sized single-partition sort."""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.manifest import (
    keyed_global_rank,
    ntile_from_rank,
)


def _final_plan(df) -> str:
    df.collect()  # a write would spawn its own QueryExecution
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def _row_number_windows_all_partitioned(plan: str) -> bool:
    """True iff every row_number window in the plan has a PARTITION BY:
    partition columns print bare inside windowspecdefinition while
    order columns print with ASC/DESC, so a global window's spec opens
    with a direction-suffixed column."""
    specs = re.findall(
        r"Window \[row_number\(\) windowspecdefinition\(([^,]+),", plan
    )
    assert specs, "no row_number window found"
    return all(" ASC" not in s and " DESC" not in s for s in specs)


class TestKeyedGlobalRank:
    def _frame(self, spark):
        # key = id div 37 (range-aligned by construction), deliberately
        # unbalanced; tiebreak column with duplicates across keys
        return (
            spark.range(2000)
            .select(
                F.col("id"),
                (F.col("id") / 37).cast("long").alias("key"),
                F.pmod(F.xxhash64("id"), F.lit(500)).alias("tie"),
            )
            .localCheckpoint()
        )

    def test_equals_global_row_number_asc(self, spark):
        df = self._frame(spark)
        got = keyed_global_rank(df, "key", ["tie", "id"], out="pos")
        wg = Window.orderBy("key", "tie", "id")
        want = df.withColumn("pos", F.row_number().over(wg).cast("long"))
        assert sorted(
            (r["id"], r["pos"]) for r in got.collect()
        ) == sorted((r["id"], r["pos"]) for r in want.collect())

    def test_equals_global_row_number_desc_key(self, spark):
        df = self._frame(spark)
        got = keyed_global_rank(
            df, "key", [F.col("tie").desc(), "id"], out="pos",
            key_desc=True,
        )
        wg = Window.orderBy(
            F.col("key").desc(), F.col("tie").desc(), "id"
        )
        want = df.withColumn("pos", F.row_number().over(wg).cast("long"))
        assert sorted(
            (r["id"], r["pos"]) for r in got.collect()
        ) == sorted((r["id"], r["pos"]) for r in want.collect())

    def test_total_col(self, spark):
        df = self._frame(spark)
        got = keyed_global_rank(
            df, "key", ["id"], out="pos", total_col="n"
        )
        rows = got.collect()
        assert {r["n"] for r in rows} == {2000}
        assert sorted(r["pos"] for r in rows) == list(range(1, 2001))


class TestNtileFromRank:
    def test_matches_native_ntile(self, spark):
        # N chosen to exercise remainder buckets (N % k != 0), exact
        # division, and the N < k degenerate case
        for n, k in [(2000, 10), (1997, 10), (7, 10), (10, 10), (23, 4)]:
            df = spark.range(1, n + 1).select(
                F.col("id").alias("rank")
            )
            got = df.withColumn(
                "b", ntile_from_rank(F.col("rank"), F.lit(n), k)
            )
            want = df.withColumn(
                "b",
                F.ntile(k).over(Window.orderBy("rank")).cast("int"),
            )
            assert [
                (r["rank"], r["b"])
                for r in got.orderBy("rank").collect()
            ] == [
                (r["rank"], r["b"])
                for r in want.orderBy("rank").collect()
            ], (n, k)


class TestShardedRegistryTwins:
    def test_q129_identical_to_q121(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.mixture import (
            q121_curriculum_schedule,
            q129_sharded_curriculum,
        )

        a = [tuple(r) for r in q121_curriculum_schedule(spark, sf_dir).collect()]
        b = [tuple(r) for r in q129_sharded_curriculum(spark, sf_dir).collect()]
        assert a == b

    def test_q130_identical_to_q122(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.mixture import (
            q122_dsir_weights,
            q130_sharded_dsir_manifest,
        )

        a = [tuple(r) for r in q122_dsir_weights(spark, sf_dir).collect()]
        b = [
            tuple(r)
            for r in q130_sharded_dsir_manifest(spark, sf_dir).collect()
        ]
        assert a == b

    def test_no_global_sort_in_sharded_plans(self, spark, sf_dir):
        """Every row_number in the sharded variants is partitioned
        (shard / n_tokens / _cell); the only single-partition stages
        left are the prefix-sum windows over the key-cardinality
        offsets frames. The global twins are the negative control."""
        from etl_data_warehouse_spark.plans.mixture import (
            q121_curriculum_schedule,
            q129_sharded_curriculum,
            q130_sharded_dsir_manifest,
        )

        p129 = _final_plan(q129_sharded_curriculum(spark, sf_dir))
        p130 = _final_plan(q130_sharded_dsir_manifest(spark, sf_dir))
        assert _row_number_windows_all_partitioned(p129)
        assert _row_number_windows_all_partitioned(p130)
        p121 = _final_plan(q121_curriculum_schedule(spark, sf_dir))
        assert not _row_number_windows_all_partitioned(p121)
