"""Type-2 SCD merge (sources/sinks.py scd2_upsert)."""

from __future__ import annotations

from etl_data_warehouse_spark.sources.sinks import scd2_upsert


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "customer_id long, segment string, city string"
    )


class TestSCD2:
    def test_history_preserved_on_change(self, spark, tmp_path):
        path = str(tmp_path / "dim_scd2")
        day1 = _dim(spark, [(1, "gold", "rome"), (2, "silver", "oslo")])
        c1 = scd2_upsert(
            spark, day1, path, "customer_id", ["segment", "city"], "2024-01-01"
        )
        assert c1 == {"inserted": 2, "changed": 0, "unchanged": 0}

        # day 2: customer 1 changes segment, customer 3 appears
        day2 = _dim(
            spark,
            [(1, "platinum", "rome"), (2, "silver", "oslo"), (3, "gold", "riga")],
        )
        c2 = scd2_upsert(
            spark, day2, path, "customer_id", ["segment", "city"], "2024-02-01"
        )
        assert c2 == {"inserted": 1, "changed": 1, "unchanged": 1}

        rows = spark.read.parquet(path).collect()
        by = {}
        for r in rows:
            by.setdefault(r["customer_id"], []).append(r)
        v1, v2 = sorted(by[1], key=lambda r: r["version"])
        assert not v1["is_current"] and str(v1["valid_to"]) == "2024-02-01"
        assert v1["segment"] == "gold"
        assert v2["is_current"] and v2["valid_to"] is None
        assert v2["segment"] == "platinum" and v2["version"] == 2
        assert len(by[2]) == 1 and by[2][0]["is_current"]
        assert len(by[3]) == 1 and by[3][0]["version"] == 1
        # exactly one current row per key
        for vs in by.values():
            assert sum(1 for r in vs if r["is_current"]) == 1

    def test_rerun_is_idempotent(self, spark, tmp_path):
        path = str(tmp_path / "dim_scd2b")
        day1 = _dim(spark, [(1, "gold", "rome")])
        scd2_upsert(
            spark, day1, path, "customer_id", ["segment", "city"], "2024-01-01"
        )
        c = scd2_upsert(
            spark, day1, path, "customer_id", ["segment", "city"], "2024-01-01"
        )
        assert c == {"inserted": 0, "changed": 0, "unchanged": 1}
        assert spark.read.parquet(path).count() == 1

    def test_change_and_revert_makes_three_versions(self, spark, tmp_path):
        path = str(tmp_path / "dim_scd2c")
        for day, seg in [
            ("2024-01-01", "gold"),
            ("2024-02-01", "silver"),
            ("2024-03-01", "gold"),
        ]:
            scd2_upsert(
                spark,
                _dim(spark, [(1, seg, "rome")]),
                path,
                "customer_id",
                ["segment", "city"],
                day,
            )
        rows = sorted(
            spark.read.parquet(path).collect(), key=lambda r: r["version"]
        )
        assert [r["segment"] for r in rows] == ["gold", "silver", "gold"]
        assert [r["is_current"] for r in rows] == [False, False, True]
        assert [str(r["valid_from"]) for r in rows] == [
            "2024-01-01",
            "2024-02-01",
            "2024-03-01",
        ]


class TestSCD2Partitioned:
    def _run_both(self, spark, tmp_path, days):
        from etl_data_warehouse_spark.sources.sinks import (
            scd2_upsert_partitioned,
        )

        flat = str(tmp_path / "flat")
        part = str(tmp_path / "part")
        for rows, eff in days:
            cf = scd2_upsert(
                spark, _dim(spark, rows), flat, "customer_id",
                ["segment", "city"], eff,
            )
            cp = scd2_upsert_partitioned(
                spark, _dim(spark, rows), part, "customer_id",
                ["segment", "city"], eff,
            )
            assert cf == cp, eff
        return flat, part

    def test_partitioned_equals_flat_across_months(self, spark, tmp_path):
        days = [
            ([(1, "gold", "rome"), (2, "silver", "oslo")], "2024-01-01"),
            ([(1, "platinum", "rome"), (2, "silver", "oslo"),
              (3, "gold", "riga")], "2024-02-01"),
            ([(1, "platinum", "lyon"), (2, "gold", "oslo"),
              (3, "gold", "riga")], "2024-03-01"),
            ([(1, "platinum", "lyon"), (2, "gold", "oslo"),
              (3, "silver", "riga")], "2024-03-15"),
        ]
        flat, part = self._run_both(spark, tmp_path, days)
        key = ["customer_id", "version"]
        a = sorted(
            tuple(r) for r in spark.read.parquet(flat).collect()
        )
        b = sorted(
            tuple(r)
            for r in spark.read.parquet(part).drop("scd_part").select(
                spark.read.parquet(flat).columns
            ).collect()
        )
        assert a == b

    def test_old_month_partitions_not_rewritten(self, spark, tmp_path):
        import os

        from etl_data_warehouse_spark.sources.sinks import (
            scd2_upsert_partitioned,
        )

        part = str(tmp_path / "p2")
        scd2_upsert_partitioned(
            spark, _dim(spark, [(1, "gold", "rome")]), part,
            "customer_id", ["segment", "city"], "2024-01-01",
        )
        scd2_upsert_partitioned(
            spark, _dim(spark, [(1, "silver", "rome")]), part,
            "customer_id", ["segment", "city"], "2024-02-01",
        )
        jan_dir = os.path.join(part, "scd_part=closed_2024-02")
        mtimes = {
            f: os.path.getmtime(os.path.join(jan_dir, f))
            for f in os.listdir(jan_dir)
            if f.endswith(".parquet")
        }
        assert mtimes
        # a later-month change must not touch the February directory
        scd2_upsert_partitioned(
            spark, _dim(spark, [(1, "bronze", "rome")]), part,
            "customer_id", ["segment", "city"], "2024-05-01",
        )
        after = {
            f: os.path.getmtime(os.path.join(jan_dir, f))
            for f in os.listdir(jan_dir)
            if f.endswith(".parquet")
        }
        assert after == mtimes

    def test_snapshot_as_of(self, spark, tmp_path):
        from etl_data_warehouse_spark.sources.sinks import (
            scd2_snapshot,
            scd2_upsert_partitioned,
        )

        part = str(tmp_path / "p3")
        days = [
            ([(1, "gold", "rome"), (2, "silver", "oslo")], "2024-01-01"),
            ([(1, "platinum", "rome"), (2, "silver", "oslo")], "2024-02-01"),
            ([(1, "platinum", "lyon"), (2, "gold", "oslo")], "2024-04-01"),
        ]
        for rows, eff in days:
            scd2_upsert_partitioned(
                spark, _dim(spark, rows), part, "customer_id",
                ["segment", "city"], eff,
            )
        snap = {
            r["customer_id"]: r
            for r in scd2_snapshot(spark, part, "2024-02-15").collect()
        }
        assert snap[1]["segment"] == "platinum" and snap[1]["city"] == "rome"
        assert snap[2]["segment"] == "silver"
        # pre-history snapshot is empty-safe
        assert scd2_snapshot(spark, part, "2023-12-31").count() == 0
        # today's snapshot == current
        today = {
            r["customer_id"]: r["segment"]
            for r in scd2_snapshot(spark, part, "2024-05-01").collect()
        }
        assert today == {1: "platinum", 2: "gold"}
