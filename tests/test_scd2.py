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
