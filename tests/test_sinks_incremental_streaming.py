"""Sinks (merge/append), watermark incremental batch, streaming twin."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from etl_data_warehouse_spark.incremental import (
    WatermarkStore,
    commit_watermark,
    incremental_extract,
)
from etl_data_warehouse_spark.sources.sinks import (
    append_dedup,
    assign_stable_keys,
    merge_upsert,
    merge_upsert_partitioned,
    merge_upsert_stable,
)
from etl_data_warehouse_spark.streaming.daily_sales_stream import (
    start_daily_sales_stream,
)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "order_id long, product_id long, amount double, status string"
    )


class TestMergeUpsert:
    def test_insert_then_update(self, spark, tmp_path):
        path = str(tmp_path / "dim")
        r = merge_upsert(
            spark, _orders(spark, [(1, 10, 5.0, "A"), (2, 20, 6.0, "B")]),
            path, ["order_id"],
        )
        assert r == {"inserted": 2, "updated": 0}
        r = merge_upsert(
            spark, _orders(spark, [(2, 20, 9.0, "B2"), (3, 30, 7.0, "C")]),
            path, ["order_id"],
        )
        assert r == {"inserted": 1, "updated": 1}
        out = {x["order_id"]: x for x in spark.read.parquet(path).collect()}
        assert len(out) == 3
        assert out[2]["amount"] == 9.0 and out[2]["status"] == "B2"

    def test_idempotent_rerun(self, spark, tmp_path):
        path = str(tmp_path / "dim2")
        batch = _orders(spark, [(1, 10, 5.0, "A"), (2, 20, 6.0, "B")])
        merge_upsert(spark, batch, path, ["order_id"])
        before = sorted(map(tuple, spark.read.parquet(path).collect()))
        merge_upsert(spark, batch, path, ["order_id"])
        after = sorted(map(tuple, spark.read.parquet(path).collect()))
        assert before == after

    def test_append_dedup_do_nothing(self, spark, tmp_path):
        path = str(tmp_path / "fact")
        n = append_dedup(
            spark, _orders(spark, [(1, 1, 1.0, "X")]), path, ["order_id"]
        )
        assert n == 1
        n = append_dedup(
            spark,
            _orders(spark, [(1, 1, 99.0, "CHANGED"), (2, 2, 2.0, "Y")]),
            path,
            ["order_id"],
        )
        assert n == 1  # conflicting key 1 is DO NOTHING'd
        out = {x["order_id"]: x for x in spark.read.parquet(path).collect()}
        assert out[1]["amount"] == 1.0

    def test_partitioned_merge_touches_only_partitions(self, spark, tmp_path):
        path = str(tmp_path / "part_fact")
        df1 = spark.createDataFrame(
            [(1, "2024-01-01", 1.0), (2, "2024-01-02", 2.0)],
            "k long, day string, v double",
        )
        merge_upsert_partitioned(spark, df1, path, ["k"], "day")
        df2 = spark.createDataFrame(
            [(2, "2024-01-02", 20.0), (3, "2024-01-02", 3.0)],
            "k long, day string, v double",
        )
        merge_upsert_partitioned(spark, df2, path, ["k"], "day")
        out = {x["k"]: x for x in spark.read.parquet(path).collect()}
        assert len(out) == 3
        assert out[2]["v"] == 20.0
        assert out[1]["v"] == 1.0  # untouched partition survived


def _dim(spark, rows):
    return spark.createDataFrame(rows, "customer_id long, name string")


class TestStableKeys:
    """Reference upsert semantics (warehouse_loader.py:56-69): the
    surrogate key is excluded from the update SET, so re-loaded rows
    keep their key; only genuinely new business keys mint new ones."""

    def test_two_runs_preserve_keys_and_extend(self, spark, tmp_path):
        path = str(tmp_path / "dim_c")
        r1, k1 = merge_upsert_stable(
            spark,
            _dim(spark, [(10, "ann"), (20, "bob"), (30, "cat")]),
            path, ["customer_id"], "customer_key",
        )
        assert r1 == {"inserted": 3, "updated": 0}
        keys1 = {
            x["customer_id"]: x["customer_key"]
            for x in spark.read.parquet(path).collect()
        }
        assert sorted(keys1.values()) == [1, 2, 3]
        # overlapping second batch: 20 updated (key kept), 40 new
        r2, k2 = merge_upsert_stable(
            spark,
            _dim(spark, [(20, "bob2"), (40, "dee")]),
            path, ["customer_id"], "customer_key",
        )
        assert r2 == {"inserted": 1, "updated": 1}
        out = {
            x["customer_id"]: x for x in spark.read.parquet(path).collect()
        }
        assert out[20]["customer_key"] == keys1[20]  # key survived update
        assert out[20]["name"] == "bob2"  # payload did update
        assert out[10]["customer_key"] == keys1[10]
        assert out[40]["customer_key"] == 4  # max+1, no renumbering
        # full-snapshot re-run is a key-level no-op
        snap = _dim(spark, [(c, out[c]["name"]) for c in sorted(out)])
        merge_upsert_stable(spark, snap, path, ["customer_id"], "customer_key")
        again = {
            x["customer_id"]: x["customer_key"]
            for x in spark.read.parquet(path).collect()
        }
        assert again == {c: out[c]["customer_key"] for c in out}

    def test_assign_stable_keys_ignores_incoming_key(self, spark):
        existing = spark.createDataFrame(
            [(7, 10, "ann")], "customer_key long, customer_id long, name string"
        )
        incoming = spark.createDataFrame(
            [(99, 10, "ann2"), (99, 20, "bob")],
            "customer_key long, customer_id long, name string",
        )
        out = {
            x["customer_id"]: x["customer_key"]
            for x in assign_stable_keys(
                existing, incoming, ["customer_id"], "customer_key"
            ).collect()
        }
        assert out == {10: 7, 20: 8}

    def test_assign_stable_keys_dedups_incoming(self, spark):
        """Duplicate business keys in one batch must collapse to ONE
        surrogate (keep-first under deterministic ordering), never mint
        several keys for the same business key."""
        existing = spark.createDataFrame(
            [(7, 10, "ann")], "customer_key long, customer_id long, name string"
        )
        incoming = spark.createDataFrame(
            [(0, 20, "bob_a"), (0, 20, "bob_b"), (0, 10, "ann2"), (0, 30, "cat")],
            "customer_key long, customer_id long, name string",
        )
        rows = assign_stable_keys(
            existing, incoming, ["customer_id"], "customer_key"
        ).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r["customer_id"], []).append(r)
        assert {k: len(v) for k, v in by_id.items()} == {10: 1, 20: 1, 30: 1}
        assert by_id[10][0]["customer_key"] == 7
        assert {by_id[20][0]["customer_key"], by_id[30][0]["customer_key"]} == {8, 9}
        assert by_id[20][0]["name"] == "bob_a"  # deterministic keep-first


class TestIncremental:
    def test_watermark_advances_and_filters(self, spark, tmp_path, sf_dir):
        store = WatermarkStore(str(tmp_path / "wm.json"))
        full = incremental_extract(spark, "orders", "o_orderdate", store, sf_dir)
        n_full = full.count()
        assert n_full > 0
        # extraction alone must NOT advance the watermark: a failed sink
        # between extract and commit must not lose the batch.
        assert store.get("orders") is None
        retry = incremental_extract(spark, "orders", "o_orderdate", store, sf_dir)
        assert retry.count() == n_full
        # sink "succeeds" -> commit; second run sees nothing newer.
        commit_watermark(full, "orders", "o_orderdate", store)
        assert store.get("orders") is not None
        second = incremental_extract(
            spark, "orders", "o_orderdate", store, sf_dir
        )
        assert second.count() == 0
        # committing an empty batch is a no-op, not a regression to None
        wm = store.get("orders")
        assert commit_watermark(second, "orders", "o_orderdate", store) is None
        assert store.get("orders") == wm

    def test_mid_watermark(self, spark, tmp_path, sf_dir):
        store = WatermarkStore(str(tmp_path / "wm2.json"))
        store.set("orders", "1999-01-01 00:00:00")
        df = incremental_extract(
            spark, "orders", "o_orderdate", store, sf_dir, advance=False
        )
        assert df.count() > 0
        assert (
            df.agg(F.min("o_orderdate")).first()[0]
            > datetime.datetime(1999, 1, 1)
        )


class TestStreaming:
    def _write_batch(self, spark, input_dir, rows, name):
        df = spark.createDataFrame(
            rows,
            "order_id long, product_id long, order_ts timestamp, "
            "amount double, status string",
        )
        # append part-files into the watched directory (the file stream
        # source does not recurse into subdirectories)
        df.coalesce(1).write.mode("append").parquet(input_dir)

    def test_available_now_rollup_and_late_data_upsert(self, spark, tmp_path):
        ts = datetime.datetime
        input_dir = str(tmp_path / "in")
        out_path = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)
        self._write_batch(
            spark,
            input_dir,
            [
                (1, 100, ts(2024, 1, 1, 10), 5.0, "COMPLETED"),
                (2, 100, ts(2024, 1, 1, 12), 7.0, "CANCELLED"),
                (3, 200, ts(2024, 1, 2, 9), 11.0, "COMPLETED"),
            ],
            "b1",
        )
        q = start_daily_sales_stream(spark, input_dir, out_path, ckpt)
        q.awaitTermination(120)
        out = {
            (str(r["sales_date"]), r["product_id"]): r
            for r in spark.read.parquet(out_path).collect()
        }
        assert out[("2024-01-01", 100)]["total_orders_count"] == 2
        assert out[("2024-01-01", 100)]["total_sales_amount"] == 12.0
        assert out[("2024-01-01", 100)]["cancelled_count"] == 1
        # late-arriving + new data → second AvailableNow run upserts
        self._write_batch(
            spark,
            input_dir,
            [
                (4, 100, ts(2024, 1, 1, 23), 3.0, "COMPLETED"),
                (5, 200, ts(2024, 1, 3, 1), 9.0, "COMPLETED"),
            ],
            "b2",
        )
        q2 = start_daily_sales_stream(spark, input_dir, out_path, ckpt)
        q2.awaitTermination(120)
        out = {
            (str(r["sales_date"]), r["product_id"]): r
            for r in spark.read.parquet(out_path).collect()
        }
        assert out[("2024-01-01", 100)]["total_orders_count"] == 3
        assert out[("2024-01-01", 100)]["total_sales_amount"] == 15.0
        assert out[("2024-01-03", 200)]["total_orders_count"] == 1


class TestStreamingDedup:
    def test_replayed_orders_dropped_within_watermark(self, spark, tmp_path):
        import datetime

        from etl_data_warehouse_spark.streaming.daily_sales_stream import (
            deduped_order_stream,
            read_order_stream,
        )

        ts = datetime.datetime
        input_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ck")
        os.makedirs(input_dir)
        rows = [
            (1, 10, ts(2024, 1, 1, 10), 5.0, "COMPLETED"),
            (1, 10, ts(2024, 1, 1, 10), 5.0, "COMPLETED"),  # replay
            (2, 20, ts(2024, 1, 1, 11), 7.0, "COMPLETED"),
        ]
        spark.createDataFrame(
            rows,
            "order_id long, product_id long, order_ts timestamp, "
            "amount double, status string",
        ).coalesce(1).write.mode("append").parquet(input_dir)
        stream = deduped_order_stream(read_order_stream(spark, input_dir))
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.read.parquet(out_dir)
        assert out.count() == 2
        assert out.filter("order_id = 1").count() == 1
        # replay order 1 again in a later microbatch → still dropped
        spark.createDataFrame(
            [(1, 10, ts(2024, 1, 1, 10), 5.0, "COMPLETED"),
             (3, 30, ts(2024, 1, 1, 12), 9.0, "COMPLETED")],
            "order_id long, product_id long, order_ts timestamp, "
            "amount double, status string",
        ).coalesce(1).write.mode("append").parquet(input_dir)
        q2 = (
            deduped_order_stream(read_order_stream(spark, input_dir))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        out = spark.read.parquet(out_dir)
        assert out.filter("order_id = 1").count() == 1
        assert out.filter("order_id = 3").count() == 1


class TestStreamStaticEnrichment:
    def _write_orders(self, spark, input_dir, rows):
        spark.createDataFrame(
            rows,
            "order_id long, customer_id long, order_ts timestamp, amount double",
        ).coalesce(1).write.mode("append").parquet(input_dir)

    def test_enriched_rollup_equals_batch_twin_and_sees_dim_refresh(
        self, spark, tmp_path, sf_dir
    ):
        import datetime

        from etl_data_warehouse_spark.sources.catalog import load_table
        from etl_data_warehouse_spark.streaming.enriched_stream import (
            enrich_orders,
            segment_revenue_aggregate,
            start_enriched_stream,
        )

        ts = datetime.datetime
        input_dir = str(tmp_path / "in")
        out_path = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)
        customers = load_table(spark, "customer", sf_dir)
        known = [r["c_custkey"] for r in customers.limit(3).collect()]
        rows = [
            (1, known[0], ts(2024, 2, 1, 10), 10.0),
            (2, known[1], ts(2024, 2, 1, 11), 20.0),
            (3, known[2], ts(2024, 2, 2, 9), 5.0),
            (4, 10**12, ts(2024, 2, 2, 10), 7.0),  # orphan
        ]
        self._write_orders(spark, input_dir, rows)
        q = start_enriched_stream(spark, input_dir, customers, out_path, ckpt)
        q.awaitTermination(120)
        got = sorted(
            (str(r["sales_date"]), r["segment"], r["revenue"], r["order_count"])
            for r in spark.read.parquet(out_path).collect()
        )
        # batch twin over the same rows
        batch = spark.createDataFrame(
            rows,
            "order_id long, customer_id long, order_ts timestamp, amount double",
        )
        want = sorted(
            (str(r["sales_date"]), r["segment"], r["revenue"], r["order_count"])
            for r in segment_revenue_aggregate(
                enrich_orders(batch, customers)
            ).collect()
        )
        assert got == want
        assert any(seg == "UNKNOWN" for _, seg, _, _ in got)  # orphan kept

        # dim refresh between triggers: the formerly-orphan key appears
        # in the static side; the next microbatch resolves it without a
        # new query plan
        fixed = customers.limit(1).select(
            F.lit(10**12).alias("c_custkey"),
            *[F.col(c) for c in customers.columns if c != "c_custkey"],
        )
        refreshed = customers.union(fixed.select(customers.columns))
        self._write_orders(
            spark, input_dir, [(5, 10**12, ts(2024, 2, 3, 8), 9.0)]
        )
        q2 = start_enriched_stream(spark, input_dir, refreshed, out_path, ckpt)
        q2.awaitTermination(120)
        day3 = [
            r
            for r in spark.read.parquet(out_path).collect()
            if str(r["sales_date"]) == "2024-02-03"
        ]
        assert len(day3) == 1 and day3[0]["segment"] != "UNKNOWN"


class TestMergeInto:
    """MERGE INTO surface (sources/merge.py): statement generation,
    capability gate, and join-merge parity (reference ON CONFLICT,
    warehouse_loader.py:55-83)."""

    def test_merge_sql_do_update(self):
        from etl_data_warehouse_spark.sources.merge import merge_sql

        sql = merge_sql(
            "wh.dim_customers", "batch", ["customer_id"],
            ["customer_id", "name", "tier"],
        )
        assert sql == (
            "MERGE INTO wh.dim_customers t\n"
            "USING batch s\n"
            "ON t.customer_id = s.customer_id\n"
            "WHEN MATCHED THEN UPDATE SET t.name = s.name, t.tier = s.tier\n"
            "WHEN NOT MATCHED THEN INSERT (customer_id, name, tier) "
            "VALUES (s.customer_id, s.name, s.tier)"
        )

    def test_merge_sql_do_nothing(self):
        from etl_data_warehouse_spark.sources.merge import merge_sql

        sql = merge_sql(
            "t", "s", ["k"], ["k", "v"], insert_only=True
        )
        assert "WHEN MATCHED" not in sql
        assert "WHEN NOT MATCHED THEN INSERT (k, v)" in sql

    def test_gate_false_in_vanilla_session_and_fallback_parity(
        self, spark, tmp_path
    ):
        from etl_data_warehouse_spark.sources.merge import (
            catalog_supports_merge,
            merge_into,
        )

        assert not catalog_supports_merge(spark)
        p_merge = str(tmp_path / "via_merge")
        p_twin = str(tmp_path / "via_upsert")
        base = _dim(spark, [(10, "ann"), (20, "bob")])
        batch = _dim(spark, [(20, "bob2"), (30, "cat")])
        for p in (p_merge, p_twin):
            merge_upsert(spark, base, p, ["customer_id"])
        counts = merge_into(
            spark, batch, ["customer_id"], target_table="wh.dim", path=p_merge
        )
        twin = merge_upsert(spark, batch, p_twin, ["customer_id"])
        assert counts == twin == {"inserted": 1, "updated": 1}
        a = sorted(map(tuple, spark.read.parquet(p_merge).collect()))
        b = sorted(map(tuple, spark.read.parquet(p_twin).collect()))
        assert a == b

    def test_insert_only_fallback(self, spark, tmp_path):
        from etl_data_warehouse_spark.sources.merge import merge_into

        p = str(tmp_path / "ins_only")
        merge_into(
            spark, _dim(spark, [(1, "a")]), ["customer_id"], path=p
        )
        out = merge_into(
            spark, _dim(spark, [(1, "A2"), (2, "b")]), ["customer_id"],
            path=p, insert_only=True,
        )
        assert out == {"inserted": 1, "updated": 0}
        rows = {
            r["customer_id"]: r["name"]
            for r in spark.read.parquet(p).collect()
        }
        assert rows == {1: "a", 2: "b"}  # DO NOTHING kept the old row
