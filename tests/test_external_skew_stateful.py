"""External JSON source, salted skew joins, stateful streaming sessions."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_data_warehouse_spark.operators.sessionize import sessionize
from etl_data_warehouse_spark.operators.skew import salted_join, salted_sum
from etl_data_warehouse_spark.sources.catalog import load_table
from etl_data_warehouse_spark.sources.external import read_json_documents
from etl_data_warehouse_spark.streaming.stateful_sessions import (
    start_session_stream,
)


class TestJsonDocuments:
    SCHEMA = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("review_id", T.StringType()),
            T.StructField("rating", T.IntegerType()),
            T.StructField("review_date", T.TimestampType()),
        ]
    )

    def test_schema_on_read_flatten_and_incremental(self, spark, tmp_path):
        docs = [
            {"_id": "a1", "review_id": "r1", "rating": 5,
             "review_date": "2024-01-01T00:00:00"},
            {"_id": "a2", "review_id": "r2", "rating": 3,
             "review_date": "2024-06-01T00:00:00"},
        ]
        p = tmp_path / "docs.json"
        p.write_text("\n".join(json.dumps(d) for d in docs))
        out = read_json_documents(spark, str(p), self.SCHEMA)
        assert out.columns == ["review_id", "rating", "review_date"]  # _id dropped
        assert out.count() == 2
        inc = read_json_documents(
            spark, str(p), self.SCHEMA,
            predicate=F.col("review_date") > F.lit("2024-03-01"),
        )
        assert [r["review_id"] for r in inc.collect()] == ["r2"]


class TestSkew:
    def test_salted_join_equals_plain_join(self, spark, sf_dir):
        li = load_table(spark, "lineitem", sf_dir).select(
            "l_orderkey", "l_partkey", "l_extendedprice"
        )
        part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
        right = part.withColumnRenamed("p_partkey", "l_partkey")
        plain = (
            li.join(right, "l_partkey")
            .groupBy("p_brand")
            .agg(F.count("*").alias("n"))
        )
        salted = (
            salted_join(li, right, "l_partkey", salt=4)
            .groupBy("p_brand")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_salted_join_rejects_outer_and_anti(self, spark, sf_dir):
        # the exploded right side duplicates unmatched right rows s
        # times under right/full joins and inverts anti semantics —
        # those types must be rejected, not silently wrong.
        li = load_table(spark, "lineitem", sf_dir).select("l_partkey")
        right = load_table(spark, "part", sf_dir).select(
            F.col("p_partkey").alias("l_partkey")
        )
        for how in ("right", "full", "left_anti", "cross"):
            with pytest.raises(ValueError, match="salted_join supports"):
                salted_join(li, right, "l_partkey", salt=4, how=how)

    def test_salted_sum_equals_plain_sum(self, spark, sf_dir):
        li = load_table(spark, "lineitem", sf_dir)
        plain = (
            li.groupBy("l_returnflag")
            .agg(F.sum(F.col("l_quantity")).alias("s"))
        )
        salted = salted_sum(li, "l_returnflag", F.col("l_quantity"), "s")
        assert {(r["l_returnflag"], r["s"]) for r in plain.collect()} == {
            (r["l_returnflag"], r["s"]) for r in salted.collect()
        }


class TestStatefulSessions:
    def _write(self, spark, d, rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(d)

    def test_state_carries_across_microbatches(self, spark, tmp_path):
        ts = datetime.datetime
        input_dir, out, ckpt = (
            str(tmp_path / "in"),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
        )
        os.makedirs(input_dir)
        self._write(
            spark,
            input_dir,
            [(1, ts(2024, 1, 1, 10, 0)), (1, ts(2024, 1, 1, 10, 10))],
        )
        q = start_session_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 1 and rows[0]["n_events"] == 2
        # batch 2: one event continuing the session, one after the gap
        self._write(
            spark,
            input_dir,
            [(1, ts(2024, 1, 1, 10, 20)), (1, ts(2024, 1, 1, 12, 0))],
        )
        q2 = start_session_stream(spark, input_dir, out, ckpt)
        q2.awaitTermination(120)
        rows = {
            r["session_idx"]: r for r in spark.read.parquet(out).collect()
        }
        assert len(rows) == 2
        assert rows[1]["n_events"] == 3  # extended, not restarted
        assert rows[2]["n_events"] == 1

    def test_matches_batch_sessionizer(self, spark, tmp_path):
        """The streaming operator must agree with the batch twin."""
        ts = datetime.datetime
        events = [
            (u, ts(2024, 1, 1, 8) + datetime.timedelta(minutes=17 * i))
            for u in (1, 2, 3)
            for i in range(12)
        ]
        input_dir, out, ckpt = (
            str(tmp_path / "in2"),
            str(tmp_path / "out2"),
            str(tmp_path / "ck2"),
        )
        os.makedirs(input_dir)
        self._write(spark, input_dir, events)
        q = start_session_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)
        streamed = {
            (r["user_id"], r["session_idx"]): r["n_events"]
            for r in spark.read.parquet(out).collect()
        }
        batch_events = spark.createDataFrame(
            [(i, t, u, "view", 0.0, "{}") for i, (u, t) in enumerate(events)],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        batched = {
            (r["user_id"], r["session_idx"]): r["n_events"]
            for r in sessionize(batch_events).collect()
        }
        assert streamed == batched


class TestBucketing:
    def test_colocated_join_has_no_shuffle(self, spark, sf_dir, tmp_path):
        from etl_data_warehouse_spark.sources.bucketing import (
            colocated_join,
            write_bucketed,
        )

        orders = load_table(spark, "orders", sf_dir)
        li = load_table(spark, "lineitem", sf_dir).withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", "o_orderkey", 8,
                       str(tmp_path / "b_orders"))
        write_bucketed(li, "b_lineitem", "o_orderkey", 8,
                       str(tmp_path / "b_lineitem"))
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = colocated_join(spark, "b_orders", "b_lineitem",
                                    "o_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # zero shuffle
            # results identical to the plain join
            assert joined.count() == orders.join(li, "o_orderkey").count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")

    def test_stale_catalog_entry_still_validated(
        self, spark, sf_dir, tmp_path
    ):
        """register_bucketed_table must validate the layout even when
        the table NAME is already in the catalog — a stale entry
        pointing at a since-rewritten directory was previously never
        caught (r12 advice)."""
        import pytest

        from etl_data_warehouse_spark.sources.bucketing import (
            register_bucketed_table,
            write_bucketed,
        )

        orders = load_table(spark, "orders", sf_dir).limit(100)
        path = str(tmp_path / "b_stale")
        write_bucketed(orders, "b_stale", "o_orderkey", 8, path)
        try:
            # rewrite the directory with a DIFFERENT bucket spec while
            # the catalog entry (8 buckets) still exists
            import shutil

            shutil.rmtree(path)
            orders.write.mode("overwrite").parquet(path)  # plain parquet
            with pytest.raises(ValueError):
                register_bucketed_table(
                    spark, "b_stale", path, ["o_orderkey"], 8
                )
        finally:
            spark.sql("DROP TABLE IF EXISTS b_stale")

    def test_remote_path_bypass_warns(self, tmp_path):
        """Non-local paths skip the layout inspection — that bypass
        must be LOUD (warning), not silent (r12 advice)."""
        import warnings as _w

        from etl_data_warehouse_spark.sources.bucketing import (
            validate_bucket_layout,
        )

        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            validate_bucket_layout("s3://bucket/prefix", ["k"], 8)
        assert any("NOT verified" in str(r.message) for r in rec)

    def test_ctas_bucketed_sql_surface(self, spark, sf_dir, tmp_path):
        """The SQL CTAS twin must produce the same zero-shuffle layout
        as the DataFrame writer path."""
        from etl_data_warehouse_spark.sources.bucketing import (
            colocated_join,
            ctas_bucketed,
        )

        orders = load_table(spark, "orders", sf_dir)
        orders.createOrReplaceTempView("tmp_orders_src")
        li = load_table(spark, "lineitem", sf_dir)
        li.createOrReplaceTempView("tmp_li_src")
        ctas_bucketed(
            spark,
            "cb_orders",
            "SELECT * FROM tmp_orders_src",
            "o_orderkey",
            8,
            str(tmp_path / "cb_orders"),
        )
        ctas_bucketed(
            spark,
            "cb_lineitem",
            "SELECT l_orderkey AS o_orderkey, l_quantity FROM tmp_li_src",
            "o_orderkey",
            8,
            str(tmp_path / "cb_lineitem"),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = colocated_join(spark, "cb_orders", "cb_lineitem",
                                    "o_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            assert joined.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS cb_orders")
            spark.sql("DROP TABLE IF EXISTS cb_lineitem")


class TestApproxDistinct:
    def test_hll_within_5pct_of_exact(self, spark, sf_dir):
        """approx_count_distinct (HLL++) — the at-scale COUNT(DISTINCT)
        path; accuracy bound asserted against the exact count."""
        orders = load_table(spark, "orders", sf_dir)
        row = orders.agg(
            F.countDistinct("o_custkey").alias("exact"),
            F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
        ).first()
        assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


class TestTemporalJoins:
    def test_range_join_avoids_nested_loop(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.registry import QUERIES

        plan = (
            QUERIES["q38_range_join"](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the whole point of the bucket trick: hash join, not O(n*m)
        assert "BroadcastNestedLoopJoin" not in plan

    def test_asof_forward_direction(self, spark):
        import datetime

        from etl_data_warehouse_spark.operators.temporal import asof_join

        ts = datetime.datetime
        left = spark.createDataFrame(
            [(1, 100, ts(2024, 1, 5))], "id long, k long, t timestamp"
        )
        right = spark.createDataFrame(
            [
                (100, ts(2024, 1, 1), "past"),
                (100, ts(2024, 1, 7), "near_future"),
                (100, ts(2024, 1, 20), "far_future"),
            ],
            "k2 long, t2 timestamp, tag string",
        )
        fwd = asof_join(
            left, right, "k", "k2", "t", "t2", "id", direction="forward"
        ).collect()
        assert len(fwd) == 1 and fwd[0]["tag"] == "near_future"
        back = asof_join(
            left, right, "k", "k2", "t", "t2", "id", direction="backward"
        ).collect()
        assert len(back) == 1 and back[0]["tag"] == "past"


class TestTwsSessions:
    """transformWithStateInPandas twin (Spark 4 StatefulProcessor +
    RocksDB store) must carry state across batches and agree with both
    the applyInPandasWithState operator and the batch sessionizer.
    Skipped (except the gate test) when protobuf is absent — the
    pyspark state-server protocol requires it (see tws_sessions)."""

    def test_gate_raises_clearly_without_protobuf(self, spark, tmp_path):
        from etl_data_warehouse_spark.streaming.tws_sessions import (
            start_tws_session_stream,
            tws_available,
        )

        if tws_available():
            pytest.skip("protobuf present; gate not exercisable")
        with pytest.raises(ImportError, match="protobuf"):
            start_tws_session_stream(
                spark, str(tmp_path), str(tmp_path / "o"), str(tmp_path / "c")
            )

    def test_processor_pickles_by_value(self):
        """The worker unpickles the processor WITHOUT this repo on its
        sys.path — the class must serialize by value (local class), not
        by reference to etl_data_warehouse_spark."""
        import pickle

        from etl_data_warehouse_spark.streaming.tws_sessions import (
            make_session_processor,
        )

        try:
            from pyspark import cloudpickle  # noqa
            dumps = cloudpickle.dumps
        except ImportError:
            from pyspark.serializers import CloudPickleSerializer

            dumps = CloudPickleSerializer().dumps
        blob = dumps(make_session_processor(60000))
        # Round-trip in a subprocess whose sys.path does NOT include
        # this repo — exactly the worker's situation.
        import base64
        import subprocess
        import sys

        code = (
            "import sys; sys.path = [p for p in sys.path if 'repo' not in p];"
            "import base64, pickle;"
            "obj = pickle.loads(base64.b64decode(sys.argv[1]));"
            "print(type(obj).__name__)"
        )
        out = subprocess.run(
            [sys.executable, "-c", code, base64.b64encode(blob).decode()],
            capture_output=True,
            text=True,
            cwd="/tmp",
        )
        assert out.returncode == 0, out.stderr[-500:]
        assert out.stdout.strip() == "SessionProcessor"
        del pickle

    def _write(self, spark, d, rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(d)

    def test_state_carries_across_microbatches(self, spark, tmp_path):
        pytest.importorskip("google.protobuf")
        from etl_data_warehouse_spark.streaming.tws_sessions import (
            start_tws_session_stream,
        )

        ts = datetime.datetime
        input_dir, out, ckpt = (
            str(tmp_path / "tin"),
            str(tmp_path / "tout"),
            str(tmp_path / "tck"),
        )
        os.makedirs(input_dir)
        self._write(
            spark,
            input_dir,
            [(1, ts(2024, 1, 1, 10, 0)), (1, ts(2024, 1, 1, 10, 10))],
        )
        q = start_tws_session_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 1 and rows[0]["n_events"] == 2
        self._write(
            spark,
            input_dir,
            [(1, ts(2024, 1, 1, 10, 20)), (1, ts(2024, 1, 1, 12, 0))],
        )
        q2 = start_tws_session_stream(spark, input_dir, out, ckpt)
        q2.awaitTermination(120)
        rows = {
            r["session_idx"]: r for r in spark.read.parquet(out).collect()
        }
        assert len(rows) == 2
        assert rows[1]["n_events"] == 3  # extended across the restart
        assert rows[2]["n_events"] == 1

    def test_matches_applyinpandas_twin(self, spark, tmp_path):
        pytest.importorskip("google.protobuf")
        from etl_data_warehouse_spark.streaming.tws_sessions import (
            start_tws_session_stream,
        )

        ts = datetime.datetime
        events = [
            (u, ts(2024, 1, 1, 8) + datetime.timedelta(minutes=13 * i))
            for u in (1, 2, 3)
            for i in range(15)
        ]
        base = {
            "in": str(tmp_path / "ain"),
            "out_a": str(tmp_path / "aout"),
            "ck_a": str(tmp_path / "ack"),
            "out_t": str(tmp_path / "tout2"),
            "ck_t": str(tmp_path / "tck2"),
        }
        os.makedirs(base["in"])
        self._write(spark, base["in"], events)
        qa = start_session_stream(spark, base["in"], base["out_a"], base["ck_a"])
        qa.awaitTermination(120)
        qt = start_tws_session_stream(
            spark, base["in"], base["out_t"], base["ck_t"]
        )
        qt.awaitTermination(120)
        a = sorted(
            tuple(r) for r in spark.read.parquet(base["out_a"]).collect()
        )
        t = sorted(
            tuple(r) for r in spark.read.parquet(base["out_t"]).collect()
        )
        assert a == t and a
