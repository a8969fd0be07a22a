"""Stream-stream interval join (streaming/stream_join.py): the drained
two-stream attribution join equals the batch interval join over the
same data, and re-delivery emits nothing new."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.sources.catalog import load_table
from etl_data_warehouse_spark.streaming.stream_join import (
    start_view_click_stream,
)


class TestStreamStreamJoin:
    def test_drained_join_equals_batch_interval_join(
        self, spark, sf_dir, tmp_path
    ):
        events = load_table(spark, "events", sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        views_dir = str(tmp_path / "views")
        clicks_dir = str(tmp_path / "clicks")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(views_dir)
        os.makedirs(clicks_dir)

        # two files per side so the join must match ACROSS microbatches
        for pred in [F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1]:
            events.filter(pred).coalesce(1).write.mode("append").parquet(
                views_dir
            )
            events.filter(pred).coalesce(1).write.mode("append").parquet(
                clicks_dir
            )

        q = start_view_click_stream(
            spark, views_dir, clicks_dir, out, ckpt,
            horizon="1 hour", watermark="3650 days", max_files=1,
        )
        q.awaitTermination(300)

        got = {
            (r["v_event_id"], r["c_event_id"], r["lag_ms"])
            for r in spark.read.parquet(out).collect()
        }

        v = events.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("v_event_id"),
            F.col("ts").alias("v_ts"),
            F.col("user_id").alias("v_user_id"),
        )
        c = events.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("c_event_id"),
            F.col("ts").alias("c_ts"),
            F.col("user_id").alias("c_user_id"),
        )
        want = {
            (r["v_event_id"], r["c_event_id"], r["lag_ms"])
            for r in v.join(
                c,
                (F.col("v_user_id") == F.col("c_user_id"))
                & (F.col("c_ts") >= F.col("v_ts"))
                & (
                    F.col("c_ts")
                    <= F.col("v_ts") + F.expr("INTERVAL 1 hour")
                ),
            )
            .select(
                "v_event_id",
                "c_event_id",
                (F.unix_millis("c_ts") - F.unix_millis("v_ts")).alias(
                    "lag_ms"
                ),
            )
            .collect()
        }
        assert got == want
        assert got  # the corpus must actually produce attributions

        # drained stream re-run: nothing new
        q2 = start_view_click_stream(
            spark, views_dir, clicks_dir, out, ckpt,
            horizon="1 hour", watermark="3650 days", max_files=1,
        )
        q2.awaitTermination(300)
        assert len(spark.read.parquet(out).collect()) == len(got)
