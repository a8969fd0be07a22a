"""Streaming exact-event dedup (streaming/event_dedup_stream.py):
redelivered events inside the watermark are dropped, the drained feed
equals the batch distinct, and re-running the drained stream emits
nothing new."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.sources.catalog import load_table
from etl_data_warehouse_spark.streaming.event_dedup_stream import (
    start_event_dedup_stream,
)


class TestEventDedupStream:
    def test_redelivery_is_absorbed(self, spark, sf_dir, tmp_path):
        events = load_table(spark, "events", sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        input_dir = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)

        first = events.filter(F.col("event_id") % 2 == 0)
        second = events.filter(F.col("event_id") % 4 != 1)  # re-delivers
        first.coalesce(1).write.mode("append").parquet(input_dir)
        second.coalesce(1).write.mode("append").parquet(input_dir)

        q = start_event_dedup_stream(
            spark, input_dir, out, ckpt, watermark="365 days", max_files=1
        )
        q.awaitTermination(300)

        got = spark.read.parquet(out)
        want_ids = {
            r["event_id"]
            for r in events.filter(
                (F.col("event_id") % 2 == 0) | (F.col("event_id") % 4 != 1)
            ).select("event_id").collect()
        }
        assert {r["event_id"] for r in got.select("event_id").collect()} == want_ids
        assert got.count() == len(want_ids)  # each id exactly once

        # drained stream re-run: nothing new
        q2 = start_event_dedup_stream(
            spark, input_dir, out, ckpt, watermark="365 days", max_files=1
        )
        q2.awaitTermination(300)
        assert spark.read.parquet(out).count() == len(want_ids)
