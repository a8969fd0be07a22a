"""Streaming session_window twin (streaming/session_window_stream.py).

Proves the streaming operator emits EXACTLY the batch q67 sessions for
all watermark-finalized data, across multiple availableNow runs that
share one checkpoint (state + offsets carried between runs). Heartbeat
events drive the watermark forward so every real session finalizes —
the documented production pattern for draining append-mode session
aggregates."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.streaming.session_window_stream import (
    session_window_aggregate,
    start_session_window_stream,
)

TS = datetime.datetime


def _write(spark, d, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(d)


class TestSessionWindowStream:
    def test_matches_batch_native_session_window(self, spark, tmp_path):
        input_dir = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ck")
        os.makedirs(input_dir)

        # per user: session A (3 events, 10-min spacing), 100-min gap,
        # session B (2 events) — gap=30min splits them
        base = TS(2024, 1, 1, 0, 0)
        events = [
            (u, base + datetime.timedelta(minutes=m))
            for u in (1, 2, 3)
            for m in (0, 10, 20, 120, 130)
        ]
        _write(spark, input_dir, events)
        q = start_session_window_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)

        # heartbeat run 1: advances watermark past session A+gap
        _write(spark, input_dir, [(999, TS(2024, 1, 2, 0, 0))])
        q = start_session_window_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)
        # heartbeat run 2: finalizes session B (and emits it)
        _write(spark, input_dir, [(999, TS(2024, 1, 3, 0, 0))])
        q = start_session_window_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)

        streamed = {
            (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
            for r in spark.read.parquet(out)
            .filter(F.col("user_id") != 999)
            .collect()
        }

        batch_df = spark.createDataFrame(events, "user_id long, ts timestamp")
        batched = {
            (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
            for r in session_window_aggregate(batch_df)
            .collect()  # batch mode ignores the watermark: all sessions
        }
        assert streamed == batched
        assert len(batched) == 6  # 3 users x 2 sessions

    def test_late_event_merges_into_open_session(self, spark, tmp_path):
        """An in-watermark late event must extend the session the engine
        still holds open — the re-merge a foreachBatch hand-rolled
        sessionizer cannot do."""
        input_dir = str(tmp_path / "in2")
        out = str(tmp_path / "out2")
        ckpt = str(tmp_path / "ck2")
        os.makedirs(input_dir)

        _write(spark, input_dir, [(1, TS(2024, 1, 1, 0, 0))])
        q = start_session_window_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)
        # late-but-in-watermark event 10 min after the first
        _write(spark, input_dir, [(1, TS(2024, 1, 1, 0, 10))])
        q = start_session_window_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)
        # heartbeats to finalize
        _write(spark, input_dir, [(999, TS(2024, 1, 2, 0, 0))])
        q = start_session_window_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)
        _write(spark, input_dir, [(999, TS(2024, 1, 3, 0, 0))])
        q = start_session_window_stream(spark, input_dir, out, ckpt)
        q.awaitTermination(120)

        rows = (
            spark.read.parquet(out).filter(F.col("user_id") == 1).collect()
        )
        assert len(rows) == 1 and rows[0]["n_events"] == 2
