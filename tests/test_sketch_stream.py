"""Streaming sketch-panel materializer (streaming/sketch_stream.py):
a drained stream leaves panel state bit-for-bit equal to the one-shot
batch build over everything ingested, and a re-drain with no new
files changes nothing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.sketch_store import (
    build_sketch_store,
    load_panel,
)
from etl_data_warehouse_spark.sources.catalog import load_table
from etl_data_warehouse_spark.streaming.sketch_stream import (
    start_sketch_panel_stream,
)


def _state_sets(spark, store_dir):
    panel = load_panel(spark, store_dir)
    return {
        "hll": {
            (r["day"], r["hll_idx"]): r["m_j"]
            for r in panel["hll"].collect()
        },
        "cm": {
            (r["day"], r["cm_row"], r["cm_pos"]): r["c"]
            for r in panel["cm"].collect()
        },
        "qhist": {
            (r["day"], r["bucket"]): r["n"]
            for r in panel["qhist"].collect()
        },
    }


class TestSketchStream:
    def test_drained_panel_equals_batch_build(
        self, spark, sf_dir, tmp_path
    ):
        events = load_table(spark, "events", sf_dir)
        history = events.filter(F.col("event_id") % 3 == 0)
        streamed = events.filter(F.col("event_id") % 3 != 0)
        input_dir = str(tmp_path / "in")
        store = str(tmp_path / "panel")
        full = str(tmp_path / "full")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)

        # batch bootstrap (batch=0) on pre-existing history
        build_sketch_store(history, store)
        # two stream slices arrive as separate files
        for pred in [
            F.col("event_id") % 3 == 1,
            F.col("event_id") % 3 == 2,
        ]:
            streamed.filter(pred).coalesce(1).write.mode(
                "append"
            ).parquet(input_dir)

        q = start_sketch_panel_stream(
            spark, input_dir, store, ckpt, max_files=1
        )
        q.awaitTermination(300)

        build_sketch_store(events, full)
        assert _state_sets(spark, store) == _state_sets(spark, full)

        # re-drain with no new files: nothing changes
        q2 = start_sketch_panel_stream(
            spark, input_dir, store, ckpt, max_files=1
        )
        q2.awaitTermination(300)
        assert _state_sets(spark, store) == _state_sets(spark, full)
