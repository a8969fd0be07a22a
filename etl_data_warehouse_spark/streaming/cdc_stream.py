"""Streaming CDC apply: fold a change stream into materialized state.

Streaming twin of ``operators/cdc.py``: ``readStream`` over a
changelog directory, ``foreachBatch`` compaction — each microbatch is
net-effected locally (``apply_changelog``: last writer per key within
the batch) and then merged onto the persisted snapshot
(``merge_changelog``: cross-batch last-writer-wins by the same seq
columns, tombstones delete). The reference's loaders implement only
the insert/update half of this on full snapshots
(reference: loaders/warehouse_loader.py:63-69, 124-128).

Exactly-once effectiveness: the snapshot merge is idempotent — replaying
a microbatch reproduces the same state because ordering is by the
changelog's OWN seq columns (retained in the snapshot), not arrival
time. Run with AvailableNow for the reference's batch cadence.

100 TB posture: per microbatch ONE shuffle on the key (the fold
window) + a snapshot-sized co-partitioned merge; with a partitioned
snapshot the merge drops to O(touched partitions) exactly like
``merge_upsert_partitioned`` (sources/sinks.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.cdc import apply_changelog, merge_changelog

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("change_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("op", T.StringType()),
    ]
)

KEY_COLS = ["key"]
SEQ_COLS = ["ts", "change_id"]


def read_change_stream(
    spark: SparkSession, input_dir: str, max_files: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def _read_snapshot(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def read_cdc_state(spark: SparkSession, snapshot_path: str) -> DataFrame:
    """Current live state: the persisted snapshot minus tombstones."""
    from ..operators.cdc import DELETE_OP

    snap = spark.read.parquet(snapshot_path)
    return snap.filter(F.col("op") != DELETE_OP).drop("op")


def start_cdc_stream(
    spark: SparkSession,
    input_dir: str,
    snapshot_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (or drain with AvailableNow) the CDC materializer."""

    def compact_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # Net-effect the batch first (one tombstone-retaining row per
        # touched key), then merge onto the snapshot. Tombstones stay
        # IN the snapshot so late out-of-order upserts cannot resurrect
        # deleted keys; read_cdc_state filters them out.
        net = apply_changelog(
            batch_df, KEY_COLS, SEQ_COLS, keep_tombstones=True
        ).drop("n_changes")
        snapshot = _read_snapshot(sess, snapshot_path)
        if snapshot is None:
            state = net
        else:
            state = merge_changelog(
                snapshot, net, KEY_COLS, SEQ_COLS, keep_tombstones=True
            ).drop("n_changes")
        # Materialize before overwrite (the snapshot read feeds the plan).
        state.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            snapshot_path
        )

    writer = (
        read_change_stream(spark, input_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(compact_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
