"""Streaming sketch-panel materializer: maintain the persisted
HLL/count-min/qhist day-grain panel (operators/sketch_store.py) from
an event stream — real-time approximate distinct/frequency/quantile
rollups whose marginal cost is O(microbatch), never O(history).

    readStream(events dir)
      → foreachBatch: append_sketch_batch(batch, store, batch_id=N+1)

This is the SIMPLEST member of the streaming persisted-state family
(ann_stream / neardup_stream / cdc_stream) because sketch state needs
no identity guard at all: every panel write is a per-batch OVERWRITE
of deterministic content, and the file source's checkpoint assigns
each input file to exactly one batch id — a crashed batch is replayed
with the same id and rewrites byte-identical partitions, so drained
state always equals the one-shot batch build (TestSketchStream pins
the bit-for-bit equality). Re-delivery of the same EVENTS under a new
file (a feed bug upstream of the checkpoint) inflates the counting
sketches exactly as documented in sketch_store — the HLL table alone
is immune.

batch=0 is the batch-bootstrap slot (build_sketch_store on any
pre-existing history); streamed microbatches take ids from 1.

Reference scope: the reference's analytics are batch-only recomputes
(reference: warehouse/analytics_queries.sql); SURVEY.md §2.9's
streaming-twin rule applied to the sketch panel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.sketch_store import append_sketch_batch

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, input_dir: str, max_files: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def start_sketch_panel_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files: int = 16,
):
    """Start (or drain with AvailableNow) the panel materializer."""

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        append_sketch_batch(batch_df, store_dir, batch_id=int(batch_id) + 1)

    writer = (
        read_event_stream(spark, input_dir, max_files)
        .writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(fold_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
