"""Streaming twin of q67's NATIVE session_window aggregation.

q67 proves Spark's built-in ``session_window`` in batch against a
plain-SQL oracle; this module runs the SAME operator as a Structured
Streaming query — the engine manages per-user session state, merges
sessions across microbatches, and finalizes a session only once the
event-time watermark passes ``session_end + gap`` (append mode).

Parity with the reference (SURVEY.md §2.9): the reference has no
streaming engine at all — its sessionization is a batch pandas groupby
(reference: transformers/data_transformer.py) — so this is the
Spark-first superset: identical session semantics, incremental
execution, bounded state.

100 TB posture: one shuffle keyed on user_id; state is per-OPEN-session
per user and is evicted at watermark, so state size tracks active users
in the gap horizon, not history. Late events inside the watermark merge
into (or bridge!) existing sessions — the engine handles the re-merge
that a hand-rolled foreachBatch sessionizer gets wrong.

Emission caveat baked into the API: append-mode session aggregates emit
only FINALIZED sessions. A drained ``availableNow`` run therefore holds
back sessions newer than ``max(ts) - watermark``; they emit on the next
run once later data (or a heartbeat event) advances the watermark. The
test drives exactly that two-run sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def session_window_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Native session_window rollup, schema-identical to the batch q67
    (half-open [start, last+gap) sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.min("ts")) / F.lit(1000)).cast("long")
            .alias("session_start_ms"),
            (F.unix_micros(F.max("ts")) / F.lit(1000)).cast("long")
            .alias("session_end_ms"),
        )
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
    )


def start_session_window_stream(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_files: int = 16,
):
    """Drain the events directory with AvailableNow, appending finalized
    sessions to a parquet sink. Re-runnable: the checkpoint carries both
    source offsets and open-session state across runs."""
    events = (
        spark.readStream.schema(SESSION_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )
    return (
        session_window_aggregate(events, gap=gap, watermark=watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
