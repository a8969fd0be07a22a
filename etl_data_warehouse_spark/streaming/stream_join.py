"""Stream-stream interval join: correlate two live event feeds inside
a bounded time window (view → click attribution, the canonical
two-stream shape).

The missing member of the streaming family next to stream-STATIC
enrichment (enriched_stream.py): here BOTH sides are unbounded, so
Spark must buffer each side in state until the other side's watermark
proves no more matches can arrive. The interval condition
(``click.ts BETWEEN view.ts AND view.ts + horizon``) plus watermarks
on BOTH sides is exactly what lets the engine evict state — an
unconstrained stream-stream equi join would hold both streams forever.

100 TB posture: state is bounded by rate × (watermark + horizon) per
side, keyed by user_id in the state store; output is append-mode
(a joined pair is final once emitted). The reference joins these
feeds only in batch SQL (warehouse/analytics_queries.sql event CTEs);
this is the SURVEY §2.9 streaming-twin rule applied to correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .event_dedup_stream import EVENT_SCHEMA


def read_typed_event_stream(
    spark: SparkSession,
    input_dir: str,
    event_type: str,
    prefix: str,
    max_files: int = 16,
) -> DataFrame:
    """One side of the join: a filtered, column-prefixed event feed."""
    s = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
        .filter(F.col("event_type") == event_type)
    )
    return s.select(
        F.col("event_id").alias(f"{prefix}_event_id"),
        F.col("ts").alias(f"{prefix}_ts"),
        F.col("user_id").alias(f"{prefix}_user_id"),
        F.col("value").alias(f"{prefix}_value"),
    )


def view_click_join(
    views: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Clicks attributed to a same-user view within ``horizon``.

    Both sides carry a watermark and the join condition bounds
    click_ts relative to view_ts — the two ingredients state eviction
    needs. Works identically on batch DataFrames (the twin the test
    compares against)."""
    v = views.withWatermark("v_ts", watermark)
    c = clicks.withWatermark("c_ts", watermark)
    cond = (
        (F.col("v_user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(c, cond).select(
        "v_user_id",
        "v_event_id",
        "c_event_id",
        "v_ts",
        "c_ts",
        (F.unix_millis("c_ts") - F.unix_millis("v_ts")).alias("lag_ms"),
    )


def start_view_click_stream(
    spark: SparkSession,
    views_dir: str,
    clicks_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
    max_files: int = 16,
    state_partitions: int | None = None,
):
    """Start (or drain with AvailableNow) the attribution join into a
    parquet sink (append — each attributed pair is emitted once).

    ``state_partitions`` sizes the stateful operator's shuffle/state
    partition count for THIS query (it sets spark.sql.shuffle.partitions
    on the session before start — Spark captures the value in the new
    checkpoint's offset log, so it binds to the query, and the previous
    session value is restored after start). Sizing rule: state rows per
    side ≈ rate × (watermark + horizon); pick partitions so each state
    store holds ~10^5-10^6 rows. Every microbatch pays O(partitions)
    fixed state-store maintenance (file commits + snapshots) per
    stateful operator REGARDLESS of data, so a count sized for peak
    cluster throughput is pure overhead on a small feed — this knob is
    production sizing, not a local tweak; the default (None) keeps the
    session's setting. A RESUMED checkpoint keeps its original count
    (Spark pins it in the offset log) — changing this knob only affects
    fresh checkpoints."""
    joined = view_click_join(
        read_typed_event_stream(spark, views_dir, "view", "v", max_files),
        read_typed_event_stream(spark, clicks_dir, "click", "c", max_files),
        horizon=horizon,
        watermark=watermark,
    )
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            return _start(joined, output_dir, checkpoint_dir, available_now)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return _start(joined, output_dir, checkpoint_dir, available_now)


def _start(joined: DataFrame, output_dir: str, checkpoint_dir: str,
           available_now: bool):
    # streaming queries run on a session CLONED inside .start(), so a
    # caller-side conf restore after start() cannot race the stream
    writer = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
