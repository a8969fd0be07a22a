"""Event-stream operators: gap-based sessionization + time rollups.

The sessionizer is the batch twin of a stateful streaming session
window: a new session starts when the gap to the previous event of the
same user exceeds the timeout. One shuffle on user_id; the running SUM
over the new-session flags assigns session indexes without any
iterative driver logic.

100 TB posture: partition by user_id (high cardinality → even spread);
window state is per-user and streams through the sort — no skew unless
one user dominates (then: salt by session-day first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec

SESSION_GAP_MS = 30 * 60 * 1000


def sessionize(events: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Per-session rollup: (user_id, session_idx, n_events, n_purchases,
    session_start_ms, session_end_ms, duration_secs)."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.withColumn("ts_ms", F.unix_millis("ts")).withColumn(
        "new_session",
        F.when(
            F.lag("ts_ms").over(w_user).isNull()
            | ((F.col("ts_ms") - F.lag("ts_ms").over(w_user)) > gap_ms),
            1,
        ).otherwise(0),
    )
    with_idx = flagged.withColumn(
        "session_idx", F.sum("new_session").over(w_run).cast("int")
    )
    return (
        with_idx.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
            F.min("ts_ms").alias("session_start_ms"),
            F.max("ts_ms").alias("session_end_ms"),
        )
        .withColumn(
            "duration_secs",
            (F.col("session_end_ms") - F.col("session_start_ms")) / F.lit(1000.0),
        )
    )  # no final sort (the q10 rule, r13): the session rollup is
    # user_id-partitioned end-to-end (window -> groupBy, one Exchange);
    # a global presentation sort added a rangepartitioning Exchange of
    # the whole session table for an order-insensitive compare


def daily_event_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-day rollup per event type (batch twin of the streaming
    windowed aggregation; value summed in exact decimal)."""
    return (
        events.groupBy(
            F.to_date("ts").alias("event_date"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(dec("value", 6)).cast("double").alias("sum_value"),
            (
                F.sum(dec("value", 6)).cast("double")
                / F.count("value").cast("double")
            ).alias("avg_value"),
        )
        .orderBy("event_date", "event_type")
    )


def extract_props_key(events: DataFrame, key: str = "k") -> DataFrame:
    """Pull an integer key out of the JSON-ish props string with a regex
    (portable to the oracle; at scale prefer from_json with a schema)."""
    pattern = f'"{key}": ([0-9]+)'
    val = F.when(
        F.col("props").rlike(pattern),
        F.regexp_extract("props", pattern, 1).cast("int"),
    )
    return events.select(
        "event_id",
        "event_type",
        val.alias(f"{key}_value"),
    ).orderBy("event_id")
