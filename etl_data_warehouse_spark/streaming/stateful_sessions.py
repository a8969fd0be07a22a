"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState``.

The batch sessionizer (operators/sessionize.py) re-derives sessions from
scratch; this streaming twin carries per-user session state across
micro-batches — the canonical "operator Spark lacks as a built-in"
implemented with the sanctioned stateful-pandas escape hatch
(SURVEY.md §7.6 design rule (b)).

State per user: (last_ts_ms, session_idx, n_events, session_start_ms).
Each micro-batch emits the refreshed row for every session it touched
(update semantics); the downstream foreachBatch sink merge-upserts on
(user_id, session_idx), so late refinements overwrite cleanly.

100 TB posture: state is O(active users), partitioned by user_id; the
pandas function sees one user group per call with Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_idx", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_ms", T.LongType()),
        T.StructField("session_idx", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
    ]
)


def _session_fn(gap_ms: int):
    import pandas as pd

    def fn(key, pdf_iter: Iterable["pd.DataFrame"], state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, idx, n, start = state.get
        else:
            last_ts, idx, n, start = None, 0, 0, None
        touched: dict[int, tuple] = {}
        ts_all = []
        for pdf in pdf_iter:
            ts_all.extend(int(v) for v in pdf["ts_ms"])
        for ts in sorted(ts_all):
            if last_ts is None or ts - last_ts > gap_ms:
                if start is not None:
                    touched[idx] = (user_id, idx, n, start, last_ts)
                idx += 1
                start, n = ts, 0
            n += 1
            last_ts = ts
        if start is not None:
            touched[idx] = (user_id, idx, n, start, last_ts)
        state.update((last_ts, idx, n, start))
        if touched:
            yield pd.DataFrame(
                list(touched.values()),
                columns=[
                    "user_id",
                    "session_idx",
                    "n_events",
                    "session_start_ms",
                    "session_end_ms",
                ],
            )

    return fn


def stateful_sessionize(
    events: DataFrame, gap_ms: int = SESSION_GAP_MS
) -> DataFrame:
    """events: streaming DataFrame with (user_id long, ts timestamp)."""
    prepared = events.select(
        "user_id", F.unix_millis("ts").alias("ts_ms")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_session_stream(
    spark,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    schema: str = "user_id long, ts timestamp",
    gap_ms: int = SESSION_GAP_MS,
):
    """File-source stream → stateful sessions → merge-upsert sink."""
    from ..sources.sinks import merge_upsert

    stream = spark.readStream.schema(schema).parquet(input_dir)
    sessions = stateful_sessionize(stream, gap_ms)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df.sparkSession,
            batch_df,
            output_path,
            keys=["user_id", "session_idx"],
        )

    return (
        sessions.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
