"""Incremental (high-watermark) extraction with persisted state.

The reference threads ``last_extracted_date`` into each extractor's
WHERE clause but never persists it (Airflow passes None → full extract
daily; reference: extractors/postgres_extractor.py:40-49,
airflow/dags/etl_daily_pipeline.py:83). This module persists the
watermark (tiny JSON per source) and filters on read — the filter is a
pushed-down Parquet/JDBC predicate, so incremental batch reads scan only
new row groups. Structured Streaming (streaming/) is the idiomatic twin.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.catalog import load_table


class WatermarkStore:
    """Per-source high-watermark state (replaces Airflow XCom state)."""

    def __init__(self, path: str):
        self.path = path

    def _read(self) -> dict[str, Any]:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {}

    def get(self, source: str) -> str | None:
        return self._read().get(source)

    def set(self, source: str, value: str) -> None:
        state = self._read()
        state[source] = value
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)


def incremental_extract(
    spark: SparkSession,
    table: str,
    ts_col: str,
    store: WatermarkStore,
    sf_dir: str,
    advance: bool = False,
) -> DataFrame:
    """Read only rows with ts_col strictly after the stored watermark
    (reference semantics: ``> last_extracted_date``). The predicate
    pushes into the scan.

    The watermark is NOT advanced here by default: advancing at extract
    time means a downstream sink failure permanently skips the batch on
    the next run (the ``> watermark`` predicate filters it out — silent
    data loss). Call :func:`commit_watermark` AFTER the sink succeeds
    for at-least-once semantics. ``advance=True`` opts into the eager
    at-most-once behaviour for fire-and-forget extracts.
    """
    wm = store.get(table)
    predicate: Column | None = (
        F.col(ts_col) > F.lit(wm).cast("timestamp") if wm else None
    )
    df = load_table(spark, table, sf_dir, predicate=predicate)
    if advance:
        commit_watermark(df, table, ts_col, store)
    return df


def commit_watermark(
    batch: DataFrame, table: str, ts_col: str, store: WatermarkStore
) -> str | None:
    """Durably advance ``table``'s watermark to ``max(ts_col)`` of the
    extracted batch — the caller invokes this only after its sink has
    committed, so a failed write leaves the watermark untouched and the
    batch is re-extracted on the next run (at-least-once; pair with an
    idempotent sink like merge_upsert / append_dedup for exactly-once).
    Returns the new watermark, or None for an empty batch (no-op)."""
    new_max = batch.agg(F.max(ts_col)).first()[0]
    if new_max is None:
        return None
    store.set(table, str(new_max))
    return str(new_max)
