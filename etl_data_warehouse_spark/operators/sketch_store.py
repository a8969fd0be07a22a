"""Persisted mergeable sketch panel — the 100 TB "sketch cube".

The portable-sketch family (sketches.py: HLL registers / count-min
cells / quantile-histogram buckets) all share one algebraic property:
state at a fine grain MERGES losslessly to any coarser grain (MAX for
registers, SUM for counters and bucket counts). This module persists
that state per day and maintains it incrementally, completing the
persisted-state family (LSH index: dedup_index; ANN index: ann_index;
CDC snapshot: cdc_stream; unigram LM: lm_model) for the three
approximate-analytics workhorses:

- distinct users per day/month/total     -> HLL registers
- per-key event frequency at any grain   -> count-min cells
- event-value quantiles at any grain     -> qhist buckets

At 100 TB the point is that the raw fact is scanned ONCE per ingest
slice; every later rollup question (any grain, any probe set) is
answered from the panel, whose size is bounded by
days * (256 registers + d*w counters + ~64 buckets) — independent of
row count — and small enough to broadcast.

Layout at store_dir/ (the lm_model log-structured protocol):
- ``hll/batch=N/``   (day, hll_idx, m_j)
- ``cm/batch=N/``    (day, cm_row, cm_pos, c)
- ``qhist/batch=N/`` (day, bucket, n)

Per-batch OVERWRITE partitions: a replayed batch rewrites identical
bytes (builds are deterministic), so crash/replay never duplicates
state. The merged panel is the register-wise MAX / counter SUM over
batches at load time — append never rewrites old batches, and there
is no read-modify-write window. Caller contract: each event slice
appears in at most one batch_id (slices partition the feed). The HLL
table is additionally IMMUNE to slice re-delivery (register MAX is
idempotent on duplicate values — set semantics); the counting tables
are not, which TestSketchStore pins explicitly.

Reference scope: the reference recomputes its analytics from the full
fact every run (reference: warehouse/analytics_queries.sql,
etl/run_pipeline.py); this is the incremental scale substitute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sketches import (
    CM_D,
    CM_W,
    _utc_day,
    cm_build,
    cm_estimate,
    cm_merge,
    hll_estimate_corrected,
    hll_merge_registers,
    hll_registers,
    qhist_build,
    qhist_merge,
    qhist_quantiles,
)

_PARTS = ("hll", "cm", "qhist")


def _value_units(value_col: str) -> F.Column:
    """events.value (DOUBLE) -> positive BIGINT milli-units for the
    quantile histogram: round half-up at a fixed scale, clamp to >= 1
    (qhist buckets positive integers). Deterministic and
    engine-portable — the same pin-the-grid move as the decimal money
    policy."""
    return F.greatest(
        F.lit(1).cast("long"),
        F.round(F.col(value_col) * 1000).cast("long"),
    )


def _panel_slices(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
) -> dict[str, DataFrame]:
    """The three day-grain state frames for one event slice. One scan
    feeds three grain-bounded shuffles; the cm build explodes on the
    AGGREGATED (day, user) grain, never per raw event."""
    day = _utc_day(ts_col).alias("day")
    hll = hll_registers(events.select(day, user_col), user_col, ["day"])
    per_key = (
        events.select(day, user_col)
        .groupBy("day", user_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    cm = cm_build(per_key, user_col, "n", ["day"])
    qh = qhist_build(
        events.select(day, _value_units(value_col).alias("vu")),
        "vu",
        ["day"],
    )
    return {"hll": hll, "cm": cm, "qhist": qh}


def build_sketch_store(events: DataFrame, store_dir: str) -> None:
    """Build the initial panel (batch 0)."""
    append_sketch_batch(events, store_dir, batch_id=0)


def append_sketch_batch(
    events: DataFrame, store_dir: str, batch_id: int
) -> None:
    """Fold a new event slice into the panel in O(batch): per-batch
    overwrite dirs, no read of prior state, replay rewrites identical
    content."""
    slices = _panel_slices(events)
    for part in _PARTS:
        slices[part].write.mode("overwrite").parquet(
            f"{store_dir}/{part}/batch={batch_id}"
        )


def _load_part(spark: SparkSession, store_dir: str, part: str) -> DataFrame:
    return spark.read.option("basePath", f"{store_dir}/{part}").parquet(
        f"{store_dir}/{part}"
    )


def load_panel(spark: SparkSession, store_dir: str) -> dict[str, DataFrame]:
    """The merged day-grain panel across all batches — register-wise
    MAX / counter SUM, each a (day, ...)-keyed agg over
    panel-sized (not fact-sized) input."""
    return {
        "hll": hll_merge_registers(
            _load_part(spark, store_dir, "hll"), ["day"]
        ),
        "cm": cm_merge(_load_part(spark, store_dir, "cm"), ["day"]),
        "qhist": qhist_merge(
            _load_part(spark, store_dir, "qhist"), ["day"]
        ),
    }


def panel_distinct(
    spark: SparkSession, store_dir: str, grain_expr: F.Column, grain: str
) -> DataFrame:
    """Distinct-user estimate at any grain of ``day`` from the panel
    (e.g. ``F.date_trunc('month', F.col('day'))``) — register-wise MAX
    across days, never a fact rescan; merge == one-pass build
    bit-for-bit (TestSketchStore)."""
    regs = hll_merge_registers(
        load_panel(spark, store_dir)["hll"].select(
            grain_expr.alias(grain), "hll_idx", "m_j"
        ),
        [grain],
    )
    return hll_estimate_corrected(regs, [grain]).orderBy(grain)


def panel_frequency(
    spark: SparkSession,
    store_dir: str,
    probes: DataFrame,
    key_col: str,
) -> DataFrame:
    """Global per-key frequency estimates for a probe frame from the
    panel: day cells summed to one global sketch (d*w cells,
    broadcast), min-over-rows estimate per probe key."""
    state = cm_merge(
        load_panel(spark, store_dir)["cm"].drop("day"), []
    )
    return cm_estimate(probes, key_col, state, w=CM_W, d=CM_D)


def panel_quantiles(
    spark: SparkSession,
    store_dir: str,
    grain_expr: F.Column,
    grain: str,
    qs: list[int],
) -> DataFrame:
    """Value-quantile estimates (milli-units) at any grain of ``day``
    from the panel — bucket counts add across days."""
    hists = qhist_merge(
        load_panel(spark, store_dir)["qhist"].select(
            grain_expr.alias(grain), "bucket", "n"
        ),
        [grain],
    )
    return qhist_quantiles(hists, [grain], qs).orderBy(grain)


def panel_rolling_distinct(
    spark: SparkSession, store_dir: str, window_days: int = 7
) -> DataFrame:
    """Trailing-N-day rolling distinct-user estimate per day, answered
    ENTIRELY from the persisted day-grain registers (q139's in-plan
    shape pointed at state): dense (day x 256) grid, register-wise MAX
    over a rangeBetween day window partitioned by register, small-range
    -corrected estimate. The fact is never rescanned — each window
    placement is algebra on days*256 rows, vs the exact path's
    per-placement re-shuffle of every distinct user."""
    from pyspark.sql import Window

    regs = load_panel(spark, store_dir)["hll"]
    days = regs.select("day").distinct()
    grid = days.select(
        "day",
        F.explode(
            F.sequence(F.lit(0), F.lit(255))
        ).alias("hll_idx"),
    )
    w = (
        Window.partitionBy("hll_idx")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-(window_days - 1), 0)
    )
    rolled = (
        grid.join(regs, ["day", "hll_idx"], "left")
        .select("day", "hll_idx", F.max("m_j").over(w).alias("m_j"))
        .filter(F.col("m_j").isNotNull())
    )
    est = hll_estimate_corrected(rolled, ["day"])
    wd = Window.orderBy(F.unix_date(F.col("day"))).rangeBetween(
        -(window_days - 1), 0
    )
    daysn = days.select(
        "day",
        F.count(F.lit(1)).over(wd).cast("int").alias("n_days_present"),
    )
    return (
        est.join(daysn, "day")
        .select(
            "day",
            "n_days_present",
            "n_registers_hit",
            "sketch_sum",
            "hll_estimate",
        )
        .orderBy("day")
    )
