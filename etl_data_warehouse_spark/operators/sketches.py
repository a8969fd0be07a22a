"""Mergeable distinct-count sketches (HLL) — the 100 TB COUNT(DISTINCT)
pattern.

Exact COUNT(DISTINCT) requires a full shuffle of every distinct value
per group (Expand + two-phase agg); at petabyte scale the idiomatic
answer is pre-aggregated HyperLogLog sketches: build one small binary
sketch per fine-grained partition (e.g. per day), persist it, and
answer ANY coarser rollup (month, year, total, sliding window) by
merging sketches — no rescan of the fact, no re-shuffle of raw values,
and sketch union is lossless w.r.t. the sketch's own accuracy
(register-wise max), so pre-agg + merge == one-pass sketch on raw data.

Spark exposes Apache DataSketches HLL natively (Spark 3.5+):
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
JVM-side, no UDFs. The reference's analytics use exact COUNT(DISTINCT)
only (reference: warehouse/analytics_queries.sql); this module is the
scale superset; its accuracy and merge-consistency contracts are pinned
in tests (TestHllSketches) rather than the DuckDB oracle because
DataSketches binaries are not reproducible in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 4096 registers, ~1.6% relative standard error

_MILLIS_PER_DAY = 86_400_000


def _utc_day(ts_col: str) -> F.Column:
    """UTC calendar day of a timestamp, independent of the session
    timezone: instant -> epoch millis -> epoch day -> DATE. (``to_date``
    would convert through ``spark.sql.session.timeZone`` and shift
    boundary events on non-UTC drivers — the oracles truncate the UTC
    wall clock.)"""
    return F.date_from_unix_date(
        F.floor(F.unix_millis(F.col(ts_col)) / F.lit(_MILLIS_PER_DAY)).cast(
            "int"
        )
    )


def daily_distinct_sketches(
    events: DataFrame,
    value_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-day HLL sketch of ``value_col`` — the fine-grained
    pre-aggregate a pipeline would persist alongside its daily
    partitions. One shuffle at day grain; map-side partial sketches."""
    return events.groupBy(_utc_day(ts_col).alias("day")).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_distinct(
    sketches: DataFrame, grain_expr: F.Column, grain_name: str = "grain"
) -> DataFrame:
    """Merge per-day sketches to any coarser grain and estimate.
    ``grain_expr`` maps the ``day`` column, e.g.
    ``F.date_trunc('month', F.col('day'))``."""
    return (
        sketches.groupBy(grain_expr.alias(grain_name))
        .agg(
            F.hll_union_agg("sketch").alias("merged"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            grain_name,
            F.hll_sketch_estimate("merged").alias("approx_distinct"),
            "n_rows",
        )
    )


def total_distinct(sketches: DataFrame) -> int:
    """Global distinct estimate from the persisted daily sketches."""
    row = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    ).first()
    return int(row["est"])


# --- Frequent-items (heavy hitters) sketches --------------------------------
# Spark 4.1 ships DataSketches frequent-items as SQL functions:
# approx_top_k(expr, k, maxItemsTracked) for one-shot estimation, and
# the mergeable triple approx_top_k_accumulate / _combine / _estimate
# for the pre-aggregate-then-rollup pattern (same shape as the HLL
# rows above). Guarantee: with maxItemsTracked M, every item with
# count > n/M is reported and counts are within n/M of exact — so for
# a bounded-cardinality column (event_type, lang, source, status) a
# modest M makes the sketch EXACT. Like HLL, the binary state is not
# DuckDB-reproducible, so contracts are test-pinned.


def daily_topk_sketches(
    events: DataFrame,
    value_col: str = "event_type",
    ts_col: str = "ts",
    max_items: int = 1024,
) -> DataFrame:
    """Per-day frequent-items sketch of ``value_col`` — persist next to
    the daily partitions; one shuffle at day grain, map-side partials."""
    return events.groupBy(_utc_day(ts_col).alias("day")).agg(
        F.expr(
            f"approx_top_k_accumulate({value_col}, {max_items})"
        ).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_topk(
    sketches: DataFrame,
    grain_expr: F.Column,
    k: int,
    grain_name: str = "grain",
    max_items: int = 1024,
) -> DataFrame:
    """Merge per-day sketches to a coarser grain and report top-k
    ``(item, count)`` structs per grain — no rescan of the raw fact."""
    return (
        sketches.groupBy(grain_expr.alias(grain_name))
        .agg(
            F.expr(f"approx_top_k_combine(sketch, {max_items})").alias(
                "merged"
            ),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            grain_name,
            F.expr(f"approx_top_k_estimate(merged, {k})").alias("top_k"),
            "n_rows",
        )
    )


def global_topk(sketches: DataFrame, k: int, max_items: int = 1024) -> list:
    """Global heavy hitters from the persisted daily sketches."""
    row = sketches.agg(
        F.expr(
            f"approx_top_k_estimate(approx_top_k_combine(sketch,"
            f" {max_items}), {k})"
        ).alias("top")
    ).first()
    return list(row["top"])


# --- Portable register-level HLL (cross-engine hash-exact) -------------------
# The DataSketches paths above are the production sketches, but their
# binary state is not reproducible outside the JVM, so their evidence
# is test-pinned. This family implements the HLL register math
# DIRECTLY (Flajolet et al. 2007): md5-derived 60-bit hash, p register
# bits, rho = leading-zero rank of the remaining 52-bit window,
# register = MAX(rho) — every step integer/bit arithmetic that DuckDB
# reproduces token-for-token, so the ORACLE GATE can hash-check a
# sketch end-to-end (q132). The harmonic-mean denominator is kept as
# an EXACT BIGINT (sum of 2^(53-M_j), max 256*2^53 < 2^62); the only
# float op is one literal/BIGINT divide at the output boundary.
# Register tables are mergeable by register-wise MAX — union == merge
# is pinned by TestPortableHll, the same contract the DataSketches
# rollups rely on.

HLL_P = 8  # 256 registers; RSE ~ 1.04/sqrt(256) = 6.5%
_HLL_M = 1 << HLL_P
_HLL_WINDOW = 60 - HLL_P  # md5-derived 60-bit hash minus register bits
_HLL_RHO_MAX = _HLL_WINDOW + 1
# alpha_m * m^2 * 2^(window+1), folded to ONE double literal so both
# engines parse the identical shortest-repr decimal and perform the
# identical single IEEE divide by the exact BIGINT denominator.
HLL_EST_NUMERATOR = (
    0.7213 / (1.0 + 1.079 / float(_HLL_M))
    * float(_HLL_M) * float(_HLL_M) * float(1 << _HLL_RHO_MAX)
)


def hll_register_cols(key, salt: str = "hll") -> tuple[F.Column, F.Column]:
    """(register index, rho) for a key column — the per-row HLL
    primitives. 60-bit hash from the first 15 md5 hex digits (fits a
    signed BIGINT; DuckDB twin: ``('0x' || substring(md5(...), 1,
    15))::BIGINT``); low p bits pick the register (``h & (m-1)``), the
    remaining window's leading-zero rank is ``rho`` via bit_length
    (``length(bin(w))``) — identical operators in both engines."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    idx = h.bitwiseAND(F.lit(_HLL_M - 1)).cast("int").alias("hll_idx")
    w = F.shiftright(h, HLL_P)
    rho = (
        F.when(w == 0, F.lit(_HLL_RHO_MAX))
        .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin(w)))
        .cast("int")
        .alias("hll_rho")
    )
    return idx, rho


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group register table (group_cols..., hll_idx, m_j) — the
    persistable, mergeable sketch state. One shuffle at
    (group, register) grain with map-side partial MAX."""
    idx, rho = hll_register_cols(value_col)
    return (
        df.select(*group_cols, idx, rho)
        .groupBy(*group_cols, "hll_idx")
        .agg(F.max("hll_rho").alias("m_j"))
    )


def hll_merge_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union sketches by register-wise MAX (drop grouping levels from
    finer to coarser) — lossless w.r.t. the sketch's own accuracy."""
    return regs.groupBy(*group_cols, "hll_idx").agg(
        F.max("m_j").alias("m_j")
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Distinct estimate per group from a register table. The harmonic
    denominator is EXACT: absent registers (M_j = 0) contribute
    2^rho_max each via the closed-form ``(m - hit) << rho_max``
    correction, so the sketch never materializes empty registers."""
    return (
        regs.groupBy(*group_cols)
        .agg(
            # pyspark's shiftleft() only takes an int shift; the SQL
            # function accepts a column expression
            F.sum(
                F.expr(f"shiftleft(1L, {_HLL_RHO_MAX} - m_j)")
            ).alias("s_present"),
            F.count(F.lit(1)).cast("int").alias("n_registers_hit"),
        )
        .select(
            *group_cols,
            "n_registers_hit",
            (
                F.col("s_present")
                + (F.lit(_HLL_M) - F.col("n_registers_hit")).cast("long")
                * F.lit(1 << _HLL_RHO_MAX).cast("long")
            ).alias("sketch_sum"),
        )
        .select(
            *group_cols,
            "n_registers_hit",
            "sketch_sum",
            (
                F.lit(HLL_EST_NUMERATOR)
                / F.col("sketch_sum").cast("double")
            ).alias("hll_estimate"),
        )
    )
