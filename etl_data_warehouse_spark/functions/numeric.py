"""Engine-portable exact numeric aggregation.

Money lives in DOUBLE columns in the test Parquet but the reference's
warehouse declares DECIMAL(12,2)/(15,2)
(reference: warehouse/target_schema.sql:64-65, 74-78). Summing doubles
is order-dependent (floating addition is not associative), which breaks
both (a) determinism across shuffles at scale and (b) hash-equality
with the DuckDB oracle. Policy (SURVEY.md §4.3, §7.3):

- cast money to DECIMAL(18,2) at the aggregation input → SUM is exact
  and order-insensitive in every engine;
- cast the exact sum to DOUBLE at the output boundary (deterministic);
- AVG is always expressed as exact-decimal-SUM / COUNT in DOUBLE, never
  the engine's native decimal AVG (engines disagree on result scale).
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2) -> Column:
    """Cast a money/measure column to exact DECIMAL(18, scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive SUM: exact decimal accumulate, double out."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic AVG = exact decimal SUM / COUNT, both cast double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c).cast("double")


def wsum_over(col: Column | str, w: WindowSpec, scale: int = 2) -> Column:
    """Windowed order-insensitive SUM (exact decimal inside the frame)."""
    return F.sum(dec(col, scale)).over(w).cast("double")


def wavg_over(col: Column | str, w: WindowSpec, scale: int = 2) -> Column:
    """Windowed deterministic AVG = exact frame SUM / frame COUNT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).over(w).cast("double") / F.count(c).over(w).cast(
        "double"
    )
