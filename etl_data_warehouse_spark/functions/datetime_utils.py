"""Calendar attribute expressions with one pinned convention.

The reference is internally inconsistent about day-of-week (pandas
0=Monday at transformers/data_transformer.py:67; Postgres EXTRACT(DOW)
0=Sunday at dbt stg_orders.sql:17). We standardize on the convention
that actually populates the reference's dim_date — Python
``weekday()``, 0=Monday (reference: loaders/warehouse_loader.py:194-204)
— and expose it as ``weekday0``; ``is_weekend`` = weekday0 >= 5
(Sat/Sun). DuckDB oracle twin: ``isodow(d) - 1``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def date_key(col: Column | str) -> Column:
    """Smart integer key YYYYMMDD (reference: etl_daily_pipeline.py:211-212)."""
    return F.date_format(_c(col), "yyyyMMdd").cast("int")


def day_name(col: Column | str) -> Column:
    """Full English day name, e.g. 'Monday' (≡ DuckDB dayname)."""
    return F.date_format(_c(col), "EEEE")


def month_name(col: Column | str) -> Column:
    """Full English month name, e.g. 'January' (≡ DuckDB monthname)."""
    return F.date_format(_c(col), "MMMM")


def weekday0(col: Column | str) -> Column:
    """0=Monday .. 6=Sunday (Spark dayofweek is 1=Sunday; shift)."""
    return ((F.dayofweek(_c(col)) + 5) % 7).cast("int")


def is_weekend(col: Column | str) -> Column:
    """Saturday or Sunday (reference: warehouse_loader.py:204)."""
    return weekday0(col) >= 5
