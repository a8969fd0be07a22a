"""Scalar cleaning expressions (reference: transformers/data_transformer.py).

All are pure Catalyst column expressions — zero Python UDFs
(SURVEY.md §2.10). Each mirrors one cleaning rule of the reference's
pandas transformer with identical semantics on its defect fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_status(col: Column | str) -> Column:
    """UPPER(TRIM(x)) (reference: data_transformer.py:59,108)."""
    return F.upper(F.trim(_c(col)))


def normalize_email(col: Column | str) -> Column:
    """LOWER(TRIM(x)) (reference: data_transformer.py:98)."""
    return F.lower(F.trim(_c(col)))


def fill_default(col: Column | str, default) -> Column:
    """COALESCE(x, default) (reference: data_transformer.py:47,103,158)."""
    return F.coalesce(_c(col), F.lit(default))


def recompute_total(
    total: Column | str, qty: Column | str, price: Column | str
) -> Column:
    """Null totals recomputed as qty*price (reference: data_transformer.py:51-55)."""
    return F.coalesce(_c(total), _c(qty) * _c(price))


def clip(col: Column | str, lo, hi) -> Column:
    """Clamp to [lo, hi] (reference: data_transformer.py:150-155)."""
    return F.least(F.greatest(_c(col), F.lit(lo)), F.lit(hi))


def validate_domain(
    col: Column | str, valid: list[str], default: str
) -> Column:
    """Out-of-domain values replaced by default
    (reference: data_transformer.py:107-115)."""
    c = _c(col)
    return F.when(c.isin(valid), c).otherwise(F.lit(default))


def sentiment_from_rating(col: Column | str) -> Column:
    """Rating → sentiment CASE; the reference's pd.cut bins and its dbt
    CASE twin agree on integers 1-5 post-clip — we implement the CASE
    form (reference: data_transformer.py:164-169; dbt stg_reviews.sql:14-18).
    """
    c = _c(col)
    return (
        F.when(c <= 2, "negative").when(c == 3, "neutral").otherwise("positive")
    )


def account_age_days(signup: Column | str, as_of) -> Column:
    """Days since signup, parameterized by as_of for determinism
    (reference uses wall-clock now(), data_transformer.py:118-119 —
    SURVEY.md §7.3 trap)."""
    return F.datediff(F.lit(as_of), _c(signup))
