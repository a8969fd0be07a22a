"""Cleaning / validation transforms over reference-shaped tables.

These are the Spark twins of the reference's four pandas transformers
(reference: transformers/data_transformer.py:24,77,129,179), expressed
as lazy DataFrame functions. They operate on the reference's raw-source
schemas (FIXTURES.md §1-§3); unit tests feed them the same defect
fixtures (duplicates, nulls, mixed case, orphans, out-of-range).

Scale notes: dedup uses ROW_NUMBER over the business key ordered by the
event-time column — deterministic (the reference's keep='first' after an
ORDER BY extract, data_transformer.py:39 + postgres_extractor.py:47) and
shuffle-partitioned by key, no global sort. Referential integrity is a
broadcast LEFT SEMI join (reference's isin(), data_transformer.py:198-211).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cleaning import (
    account_age_days,
    clip,
    fill_default,
    normalize_email,
    normalize_status,
    recompute_total,
    sentiment_from_rating,
    validate_domain,
)

VALID_TIERS = ["BRONZE", "SILVER", "GOLD", "PLATINUM"]


def dedup_first(df: DataFrame, key: str, order: str, *tiebreak: str) -> DataFrame:
    """Deterministic keep-first dedup: ROW_NUMBER over the business key
    (SURVEY.md §7.3; reference: data_transformer.py:39,92,144).

    A full-row hash is always appended as the final tiebreak: callers'
    natural tiebreak columns (often the key itself) can be constant
    within a partition, and duplicate keys sharing the order value must
    still resolve the same way on every run (the repo's unique-
    tiebreaker rule). Fully identical rows remain interchangeable."""
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns])
    w = Window.partitionBy(key).orderBy(order, *tiebreak, row_hash)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def clean_orders(df: DataFrame) -> DataFrame:
    """Twin of transform_orders (reference: data_transformer.py:24-74)."""
    df = dedup_first(df, "order_id", "order_date", "order_id")
    df = (
        df.withColumn("quantity", fill_default("quantity", 1).cast("int"))
        .withColumn(
            "total_amount",
            recompute_total("total_amount", "quantity", "unit_price"),
        )
        .withColumn("status", normalize_status("status"))
        .withColumn("order_date", F.to_timestamp("order_date"))
    )
    return (
        df.filter(F.col("order_date").isNotNull())
        .withColumn("order_month", F.month("order_date").cast("int"))
        .withColumn("order_year", F.year("order_date").cast("int"))
        .withColumn(
            "order_weekday", ((F.dayofweek("order_date") + 5) % 7).cast("int")
        )
    )


def clean_customers(df: DataFrame, as_of) -> DataFrame:
    """Twin of transform_customers (reference: data_transformer.py:77-126)."""
    df = dedup_first(df, "customer_id", "signup_date", "customer_id")
    return (
        df.withColumn("email", normalize_email("email"))
        .withColumn("phone", fill_default("phone", "N/A"))
        .withColumn(
            "customer_tier",
            validate_domain(
                normalize_status("customer_tier"), VALID_TIERS, "BRONZE"
            ),
        )
        .withColumn("signup_date", F.to_date("signup_date"))
        .withColumn("account_age_days", account_age_days("signup_date", as_of))
    )


def clean_reviews(df: DataFrame) -> DataFrame:
    """Twin of transform_reviews (reference: data_transformer.py:129-176)."""
    df = dedup_first(df, "review_id", "review_date", "review_id")
    return (
        df.withColumn("rating", clip("rating", 1, 5))
        .withColumn("review_text", fill_default("review_text", ""))
        .withColumn("review_date", F.to_timestamp("review_date"))
        .withColumn("sentiment", sentiment_from_rating("rating"))
    )


def enforce_referential_integrity(
    orders: DataFrame, customers: DataFrame, key: str = "customer_id"
) -> tuple[DataFrame, DataFrame]:
    """(kept, rejected) split — LEFT SEMI keeps orders whose key exists,
    LEFT ANTI is the reject audit trail
    (reference: data_transformer.py:179-219 pandas isin → semi join).
    The dimension side broadcasts; the fact side never shuffles."""
    dim_keys = customers.select(key).distinct()
    kept = orders.join(F.broadcast(dim_keys), key, "left_semi")
    rejected = orders.join(F.broadcast(dim_keys), key, "left_anti")
    return kept, rejected
