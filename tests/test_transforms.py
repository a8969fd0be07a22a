"""Defect-fixture unit tests — Spark twins of the reference's transformer
tests (reference: tests/test_transformers.py:29-215; FIXTURES.md). Each
fixture embeds known defects; each test asserts the cleaning invariant."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.transforms import (
    clean_customers,
    clean_orders,
    clean_reviews,
    enforce_referential_integrity,
)


@pytest.fixture(scope="module")
def orders_fixture(spark):
    # defects: duplicate o2, null quantity, null total, mixed-case status,
    # orphan customer CUST_99999 (reference: test_transformers.py:30-45)
    rows = [
        ("o1", "CUST_00001", "PROD_0001", "2024-01-01 10:00:00", 2, 10.0, 20.0, "completed"),
        ("o2", "CUST_00002", "PROD_0002", "2024-01-02 11:00:00", None, 5.0, None, "Cancelled"),
        ("o2", "CUST_00002", "PROD_0002", "2024-01-03 11:00:00", 3, 5.0, 15.0, "PENDING"),
        ("o3", "CUST_99999", "PROD_0003", "2024-01-04 12:00:00", 1, 7.5, 7.5, "REFUNDED"),
        ("o4", "CUST_00003", "PROD_0001", None, 4, 2.0, 8.0, "completed"),
    ]
    return spark.createDataFrame(
        rows,
        "order_id string, customer_id string, product_id string, "
        "order_date string, quantity int, unit_price double, "
        "total_amount double, status string",
    )


@pytest.fixture(scope="module")
def customers_fixture(spark):
    # defects: mixed-case email, null phone, INVALID_TIER, duplicate key
    rows = [
        ("CUST_00001", "Ada", "L", "Ada.L@EXAMPLE.com", None, "2023-01-01", "gold"),
        ("CUST_00002", "Bob", "M", "bob@example.com", "555", "2023-02-01", "INVALID_TIER"),
        ("CUST_00002", "Bob", "M", "bob2@example.com", "555", "2023-03-01", "SILVER"),
        ("CUST_00003", "Cy", "N", "CY@ex.com", "556", "2023-04-01", "BRONZE"),
    ]
    return spark.createDataFrame(
        rows,
        "customer_id string, first_name string, last_name string, "
        "email string, phone string, signup_date string, customer_tier string",
    )


@pytest.fixture(scope="module")
def reviews_fixture(spark):
    # defects: duplicate r3, out-of-range rating 7 and 0, null text
    rows = [
        ("r1", "PROD_0001", "CUST_00001", 5, "great", "2024-01-01T00:00:00"),
        ("r2", "PROD_0002", "CUST_00002", 7, None, "2024-01-02T00:00:00"),
        ("r3", "PROD_0003", "CUST_00003", 0, "bad", "2024-01-03T00:00:00"),
        ("r3", "PROD_0003", "CUST_00003", 3, "meh", "2024-01-04T00:00:00"),
        ("r4", "PROD_0001", "CUST_00001", 2, "poor", "2024-01-05T00:00:00"),
    ]
    return spark.createDataFrame(
        rows,
        "review_id string, product_id string, customer_id string, "
        "rating int, review_text string, review_date string",
    )


class TestCleanOrders:
    def test_dedup_keeps_first_by_date(self, orders_fixture):
        out = clean_orders(orders_fixture)
        o2 = out.filter(F.col("order_id") == "o2").collect()
        assert len(o2) == 1
        # first by order_date → the 2024-01-02 row
        assert o2[0]["status"] == "CANCELLED"

    def test_null_quantity_defaults_to_1(self, orders_fixture):
        out = clean_orders(orders_fixture)
        assert out.filter(F.col("quantity").isNull()).count() == 0
        o2 = out.filter(F.col("order_id") == "o2").first()
        assert o2["quantity"] == 1

    def test_null_total_recomputed(self, orders_fixture):
        out = clean_orders(orders_fixture)
        o2 = out.filter(F.col("order_id") == "o2").first()
        assert o2["total_amount"] == 1 * 5.0

    def test_statuses_uppercased(self, orders_fixture):
        out = clean_orders(orders_fixture)
        statuses = {r["status"] for r in out.select("status").collect()}
        assert statuses == {s.upper() for s in statuses}

    def test_invalid_dates_dropped_and_derived_cols(self, orders_fixture):
        out = clean_orders(orders_fixture)
        assert out.filter(F.col("order_id") == "o4").count() == 0
        row = out.filter(F.col("order_id") == "o1").first()
        assert row["order_year"] == 2024 and row["order_month"] == 1
        assert row["order_weekday"] == 0  # 2024-01-01 is a Monday


class TestCleanCustomers:
    AS_OF = datetime.date(2024, 1, 1)

    def test_emails_lowercased(self, customers_fixture):
        out = clean_customers(customers_fixture, self.AS_OF)
        emails = [r["email"] for r in out.collect()]
        assert all(e == e.lower() for e in emails)

    def test_null_phone_filled(self, customers_fixture):
        out = clean_customers(customers_fixture, self.AS_OF)
        assert out.filter(F.col("phone").isNull()).count() == 0
        assert (
            out.filter(F.col("customer_id") == "CUST_00001").first()["phone"]
            == "N/A"
        )

    def test_tier_domain_enforced(self, customers_fixture):
        out = clean_customers(customers_fixture, self.AS_OF)
        tiers = {r["customer_tier"] for r in out.collect()}
        assert tiers <= {"BRONZE", "SILVER", "GOLD", "PLATINUM"}
        # lowercase 'gold' normalized, INVALID_TIER → BRONZE
        assert (
            out.filter(F.col("customer_id") == "CUST_00001").first()[
                "customer_tier"
            ]
            == "GOLD"
        )
        assert (
            out.filter(F.col("customer_id") == "CUST_00002").first()[
                "customer_tier"
            ]
            == "BRONZE"
        )

    def test_dedup_and_account_age(self, customers_fixture):
        out = clean_customers(customers_fixture, self.AS_OF)
        assert out.filter(F.col("customer_id") == "CUST_00002").count() == 1
        row = out.filter(F.col("customer_id") == "CUST_00001").first()
        assert row["account_age_days"] == 365


class TestCleanReviews:
    def test_dedup_keeps_first(self, reviews_fixture):
        out = clean_reviews(reviews_fixture)
        r3 = out.filter(F.col("review_id") == "r3").collect()
        assert len(r3) == 1
        assert r3[0]["review_text"] == "bad"

    def test_rating_clamped(self, reviews_fixture):
        out = clean_reviews(reviews_fixture)
        ratings = [r["rating"] for r in out.collect()]
        assert all(1 <= r <= 5 for r in ratings)
        assert (
            out.filter(F.col("review_id") == "r2").first()["rating"] == 5
        )

    def test_null_text_filled(self, reviews_fixture):
        out = clean_reviews(reviews_fixture)
        assert out.filter(F.col("review_text").isNull()).count() == 0

    def test_sentiment_domain(self, reviews_fixture):
        out = clean_reviews(reviews_fixture)
        m = {r["review_id"]: r["sentiment"] for r in out.collect()}
        assert m["r1"] == "positive"  # 5
        assert m["r2"] == "positive"  # clipped 7→5
        assert m["r3"] == "negative"  # clipped 0→1
        assert m["r4"] == "negative"  # 2


class TestReferentialIntegrity:
    def test_orphans_rejected(self, orders_fixture, customers_fixture):
        orders = clean_orders(orders_fixture)
        kept, rejected = enforce_referential_integrity(
            orders, customers_fixture
        )
        assert rejected.count() == 1
        assert rejected.first()["customer_id"] == "CUST_99999"
        assert kept.count() == orders.count() - 1

    def test_noop_when_all_match(self, customers_fixture, spark):
        orders = spark.createDataFrame(
            [("oX", "CUST_00001")], "order_id string, customer_id string"
        )
        kept, rejected = enforce_referential_integrity(
            orders, customers_fixture
        )
        assert kept.count() == 1 and rejected.count() == 0
