"""Property-based invariants via hypothesis — the randomized layer the
reference's test suite lacks (SURVEY.md §5 'superset' plan).

Strategy sizes are kept tiny: each example spins Spark jobs, so we trade
example count for breadth of generated edge cases (None fields, extreme
ratings, duplicate keys, empty strings)."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.transforms import (
    clean_orders,
    clean_reviews,
    dedup_first,
)

_ids = st.text(alphabet="abc123", min_size=1, max_size=4)

_order_rows = st.lists(
    st.tuples(
        _ids,                                        # order_id (dups likely)
        st.sampled_from(["C1", "C2", "C3"]),         # customer_id
        st.sampled_from(
            ["2024-01-01 10:00:00", "2024-02-03 11:30:00", None]
        ),                                           # order_date
        st.one_of(st.none(), st.integers(1, 20)),    # quantity
        st.floats(0.01, 500.0, allow_nan=False),     # unit_price
        st.one_of(st.none(), st.floats(0.0, 1e4, allow_nan=False)),  # total
        st.sampled_from(["completed", "PENDING", " Cancelled "]),    # status
    ),
    min_size=1,
    max_size=8,
)

_review_rows = st.lists(
    st.tuples(
        _ids,
        st.integers(-5, 12),                          # rating (out of range)
        st.one_of(st.none(), st.text(max_size=6)),    # review_text
        st.sampled_from(["2024-01-01T00:00:00", "2024-05-05T09:00:00"]),
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_order_rows)
def test_clean_orders_invariants(spark_global, rows):
    df = spark_global.createDataFrame(
        rows,
        "order_id string, customer_id string, order_date string, "
        "quantity int, unit_price double, total_amount double, status string",
    )
    out = clean_orders(df).collect()
    ids = [r["order_id"] for r in out]
    assert len(ids) == len(set(ids))                       # dedup total
    for r in out:
        assert r["quantity"] is not None and r["quantity"] >= 1
        assert r["total_amount"] is not None
        assert r["status"] == r["status"].upper().strip()
        assert r["order_date"] is not None                 # bad dates dropped
        assert 0 <= r["order_weekday"] <= 6


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_review_rows)
def test_clean_reviews_invariants(spark_global, rows):
    df = spark_global.createDataFrame(
        rows, "review_id string, rating int, review_text string, "
        "review_date string"
    )
    out = clean_reviews(df).collect()
    ids = [r["review_id"] for r in out]
    assert len(ids) == len(set(ids))
    for r in out:
        assert 1 <= r["rating"] <= 5                        # clamp
        assert r["review_text"] is not None                 # fill
        assert r["sentiment"] in {"negative", "neutral", "positive"}
        if r["rating"] <= 2:
            assert r["sentiment"] == "negative"
        elif r["rating"] == 3:
            assert r["sentiment"] == "neutral"
        else:
            assert r["sentiment"] == "positive"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(_ids, st.integers(0, 5)), min_size=1, max_size=10
    )
)
def test_dedup_first_is_deterministic_min(spark_global, rows):
    """dedup_first must keep exactly the row with the smallest order
    column per key (ties broken by the tiebreaker), independent of
    input order."""
    df = spark_global.createDataFrame(rows, "k string, v int")
    out = {r["k"]: r["v"] for r in dedup_first(df, "k", "v", "v").collect()}
    expected = {}
    for k, v in rows:
        expected[k] = min(expected.get(k, v), v)
    assert out == expected


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
