"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these explicit tools cover the cases AQE cannot: a broadcast-
ineligible dimension joined on a pathologically hot key, and hot-key
aggregations where a single reducer would melt.

Salting trades one extra narrow stage for an even shuffle:
- join: fact keys get a random salt in [0, s); the (small but
  unbroadcastable) right side is exploded s-fold with every salt value;
  the join key becomes (key, salt) → hot keys spread over s reducers.
- aggregation: two-phase — partial aggregate on (key, salt), final
  aggregate on key. Only safe for decomposable aggregates (sum/count/
  min/max — exactly the reference's aggregate set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on a skewed key: salt the big left side, explode the
    right side salt-fold. Result is identical to left.join(right, key)
    for the allowed join types ONLY: the right side is exploded s-fold,
    so right/full outer joins would emit unmatched right rows s times
    and anti semantics invert — those types are rejected."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} — the "
            "salt-exploded right side breaks right/full/anti semantics"
        )
    salted_left = left.withColumn(
        SALT_COL, (F.rand(42) * salt).cast("int")
    )
    salted_right = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_left.join(salted_right, [key, SALT_COL], how).drop(SALT_COL)


def salted_sum(
    df: DataFrame, key: str, value_expr, alias: str, salt: int = 16
) -> DataFrame:
    """Two-phase hot-key SUM: partial on (key, salt), final on key.
    value_expr must be a decomposable aggregate input column."""
    partial = (
        df.withColumn(SALT_COL, (F.rand(42) * salt).cast("int"))
        .groupBy(key, SALT_COL)
        .agg(F.sum(value_expr).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(alias))
