"""Temporal join operators Spark lacks as built-ins: AS-OF and RANGE.

Both are implemented as compositions of existing DataFrame ops
(SURVEY.md §7.6 design rule (a)) with explicit scale strategies:

- **as-of join** (latest right row at-or-before each left row's time):
  equi-join on the key + time residual, then keep rank-1 per left row.
  Shuffles once on the key and once on the left row id. At 100 TB with
  huge per-key fan-in, pre-bucket both sides by key and time-sort within
  buckets (sources/bucketing.py) so the join is co-located; the rank-1
  window then runs within partitions.

- **range join** (point BETWEEN range_start AND range_end): naive Spark
  planning gives BroadcastNestedLoopJoin (quadratic). We derive an
  EQUALITY bucket — ranges explode to every fixed-width time bucket they
  overlap, points map to their bucket — so Catalyst plans a hash join on
  the bucket, and the BETWEEN becomes a residual filter. Cost is
  O(points + ranges × span/bucket) instead of O(points × ranges).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    left_id: str,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    right_time <= left_time (direction='backward'; 'forward' = smallest
    right_time >= left_time). right rows must be unique per
    (right_key, right_time) — pre-aggregate if not. Inner semantics."""
    if direction == "backward":
        residual = F.col(right_time) <= F.col(left_time)
        order = [F.desc(right_time)]
    else:
        residual = F.col(right_time) >= F.col(left_time)
        order = [F.asc(right_time)]
    joined = left.join(
        right, (F.col(left_key) == F.col(right_key)) & residual, "inner"
    )
    w = Window.partitionBy(left_id).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def bucketed_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_days: int = 10,
) -> DataFrame:
    """Equi-bucket range join on DATE columns: returns point rows joined
    to every range containing them, planned as a hash join (never a
    nested-loop cross product)."""
    day = F.datediff(F.col(point_col), F.lit("1970-01-01"))
    p = points.withColumn("__bucket", (day / bucket_days).cast("long"))
    s_day = F.datediff(F.col(start_col), F.lit("1970-01-01"))
    e_day = F.datediff(F.col(end_col), F.lit("1970-01-01"))
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (s_day / bucket_days).cast("long"),
                (e_day / bucket_days).cast("long"),
            )
        ),
    )
    return (
        p.join(r, "__bucket")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bucket")
    )
