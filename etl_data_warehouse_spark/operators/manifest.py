"""Sharded exact global numbering for training manifests.

q121 (curriculum) and q122 (DSIR) close with a global ``row_number()``
— a single-partition sort, fine at doc-grain test scale, the one stage
their docstrings flagged as needing sharding at 100 TB. This module is
that sharding: the classic two-phase *histogram sort* shape expressed
as DataFrame ops.

``keyed_global_rank`` numbers rows within a RANGE-ALIGNED key (any
column monotone in the target sort order: a value bucket, a decile x
hash-range shard, a quantized weight cell) with a distributed
``row_number`` partitioned BY that key, then lifts local positions to
exact global positions by adding an exclusive prefix sum of per-key
counts. The prefix sum runs on the key-cardinality frame (thousands of
rows — the only single-partition stage left), which is broadcast back.
The result is bit-identical to the global ``row_number`` — proven by
registering the sharded variants (q129/q130) against the SAME DuckDB
oracles as their global twins.

``ntile_from_rank`` is the exact closed form of SQL NTILE(k) given a
global rank: the first ``N % k`` buckets take ``N div k + 1`` rows,
the rest ``N div k`` — so decile assignment needs no global window
either, only the same keyed rank.

No reference twin: the reference's pandas pipeline sorts in memory
(reference: transformers/data_transformer.py sorts a single frame);
this operator exists for the corpus scale the reference never reaches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keyed_global_rank(
    df: DataFrame,
    key: str,
    order_cols: list,
    out: str = "pos",
    key_desc: bool = False,
    total_col: str | None = None,
) -> DataFrame:
    """Exact 1-based global rank over (key, *order_cols) without a
    single-partition corpus sort.

    REQUIRES ``key`` to be monotone in the global order (ascending, or
    descending with ``key_desc=True``): x.key < y.key must imply x
    precedes y (resp. follows). ``order_cols`` complete the order
    within a key and must form a total order there.

    REQUIRES ``key`` to be NON-NULL on every row: the numbering join
    back to the broadcast offsets frame is an equi-join, so NULL-keyed
    rows would silently vanish from the manifest (the counts groupBy
    keeps a null group but the equi-join never matches it). Callers
    with nullable keys must filter or coalesce them first; derived
    keys (bucket ids, md5 ranks) are non-null by construction.

    Cost shape: df is consumed TWICE (per-key counts + the numbering
    join) — the stat pass + data pass of a histogram sort, which is
    also what Spark's own range-partitioned sort does (its sampling
    pass re-executes the child). Callers whose lineage is expensive
    should ``localCheckpoint`` the doc-grain input first (at cluster
    scale: persist it). The offsets frame is key-cardinality-sized and
    is broadcast — keep key cardinality ~1e6 or below.

    ``total_col``: optionally also attach the total row count (needed
    by :func:`ntile_from_rank`) — carried as a window sum on the
    offsets frame, never a second corpus aggregate.
    """
    kc = F.col(key)
    korder = kc.desc() if key_desc else kc.asc()
    counts = df.groupBy(key).agg(F.count("*").alias("_kcnt"))
    woff = Window.orderBy(korder).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_base",
        F.coalesce(F.sum("_kcnt").over(woff), F.lit(0)).cast("long"),
    )
    if total_col is not None:
        offsets = offsets.withColumn(
            total_col,
            F.sum("_kcnt").over(Window.partitionBy()).cast("long"),
        )
    offsets = offsets.drop("_kcnt")
    wl = Window.partitionBy(key).orderBy(*order_cols)
    return df.join(F.broadcast(offsets), key).withColumn(
        out,
        (F.col("_base") + F.row_number().over(wl)).cast("long"),
    ).drop("_base")


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """Exact SQL NTILE(k) from a 1-based global rank: all-integer, so
    it is hash-identical in Spark and DuckDB.

    NTILE semantics: with N rows, the first ``r = N % k`` buckets hold
    ``q + 1 = N div k + 1`` rows each, the remaining ``k - r`` hold
    ``q``. (When N < k, q = 0 and r = N: bucket i holds row i — the
    greatest() guard keeps the unreached branch division well-defined
    under ANSI mode.)"""

    def _idiv(x: Column, d: Column) -> Column:
        # exact integer division: strip the remainder first so the
        # double division is of an exact multiple (never rounds)
        return ((x - F.pmod(x, d)) / d).cast("long")

    q = _idiv(total, F.lit(k))
    r = total % F.lit(k)
    big = r * (q + 1)  # rows covered by the (q+1)-sized buckets
    return (
        F.when(rank <= big, _idiv(rank - 1, q + 1) + 1)
        .otherwise(r + _idiv(rank - big - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
