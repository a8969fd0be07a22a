"""Physical-layout query (q47): Z-order clustering assignment.

The Morton interleave and min-max scaling are pure integer/bit
arithmetic, so the whole clustering decision — scaled dims, z-value,
target file bucket — is hash-checked against DuckDB digit-for-digit
(sources/layout.py ``zvalue`` ≡ ``zvalue_sql``). The write path itself
(``zorder_write``) and its file-pruning payoff are proven in
tests/test_layout.py (parquet min/max footers skip files under a
single-dimension filter after clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table
from ..sources.layout import with_zorder_columns, zvalue_sql

_BITS = 8
_N_FILES = 16
_SHIFT = 2 * _BITS - (_N_FILES.bit_length() - 1)  # 12


def q47_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering assignment for lineitem z-ordered on
    (l_partkey, l_suppkey): every row's scaled dims, Morton value, and
    equal-width z-range file bucket."""
    li = load_table(
        spark,
        "lineitem",
        sf_dir,
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )
    z = with_zorder_columns(li, ["l_partkey", "l_suppkey"], _BITS, _N_FILES)
    return z.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "z_l_partkey",
        "z_l_suppkey",
        "zval",
        "zbucket",
    )  # no final sort (the q10 rule, r13): the compare is
    # order-insensitive; a global sort of the full fact by row id is
    # presentation only — the layout ORDER the query computes is the
    # zval/zbucket COLUMNS, not the output row order


_ZSQL = zvalue_sql(["z_l_partkey", "z_l_suppkey"], _BITS)

Q47_ORACLE = f"""
WITH b AS (
    SELECT min(l_partkey)::BIGINT AS minp, max(l_partkey)::BIGINT AS maxp,
           min(l_suppkey)::BIGINT AS mins, max(l_suppkey)::BIGINT AS maxs
    FROM lineitem
),
s AS (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           floor(((l_partkey::BIGINT - minp) * 255)
                 / greatest(maxp - minp, 1))::BIGINT AS z_l_partkey,
           floor(((l_suppkey::BIGINT - mins) * 255)
                 / greatest(maxs - mins, 1))::BIGINT AS z_l_suppkey
    FROM lineitem, b
),
z AS (SELECT *, {_ZSQL} AS zval FROM s)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       z_l_partkey, z_l_suppkey, zval,
       (zval >> {_SHIFT})::BIGINT AS zbucket
FROM z
ORDER BY l_orderkey, l_linenumber
"""

QUERIES = {"q47_zorder_layout": q47_zorder_layout}
ORACLES = {"q47_zorder_layout": Q47_ORACLE}
