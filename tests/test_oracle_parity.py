"""Differential layer: every oracle-backed query must hash-match DuckDB
at sf0.001 (fast twin of the driver's sf0.01 gate). This is the test
strategy layer the reference lacks (SURVEY.md §5)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from etl_data_warehouse_spark import TABLES
from tools.check_correctness import table_hash


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _oracle_cases():
    oracles = entrymod.oracle_sql()
    return sorted(oracles.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = entrymod.queries()[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert table_hash(scols, srows) == table_hash(dcols, drows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
