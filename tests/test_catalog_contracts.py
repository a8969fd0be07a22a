"""Catalog contract tests — Spark twin of the reference's extractor
contract layer (reference: tests/test_extractors.py; SURVEY.md §5.2):
column-list contracts, incremental filter application, empty-result and
error behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from etl_data_warehouse_spark.schemas import SCHEMAS
from etl_data_warehouse_spark.sources.catalog import load_table


class TestColumnContracts:
    def test_projection_returns_exactly_requested_columns(self, spark, sf_dir):
        df = load_table(
            spark, "orders", sf_dir, columns=["o_orderkey", "o_totalprice"]
        )
        assert df.columns == ["o_orderkey", "o_totalprice"]

    def test_full_scan_matches_declared_schema(self, spark, sf_dir):
        for name, schema in SCHEMAS.items():
            df = load_table(spark, name, sf_dir)
            assert df.columns == [f.name for f in schema.fields], name

    def test_unknown_table_raises_keyerror_listing_tables(self, spark, sf_dir):
        with pytest.raises(KeyError, match="orders"):
            load_table(spark, "no_such_table", sf_dir)

    def test_missing_path_raises_analysis_exception(self, spark):
        with pytest.raises(AnalysisException):
            load_table(spark, "orders", "/root/testdata/sf_nope").collect()


class TestIncrementalContract:
    def test_predicate_filters_and_empty_result_is_clean(self, spark, sf_dir):
        # filter beyond max date → empty DataFrame, not an error
        # (reference: test_extractors.py empty-result behavior)
        df = load_table(
            spark,
            "orders",
            sf_dir,
            predicate=F.col("o_orderdate") > F.lit("2999-01-01"),
        )
        assert df.count() == 0
        assert df.columns == [f.name for f in SCHEMAS["orders"].fields]

    def test_predicate_is_strictly_greater(self, spark, sf_dir):
        max_d = load_table(spark, "orders", sf_dir).agg(
            F.max("o_orderdate")
        ).first()[0]
        df = load_table(
            spark,
            "orders",
            sf_dir,
            predicate=F.col("o_orderdate") > F.lit(max_d),
        )
        assert df.count() == 0  # > excludes the watermark row itself
