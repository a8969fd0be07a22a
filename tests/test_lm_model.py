"""Persisted unigram LM (operators/lm_model.py): appended counts must
equal a fresh full build exactly (mergeable-aggregate contract), the
loaded-model scorer must reproduce the train-inline scorer, and
replayed appends must change nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.corpus import lm_perplexity_score
from etl_data_warehouse_spark.operators.lm_model import (
    append_to_lm_model,
    build_lm_model,
    load_lm_counts,
    score_with_lm_model,
)
from etl_data_warehouse_spark.sources.catalog import load_table


class TestLmModel:
    def test_append_equals_rebuild_and_scoring_matches(
        self, spark, sf_dir, tmp_path
    ):
        docs = load_table(spark, "documents", sf_dir)
        # the q104 train slice, split into two appendable sub-slices
        a = docs.filter(F.col("doc_id") % 10 == 0)
        b = docs.filter(F.col("doc_id") % 10 == 5)
        inc = str(tmp_path / "lm_inc")
        full = str(tmp_path / "lm_full")

        build_lm_model(a, inc)
        append_to_lm_model(b, inc, batch_id=1)
        build_lm_model(docs.filter(F.col("doc_id") % 5 == 0), full)

        got = {(r["token"], r["cnt"]) for r in load_lm_counts(spark, inc).collect()}
        want = {(r["token"], r["cnt"]) for r in load_lm_counts(spark, full).collect()}
        assert got == want and got

        # loaded-model scoring == train-inline scoring (q104 math)
        scored = score_with_lm_model(docs, inc).collect()
        inline = lm_perplexity_score(
            docs, docs.filter(F.col("doc_id") % 5 == 0)
        ).collect()
        assert [tuple(r) for r in scored] == [tuple(r) for r in inline]

        # replayed append rewrites identical content
        n = len(got)
        append_to_lm_model(b, inc, batch_id=1)
        assert load_lm_counts(spark, inc).count() == n
