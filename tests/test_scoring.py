"""Scored curation plans (plans/scoring.py): classifier inference math
vs a pure-Python reference, preference-pair invariants, and the
broadcast-model plan shape. (Cross-engine hash parity for q133/q134 is
covered by the registry-wide sweep in test_oracle_parity.py.)"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_data_warehouse_spark.plans.scoring import (
    HASH_DIM,
    doc_logits,
    hashed_weights,
    q133_quality_classifier,
    q134_preference_pairs,
)
from etl_data_warehouse_spark.sources.catalog import load_table


def _md5_mod(salt: str, key: str, mod: int) -> int:
    return int(hashlib.md5((salt + key).encode()).hexdigest()[:8], 16) % mod


def _py_logit(text: str) -> tuple[int, int]:
    toks = text.strip().split()
    toks = toks if toks else [""]
    logit = 0
    for t in toks:
        bucket = _md5_mod("f", t, HASH_DIM)
        logit += _md5_mod("w", str(bucket), 2001) - 1000
    return len(toks), logit


class TestQualityClassifier:
    def test_logits_match_python_reference(self, spark, sf_dir):
        docs = load_table(spark, "documents", sf_dir)
        texts = {
            r["doc_id"]: r["text"]
            for r in docs.select("doc_id", "text").collect()
        }
        got = {
            r["doc_id"]: (r["n_tokens"], r["logit_milli"])
            for r in q133_quality_classifier(spark, sf_dir).collect()
        }
        assert set(got) == set(texts)
        for doc_id, text in texts.items():
            assert got[doc_id] == _py_logit(text), doc_id

    def test_weight_table_is_broadcast_and_udf_free(self, spark, sf_dir):
        docs = load_table(spark, "documents", sf_dir)
        df = doc_logits(docs, hashed_weights(spark))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestPreferencePairs:
    def test_pair_invariants(self, spark, sf_dir):
        rows = q134_preference_pairs(spark, sf_dir).collect()
        assert rows
        scored = {
            r["doc_id"]: r["logit_milli"]
            for r in q133_quality_classifier(spark, sf_dir).collect()
        }
        from collections import Counter

        group_sizes = Counter(d // 5 for d in scored)
        expected_prompts = {p for p, n in group_sizes.items() if n >= 2}
        assert {r["prompt_id"] for r in rows} == expected_prompts
        for r in rows:
            assert r["chosen_doc_id"] != r["rejected_doc_id"]
            assert r["margin_milli"] >= 0
            assert (
                r["margin_milli"]
                == r["chosen_logit_milli"] - r["rejected_logit_milli"]
            )
            group = {
                d: s
                for d, s in scored.items()
                if d // 5 == r["prompt_id"]
            }
            assert r["n_candidates"] == len(group)
            assert r["chosen_logit_milli"] == max(group.values())
            assert r["rejected_logit_milli"] == min(group.values())
            # deterministic tiebreaks: best = lowest doc_id among max,
            # worst = highest doc_id among min
            assert r["chosen_doc_id"] == min(
                d for d, s in group.items()
                if s == r["chosen_logit_milli"]
            )
            assert r["rejected_doc_id"] == max(
                d for d, s in group.items()
                if s == r["rejected_logit_milli"]
            )

    def test_all_tied_group_yields_distinct_docs(self, spark):
        df = spark.createDataFrame(
            [(0, "same same"), (1, "same same"), (2, "same same")],
            "doc_id LONG, text STRING",
        ).withColumn("source", F.lit("s"))
        # same text -> identical logits; tiebreaks must still pick two
        # DISTINCT documents (lowest id chosen, highest id rejected)
        from etl_data_warehouse_spark.plans import scoring

        scored = scoring.doc_logits(
            df, scoring.hashed_weights(spark)
        )
        assert scored.select(
            F.countDistinct("logit_milli")
        ).first()[0] == 1
