"""Containment near-dup pairs (operators/dedup.containment_pairs —
q158's operator) and the one-sided bottom-k scale path
(containment_pairs_indexed): indexed == exact on a planted snippet
corpus, snippets detected at containment exactly 1.0, and the
asymmetry that motivates the measure (snippet→parent fires,
parent→snippet does not)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.dedup import (
    containment_pairs,
    containment_pairs_indexed,
)
from etl_data_warehouse_spark.sources.generators import generate_documents

OFFSET = 2_000_000


def _snippet_corpus(spark, n=80, snip_tokens=22):
    docs = generate_documents(spark, n, n_words=40, dup_rate=0.1)
    toks = F.split(F.trim("text"), " +")
    snip = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + OFFSET).alias("doc_id"),
        F.array_join(F.slice(toks, 1, snip_tokens), " ").alias("text"),
    )
    return (
        docs.select("doc_id", "text").unionByName(snip).localCheckpoint()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestContainment:
    def test_snippets_detected_and_asymmetric(self, spark):
        corpus = _snippet_corpus(spark)
        got = {
            (r["doc_inner"], r["doc_outer"]): r["containment"]
            for r in containment_pairs(corpus, threshold=0.9).collect()
        }
        base_ids = range(0, 80, 5)
        for b in base_ids:
            # snippet contained in its parent, exactly (subset by
            # construction: the snippet's 3-gram shingles are a prefix
            # of the parent's)
            assert got.get((b + OFFSET, b)) == 1.0
            # the reverse orientation must NOT fire: the parent is far
            # bigger than the snippet (containment ~ 20/38)
            assert (b, b + OFFSET) not in got

    def test_indexed_equals_exact(self, spark):
        # the bottom-k candidate path restricted-verify must reproduce
        # the exact operator bit-for-bit on this corpus: true subsets
        # have deterministic recall 1 (every sketch hash IS in the
        # parent), and the planted near-dup pairs sit far above the
        # (1-c)^k miss bound
        corpus = _snippet_corpus(spark)
        exact = containment_pairs(corpus, threshold=0.9).select(
            "doc_inner", "doc_outer", "containment"
        )
        indexed = containment_pairs_indexed(corpus, threshold=0.9).select(
            "doc_inner", "doc_outer", "containment"
        )
        assert _rows(exact) == _rows(indexed)

    def test_indexed_intersection_sizes_match_exact(self, spark):
        # the hashed-shingle basis (xxhash64) must preserve set sizes
        # vs the string basis (injective w.h.p.) — compare the full
        # rows, not just the verdicts
        corpus = _snippet_corpus(spark, n=40)
        exact = containment_pairs(corpus, threshold=0.9)
        indexed = containment_pairs_indexed(corpus, threshold=0.9)
        assert _rows(exact) == _rows(indexed)
