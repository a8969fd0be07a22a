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


class TestContainmentKeepLongest:
    def test_snippets_dropped_parents_kept(self, spark):
        from etl_data_warehouse_spark.operators.dedup import (
            containment_keep_longest,
        )

        corpus = _snippet_corpus(spark)
        verdicts = {
            r["doc_id"]: (r["kept"], r["container"])
            for r in containment_keep_longest(corpus, threshold=0.9)
            .collect()
        }
        assert len(verdicts) == corpus.count()  # one row per doc
        for b in range(0, 80, 5):
            kept, container = verdicts[b + OFFSET]
            # snippet drops; its container is the MIN justifying outer
            # — the parent b, or an even-smaller near-dup of the parent
            assert not kept and container is not None and container <= b
            # the parent itself is only dropped if IT is contained in a
            # longer doc (possible via the generator's planted
            # near-dups) — never because of its own snippet
            pk, pc = verdicts[b]
            assert pc != b + OFFSET

    def test_indexed_verdicts_equal_exact(self, spark):
        # q164's contract: the bottom-k/df-capped pair path must
        # reproduce the exact operator's per-document verdicts
        # bit-for-bit on this corpus (true subsets have deterministic
        # recall 1; the near-containment pairs sit in the
        # hypergeometric zero-miss regime)
        from etl_data_warehouse_spark.operators.dedup import (
            containment_keep_longest,
            containment_keep_longest_indexed,
        )

        corpus = _snippet_corpus(spark)
        exact = sorted(
            tuple(r)
            for r in containment_keep_longest(corpus, threshold=0.9)
            .collect()
        )
        indexed = sorted(
            tuple(r)
            for r in containment_keep_longest_indexed(
                corpus, threshold=0.9
            ).collect()
        )
        assert exact == indexed


BOILER = "the quick brown fox jumps lazy"  # 6 words -> 4 shingles shared by ALL


def _boiler_corpus(spark, n=40, ndups=6):
    """Every doc ends with the same 6-word boilerplate, so its four
    3-gram shingles have df = n (the stop-shingle blowup); ndups docs
    are exact copies of the first ndups (true containment-1.0 pairs
    carried by the three rare junction/unique shingles). Unrelated
    docs share only the boilerplate: containment 4/7 < 0.9."""
    rows = [(i, f"u{i}a u{i}b u{i}c {BOILER}") for i in range(n)]
    rows += [(OFFSET + i, rows[i][1]) for i in range(ndups)]
    return spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()


class TestContainmentDfCap:
    def test_capped_equals_uncapped_on_true_pairs(self, spark):
        # max_df drops the boilerplate shingles from sketch AND
        # postings; the true (exact-duplicate) pairs ride on rare
        # shingles, so the capped verdicts are bit-for-bit the exact
        # operator's output — the cap affects cost, not results here
        corpus = _boiler_corpus(spark)
        exact = containment_pairs(corpus, threshold=0.9)
        capped = containment_pairs_indexed(corpus, threshold=0.9, max_df=4)
        uncapped = containment_pairs_indexed(
            corpus, threshold=0.9, max_df=None
        )
        want = _rows(exact)
        assert len(want) == 12  # 6 dup pairs x both orientations
        assert _rows(capped) == want
        assert _rows(uncapped) == want

    def test_candidates_flat_as_stop_shingle_df_grows(self, spark):
        # doubling the corpus doubles every boilerplate shingle's df:
        # the UNCAPPED candidate join grows quadratically (every doc's
        # sketch holds all 7 of its shingles, 4 shared by everyone),
        # the capped one stays exactly at the true-dup pairs — the
        # enforced O(k * N * max_df) bound, measured
        from etl_data_warehouse_spark.operators.dedup import (
            containment_candidate_count,
        )

        small = _boiler_corpus(spark, n=40, ndups=6)
        big = _boiler_corpus(spark, n=80, ndups=6)
        capped_small = containment_candidate_count(small, max_df=4)
        capped_big = containment_candidate_count(big, max_df=4)
        uncapped_small = containment_candidate_count(small, max_df=None)
        uncapped_big = containment_candidate_count(big, max_df=None)
        assert capped_small == capped_big == 12  # flat: dup pairs only
        # quadratic blowup without the cap: all (46*45) / (86*85)
        # ordered pairs collide on the boilerplate shingles
        assert uncapped_small == 46 * 45
        assert uncapped_big == 86 * 85

    def test_recall_calibration_below_c1(self, spark):
        # the (1-c)^k bound exercised BELOW c=1.0 (round-11 verdict
        # task #7): truncated snippets with substituted tokens plant
        # pairs at containment 0.925 / 0.9625 / 1.0; across k in
        # {4, 8, 16} the indexed path must find every true pair. The
        # exact miss probability is hypergeometric — picking all k
        # sketch hashes from the (1-c)*s absent shingles:
        # C((1-c)s, k) / C(s, k) <= (1-c)^k; at s=80, c=0.925 that is
        # 2.0e-6 (k=4), 1.8e-13 (k=8), 0 (k=16 > 6 absent) — so zero
        # misses is the deterministic expectation, not luck, and the
        # docstring's bound table is backed by this measurement.
        parents = [
            (i, " ".join(f"p{i}w{j}" for j in range(100))) for i in range(30)
        ]
        snippets = []
        for i in range(30):
            toks = parents[i][1].split()[:82]  # 80 snippet shingles
            for s in range(i % 3):  # 0/1/2 substitutions -> c 1/0.9625/0.925
                toks[20 + 30 * s] = f"x{i}_{s}"
            snippets.append((OFFSET + i, " ".join(toks)))
        corpus = spark.createDataFrame(
            parents + snippets, "doc_id long, text string"
        ).localCheckpoint()
        true_pairs = {
            (r["doc_inner"], r["doc_outer"]): r["containment"]
            for r in containment_pairs(corpus, threshold=0.9).collect()
        }
        assert len(true_pairs) == 30
        assert set(true_pairs.values()) == {1.0, 77 / 80, 74 / 80}
        for k in (4, 8, 16):
            found = {
                (r["doc_inner"], r["doc_outer"])
                for r in containment_pairs_indexed(
                    corpus, threshold=0.9, k=k
                ).collect()
            }
            misses = set(true_pairs) - found
            assert not misses, f"k={k}: missed {sorted(misses)}"

    def test_shared_shingle_exchange_is_reused(self, spark):
        # the corpus-sized shingle table must be shared through the
        # token-hash Exchange (ReuseExchange), NOT localCheckpoint
        # (heap-pinning at 10^6+, the q95 XL OOM rule): the verify
        # stage consumes it twice (inner/outer packs), each re-running
        # only the cheap codegen'd shingle explode over ONE reused
        # shuffle materialization
        corpus = _boiler_corpus(spark)
        df = containment_pairs_indexed(corpus, threshold=0.9, max_df=4)
        df.collect()
        final = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "ReusedExchange" in final
        # inner + outer pack branches; the token-hash Exchange below
        # them is materialized once (exactly one REPARTITION_BY_NUM
        # Exchange node — the other occurrence is its ReusedExchange)
        assert final.count("Generate explode") <= 2
        n_repart = final.count("REPARTITION_BY_NUM")
        n_reused_repart = final.count(
            "ReusedExchange [doc_id"
        )
        assert n_repart >= 2 and n_reused_repart >= n_repart - 1
