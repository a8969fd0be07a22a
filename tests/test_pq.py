"""Product quantization (operators/pq.py): encoding correctness,
ADC-vs-exact consistency on reconstructible vectors, shortlist+refine
recall on clustered corpora, and plan hygiene."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators import similarity
from etl_data_warehouse_spark.operators.pq import (
    compression_ratio,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from etl_data_warehouse_spark.sources.generators import (
    generate_clustered_embeddings,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_clustered_embeddings(
        spark, 1000, dim=16, n_clusters=32
    ).localCheckpoint()


@pytest.fixture(scope="module")
def codebooks(corpus):
    return train_pq_codebooks(corpus, m=4, codes=16, max_iterations=4)


class TestPq:
    def test_codebook_shape(self, codebooks):
        rows = codebooks.collect()
        assert len(rows) == 4 * 16
        assert {r["subspace"] for r in rows} == {0, 1, 2, 3}
        assert all(len(r["cv"]) == 4 for r in rows)
        assert all(
            abs(r["cnorm2"] - sum(x * x for x in r["cv"])) < 1e-9
            for r in rows
        )

    def test_encode_one_code_per_subspace(self, spark, corpus, codebooks):
        codes = pq_encode(corpus, codebooks)
        per_vec = codes.groupBy("vec_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("subspace").alias("ns"),
        )
        bad = per_vec.filter(
            (F.col("n") != 4) | (F.col("ns") != 4)
        ).count()
        assert bad == 0

    def test_adc_equals_exact_on_reconstructible_vectors(
        self, spark, codebooks
    ):
        """Vectors that ARE codebook-entry concatenations lose nothing
        to quantization: ADC cosine must equal exact cosine."""
        books = {
            (r["subspace"], r["code_id"]): list(r["cv"])
            for r in codebooks.collect()
        }
        # synthetic corpus: concatenations of entries (1,2,3,4), (5,6,7,8)...
        vecs = []
        for i, base in enumerate((1, 5, 9, 13)):
            flat = []
            for s in range(4):
                flat += books[(s, base + (s % 2))]
            vecs.append((100 + i, [float(x) for x in flat]))
        syn = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        codes = pq_encode(syn, codebooks)
        out = pq_topk(codes, codebooks, syn, k=3).collect()
        exact = {
            (r["src_id"], r["neighbor_id"]): r["cosine_sim"]
            for r in similarity.brute_force_topk(syn, syn, k=3).collect()
        }
        assert out
        for r in out:
            ex = exact[(r["src_id"], r["neighbor_id"])]
            assert abs(r["score"] - ex) < 1e-9, (r, ex)

    def test_refined_recall_on_clustered_corpus(self, spark, corpus, codebooks):
        """ADC shortlist + exact re-rank must recover the true top-5:
        PQ's job is recalling the right neighborhood; exact scoring
        orders it."""
        queries = corpus.filter(F.col("vec_id") < 20)
        codes = pq_encode(corpus, codebooks)
        approx = pq_topk(
            codes, codebooks, queries, k=5,
            refine_with=corpus, refine_factor=10,
        ).collect()
        truth = {
            (r["src_id"], r["neighbor_id"])
            for r in similarity.brute_force_topk(corpus, queries, k=5).collect()
        }
        got = {(r["src_id"], r["neighbor_id"]) for r in approx}
        recall = len(truth & got) / len(truth)
        assert recall >= 0.9, f"refined PQ recall {recall}"

    def test_no_cartesian_in_adc_plan(self, spark, corpus, codebooks):
        queries = corpus.filter(F.col("vec_id") < 5)
        codes = pq_encode(corpus, codebooks)
        df = pq_topk(codes, codebooks, queries, k=3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan

    def test_compression_ratio(self):
        # d=64 float32 = 256 bytes; m=4, 16 codes -> 4 codes of 4 bits
        assert compression_ratio(64, 4, 16) == 256.0 / 4.0
        assert math.isclose(compression_ratio(16, 4, 256), 64.0 / 4.0)


class TestIvfPq:
    """IVFADC composition: IVF cell pruning + ADC scoring + exact
    refine (operators/pq.py:ivfadc_topk)."""

    @pytest.fixture(scope="class")
    def nd_data(self, spark):
        corpus = generate_clustered_embeddings(
            spark, 2000, dim=16, n_clusters=400, noise=0.4
        ).localCheckpoint()
        queries = generate_clustered_embeddings(
            spark, 60, dim=16, n_clusters=400, noise=0.4
        ).localCheckpoint()
        return corpus, queries

    def test_recall_vs_brute_force(self, spark, nd_data):
        from etl_data_warehouse_spark.operators.pq import ivfadc_topk

        corpus, queries = nd_data
        got = ivfadc_topk(
            corpus, queries, k=3, n_cells=32, nprobe=8, m=4, codes=16
        )
        a = {(r["src_id"], r["neighbor_id"]) for r in got.collect()}
        bf = similarity.brute_force_topk(corpus, queries, k=3).collect()
        b = {(r["src_id"], r["neighbor_id"]) for r in bf}
        assert len(a & b) / len(b) >= 0.9

    def test_no_cartesian_and_prebuilt_index_reuse(self, spark, nd_data):
        from etl_data_warehouse_spark.operators.pq import (
            ivfadc_topk,
            pq_encode,
            train_pq_codebooks,
        )

        corpus, queries = nd_data
        cents = similarity.kmeans_centroids(
            corpus, n_cells=32, max_iterations=4
        )
        books = train_pq_codebooks(corpus, m=4, codes=16, max_iterations=4)
        codes_t = pq_encode(corpus, books).localCheckpoint()
        df = ivfadc_topk(
            corpus, queries, k=3, n_cells=32, nprobe=8,
            centroids=cents, codebooks=books, codes_table=codes_t,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        rows = df.collect()
        assert {r["src_id"] for r in rows} == {
            r["vec_id"] for r in queries.collect()
        }
        # ranks are dense 1..k per query
        per = {}
        for r in rows:
            per.setdefault(r["src_id"], []).append(r["rank"])
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())

    def test_packed_index_equals_longform(self, spark, nd_data):
        """codes_packed + assigned (the persisted-index production
        shape) must return exactly the long-form codes_table result."""
        from etl_data_warehouse_spark.operators.pq import (
            ivfadc_topk,
            pack_codes,
            pq_encode,
            train_pq_codebooks,
        )
        from etl_data_warehouse_spark.operators.similarity import (
            rank_cells,
            with_norm,
        )
        from pyspark.sql import functions as F

        corpus, queries = nd_data
        cents = similarity.kmeans_centroids(
            corpus, n_cells=32, max_iterations=4
        )
        books = train_pq_codebooks(corpus, m=4, codes=16, max_iterations=4)
        codes_t = pq_encode(corpus, books).localCheckpoint()
        packed = pack_codes(codes_t, books).localCheckpoint()
        cents_n = cents.select(
            "cell_id",
            "cv",
            F.sqrt(
                F.aggregate(
                    F.transform("cv", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ).alias("cn"),
        )
        v = with_norm(corpus).select(
            F.col("vec_id").alias("vid"),
            F.col("_v").alias("vv"),
            F.col("_norm").alias("vn"),
        )
        assigned = (
            rank_cells(v, cents_n, 1)
            .select(F.col("vid").alias("vec_id"), "cell_id")
            .localCheckpoint()
        )
        base = ivfadc_topk(
            corpus, queries, k=3, n_cells=32, nprobe=8,
            centroids=cents, codebooks=books, codes_table=codes_t,
        ).collect()
        fast = ivfadc_topk(
            corpus, queries, k=3, n_cells=32, nprobe=8,
            centroids=cents, codebooks=books,
            codes_packed=packed, assigned=assigned,
        ).collect()
        assert sorted(map(tuple, base)) == sorted(map(tuple, fast))


class TestPackEncodeArrow:
    def test_equals_fold_path(self, spark, corpus, codebooks):
        """The Arrow packer must reproduce pack_codes(pq_encode(...))
        exactly on the test corpus: same codes (argmin first-occurrence
        == asc-code_id tiebreak), bit-equal rnorm2 (same left fold over
        the codebooks' own cnorm2 values)."""
        from etl_data_warehouse_spark.operators.pq import (
            pack_codes,
            pack_encode_arrow,
        )

        fold = {
            r["vec_id"]: (list(r["code_ids"]), r["rnorm2"])
            for r in pack_codes(
                pq_encode(corpus, codebooks), codebooks
            ).collect()
        }
        arrow = {
            r["vec_id"]: (list(r["code_ids"]), r["rnorm2"])
            for r in pack_encode_arrow(corpus, codebooks).collect()
        }
        assert set(fold) == set(arrow)
        diff_codes = [
            v for v in fold if fold[v][0] != arrow[v][0]
        ]
        assert not diff_codes, diff_codes[:5]
        for v in fold:
            assert fold[v][1] == arrow[v][1], v


class TestNumpyPqTrainer:
    def test_matches_fold_trainer_on_separated_corpus(
        self, spark, corpus, codebooks
    ):
        """train_pq_codebooks_numpy (the build_ivf_pq_index arrow-mode
        trainer) must reproduce the distributed fold trainer's
        codebooks on a well-separated corpus: identical control flow
        (seeding, asc-code_id tiebreak, empty-cell carry, early stop)
        means identical member sets, so centroids differ only by
        summation order — pinned at 1e-9, six orders above double ulps
        on unit-scale data."""
        from etl_data_warehouse_spark.operators.pq import (
            train_pq_codebooks_numpy,
        )

        got = {
            (r["subspace"], r["code_id"]): (list(r["cv"]), r["cnorm2"])
            for r in train_pq_codebooks_numpy(
                corpus, m=4, codes=16, max_iterations=4
            ).collect()
        }
        want = {
            (r["subspace"], r["code_id"]): (list(r["cv"]), r["cnorm2"])
            for r in codebooks.collect()
        }
        assert set(got) == set(want)
        for key in want:
            wv, wn = want[key]
            gv, gn = got[key]
            assert max(abs(a - b) for a, b in zip(wv, gv)) < 1e-9, key
            assert abs(wn - gn) < 1e-9, key
