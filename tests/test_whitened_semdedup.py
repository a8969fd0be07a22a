"""Whitened SemDeDup (similarity.whitened_semantic_dedup and the
frozen-model incremental twin ann_index.incremental_semantic_dedup_whitened)
— SemDeDup as published (Abbas et al. 2023 §3 whitens before
clustering).

The planted corpus makes whitening MATTER: every vector carries a
dominant common direction with widely varying magnitude (the
anisotropy real embedding spaces have), so raw cosine between a twin
pair is diluted by the dominant axis while unrelated vectors with
similar magnitudes look alike. Whitening equalizes the variance and
recovers the base-space similarity — the whitened path must find at
least as many (here: strictly more) planted twins than the raw path.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators import similarity
from etl_data_warehouse_spark.operators.ann_index import (
    append_to_whitened_ivf_index,
    build_whitened_ivf_pq_index,
    incremental_semantic_dedup_whitened,
    load_whitening,
)

# dim/threshold chosen so the base signal outweighs the whitened
# nuisance direction's fixed ~sqrt(12) spread: at these values the
# whitened ALL-PAIRS twin cosine floor sits ~0.91+ vs a 0.24 max
# non-twin cosine (raw: twin cosines down to ~0.7, diluted by the
# dominant axis). The residual whitened misses are CELL SPLITS — the
# SemDeDup cost/recall trade — so the test uses few, large cells
# (N_CELLS=4); everything is deterministic under the fixed seed
# (Spark-measured: whitened drops 72/80 twins, raw 45/80).
DIM = 64
N_BASE = 80
TH = 0.9
N_CELLS = 4


def _anisotropic_corpus(spark):
    """N_BASE base vectors + one twin each. dims 1..15: unit-ish base
    signal (twin = base * 1.001); dim 0: a dominant-direction magnitude
    drawn independently per vector (variance >> signal variance), which
    dilutes raw cosine between twins and inflates it between strangers.
    """
    rng = random.Random(7)
    rows = []
    for i in range(N_BASE):
        base = [rng.uniform(-1, 1) for _ in range(DIM - 1)]
        m_i = rng.uniform(0.0, 10.0)
        m_j = rng.uniform(0.0, 10.0)
        rows.append((i, [m_i] + base))
        rows.append(
            (N_BASE + i, [m_j] + [x * 1.001 for x in base])
        )
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).localCheckpoint()


def _twin_hits(verdicts):
    """Twins whose verdict points (directly) at a smaller id — the
    planted pair structure makes dup_of == twin's own base or a
    transitive smaller member."""
    return {
        r["vec_id"]
        for r in verdicts.collect()
        if r["vec_id"] >= N_BASE and not r["kept"]
    }


class TestWhitenedSemanticDedup:
    def test_whitened_catches_anisotropy_hidden_twins(self, spark):
        vecs = _anisotropic_corpus(spark)
        raw = similarity.semantic_dedup(vecs, threshold=TH, n_cells=N_CELLS)
        white = similarity.whitened_semantic_dedup(
            vecs, threshold=TH, n_cells=N_CELLS
        )
        raw_hits = _twin_hits(raw)
        white_hits = _twin_hits(white)
        # the published-SemDeDup claim: whitening never loses twins on
        # this corpus and (by construction) recovers ones raw cosine
        # dilutes — strictly more, or the planting failed
        assert len(white_hits) >= int(0.85 * N_BASE)
        assert len(white_hits) > len(raw_hits)

    def test_verdicts_deterministic(self, spark):
        vecs = _anisotropic_corpus(spark)
        a = sorted(map(tuple, similarity.whitened_semantic_dedup(
            vecs, threshold=TH, n_cells=N_CELLS).collect()))
        b = sorted(map(tuple, similarity.whitened_semantic_dedup(
            vecs, threshold=TH, n_cells=N_CELLS).collect()))
        assert a == b

    def test_incremental_equals_full_under_frozen_model(
        self, spark, tmp_path
    ):
        vecs = _anisotropic_corpus(spark)
        corpus = vecs.filter(F.col("vec_id") < N_BASE)
        batch = vecs.filter(F.col("vec_id") >= N_BASE)
        idx = str(tmp_path / "white_idx")
        build_whitened_ivf_pq_index(
            corpus, idx, n_cells=4, m=4, codes=8, pq_train_limit=None
        )

        got = incremental_semantic_dedup_whitened(
            corpus, batch, idx, threshold=TH
        )
        # full twin: project EVERYTHING under the frozen (corpus-
        # trained) model, semantic_dedup with the index's centroids,
        # restrict to the batch — the decomposition contract
        model = load_whitening(idx)
        proj = similarity.pca_project(
            vecs, model[0], model[1], model[2]
        ).select("vec_id", F.col("projected").alias("embedding"))
        cents = spark.read.parquet(f"{idx}/centroids")
        want = similarity.semantic_dedup(
            proj, threshold=TH, centroids=cents
        ).filter(F.col("vec_id") >= N_BASE)
        rows = lambda df: sorted(  # noqa: E731
            (r["vec_id"], r["cell_id"], r["kept"], r["dup_of"])
            for r in df.collect()
        )
        assert rows(got) == rows(want)
        # non-triviality floor: a healthy share of twins must be
        # caught (the binding loss is cell splits — trained cells in
        # the whitened space split more than the one-shot test's
        # seeded 4-cell layout; the EQUALITY above is the contract)
        assert len(_twin_hits(got)) >= int(0.3 * N_BASE)

    def test_corpus_projected_state_path_matches_inline(
        self, spark, tmp_path
    ):
        vecs = _anisotropic_corpus(spark)
        corpus = vecs.filter(F.col("vec_id") < N_BASE)
        batch = vecs.filter(F.col("vec_id") >= N_BASE)
        idx = str(tmp_path / "white_idx_proj")
        build_whitened_ivf_pq_index(
            corpus, idx, n_cells=8, m=4, codes=8, pq_train_limit=None
        )
        inline = incremental_semantic_dedup_whitened(
            corpus, batch, idx, threshold=TH
        )
        # the 100 TB daily shape: standing PROJECTED vectors persisted
        # as state; pass them with corpus_projected=True
        model = load_whitening(idx)
        proj_path = str(tmp_path / "projected_state")
        similarity.pca_project(
            corpus, model[0], model[1], model[2]
        ).select("vec_id", F.col("projected").alias("embedding")).write.parquet(
            proj_path
        )
        state = incremental_semantic_dedup_whitened(
            spark.read.parquet(proj_path),
            batch,
            idx,
            threshold=TH,
            corpus_projected=True,
        )
        rows = lambda df: sorted(  # noqa: E731
            (r["vec_id"], r["kept"], r["dup_of"]) for r in df.collect()
        )
        assert rows(inline) == rows(state)
        # corpus=None (the r11 daily default) reads the index's OWN
        # projected/ state table — build maintains it, so no caller-
        # side projection bookkeeping at all
        assert rows(inline) == rows(
            incremental_semantic_dedup_whitened(
                None, batch, idx, threshold=TH
            )
        )

    def test_append_refuses_index_without_projected_state(
        self, spark, tmp_path
    ):
        # a whitened index built before projected/ became state (r11)
        # has packed codes only — projected vectors cannot be
        # reconstructed, and appending beside the missing batch=0
        # would make corpus=None dedup silently skip the pre-upgrade
        # corpus; the append must refuse loudly instead
        import shutil

        import pytest

        vecs = _anisotropic_corpus(spark)
        corpus = vecs.filter(F.col("vec_id") < N_BASE)
        batch = vecs.filter(F.col("vec_id") >= N_BASE)
        idx = str(tmp_path / "white_idx_pre_r11")
        build_whitened_ivf_pq_index(
            corpus, idx, n_cells=8, m=4, codes=8, pq_train_limit=None
        )
        shutil.rmtree(f"{idx}/projected")  # simulate the pre-r11 layout
        with pytest.raises(ValueError, match="projected/batch=0"):
            append_to_whitened_ivf_index(batch, idx, batch_id=1)

    def test_verdict_stable_across_own_append_and_replay(
        self, spark, tmp_path
    ):
        vecs = _anisotropic_corpus(spark)
        corpus = vecs.filter(F.col("vec_id") < N_BASE)
        batch = vecs.filter(F.col("vec_id") >= N_BASE)
        idx = str(tmp_path / "white_idx_replay")
        build_whitened_ivf_pq_index(
            corpus, idx, n_cells=8, m=4, codes=8, pq_train_limit=None
        )
        rows = lambda df: sorted(  # noqa: E731
            (r["vec_id"], r["kept"], r["dup_of"]) for r in df.collect()
        )
        v1 = rows(incremental_semantic_dedup_whitened(
            corpus, batch, idx, threshold=TH))
        append_to_whitened_ivf_index(batch, idx, batch_id=1)
        v2 = rows(incremental_semantic_dedup_whitened(
            corpus, batch, idx, threshold=TH))
        assert v1 == v2
        # replay of the append itself: skip_indexed absorbs it
        append_to_whitened_ivf_index(batch, idx, batch_id=1)
        v3 = rows(incremental_semantic_dedup_whitened(
            corpus, batch, idx, threshold=TH))
        assert v1 == v3
