"""Streaming twin of the composed day-2 pipeline
(streaming/day2_stream.start_day2_stream): a drained stream over
day-files must equal the hand-driven batch calls BIT-FOR-BIT across
every state table, and a full re-delivery replay (fresh checkpoint
over the same files) must change nothing — the verdict-r10 task #5
contract. Uses run_day2_ingest + the public stream entry only (no
test-private plumbing)."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from etl_data_warehouse_spark.plans.day2_pipeline import run_day2_ingest
from etl_data_warehouse_spark.sources.generators import (
    generate_clustered_embeddings,
    generate_documents,
)
from etl_data_warehouse_spark.streaming.day2_stream import start_day2_stream

N = 120
DAY_SPLIT = 60
CFG = dict(
    domain_cap=3,
    num_hashes=64,
    bands=32,
    shingle_n=3,
    jaccard_threshold=0.8,
    cosine_threshold=0.95,
    n_cells=8,
    m=4,
    codes=8,
    n_shards=4,
    pack_budget=64,
)


def _corpus(spark):
    day_src = F.when(F.col("doc_id") < DAY_SPLIT, "day1src").otherwise(
        "day2src"
    )
    docs = generate_documents(spark, N, n_words=40, dup_rate=0.15).withColumn(
        "source", day_src
    )
    vecs = generate_clustered_embeddings(
        spark, N, dim=16, n_clusters=40, noise=0.01
    ).select("vec_id", "embedding")
    return docs.localCheckpoint(), vecs.localCheckpoint()


def _write_day_file(df, input_dir: str, name: str, mtime: int) -> None:
    """One day's docs as exactly ONE parquet file with a pinned mod
    time — the file source delivers oldest-first, so mtimes define the
    day order deterministically."""
    tmp = os.path.join(input_dir, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(input_dir, name)
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def _tree_rows(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.option("basePath", path).parquet(path).collect()
    )


_STATE_TABLES = ("shards", "clean_documents", "curated")


def _state_snapshot(spark, state_dir):
    from etl_data_warehouse_spark.operators.cluster_index import (
        read_clusters,
    )

    snap = {
        t: _tree_rows(spark, os.path.join(state_dir, t))
        for t in _STATE_TABLES
    }
    mapping = read_clusters(spark, os.path.join(state_dir, "clusters"))
    snap["clusters"] = (
        sorted(tuple(r) for r in mapping.collect())
        if mapping is not None
        else None
    )
    return snap


class TestDay2Stream:
    def test_drained_stream_equals_batch_calls_and_replay_noop(
        self, spark, tmp_path
    ):
        docs, vecs = _corpus(spark)
        input_dir = str(tmp_path / "drop")
        os.makedirs(input_dir)
        vectors_dir = str(tmp_path / "vectors")
        vecs.write.parquet(vectors_dir)
        s_state = str(tmp_path / "s_state")
        ckpt = str(tmp_path / "ckpt")

        # day 1 lands; the stream drains it (epoch 0 -> batch_id 1)
        _write_day_file(
            docs.filter(F.col("doc_id") < DAY_SPLIT),
            input_dir,
            "day1.parquet",
            mtime=1_000_000_000,
        )
        start_day2_stream(
            spark, input_dir, vectors_dir, s_state, ckpt,
            max_files=1, **CFG,
        ).awaitTermination(300)

        # day 2 lands; a RESTART under the same checkpoint resumes
        # incrementally — only the new file is processed (epoch 1 ->
        # batch_id 2), the operational daily cadence
        _write_day_file(
            docs.filter(F.col("doc_id") >= DAY_SPLIT),
            input_dir,
            "day2.parquet",
            mtime=1_000_000_060,
        )
        start_day2_stream(
            spark, input_dir, vectors_dir, s_state, ckpt,
            max_files=1, **CFG,
        ).awaitTermination(300)

        # batch twin: the same days through run_day2_ingest by hand
        b_state = str(tmp_path / "b_state")
        for bid, flt in (
            (1, F.col("doc_id") < DAY_SPLIT),
            (2, F.col("doc_id") >= DAY_SPLIT),
        ):
            d = docs.filter(flt)
            v = vecs.join(
                d.select(F.col("doc_id").alias("vec_id")),
                "vec_id",
                "left_semi",
            )
            run_day2_ingest(d, v, b_state, batch_id=bid, **CFG)

        got = _state_snapshot(spark, s_state)
        want = _state_snapshot(spark, b_state)
        for t in got:
            assert got[t] == want[t], f"state table {t} diverged"
        # index state too (bands/shingles content is set-equal; files
        # may split differently, rows must not)
        for sub in ("bands", "shingles"):
            assert _tree_rows(
                spark, os.path.join(s_state, "minhash_index", sub)
            ) == _tree_rows(
                spark, os.path.join(b_state, "minhash_index", sub)
            )

        # re-drain under the SAME checkpoint with nothing new: no-op
        # (the checkpoint owns the processed files — see the module
        # docstring for why the checkpoint must never be wiped)
        start_day2_stream(
            spark, input_dir, vectors_dir, s_state, ckpt,
            max_files=1, **CFG,
        ).awaitTermination(300)
        assert _state_snapshot(spark, s_state) == got

    def test_containment_arm_stream_equals_batch(self, spark, tmp_path):
        """Stream parity WITH the containment arm on (r12 task #4):
        drained stream == hand-driven batch bit-for-bit across the base
        state tables AND the containment state (sketches/df/stops,
        oriented containment_drops) — including the dethrone path: a
        day-1 snippet whose superset arrives in day 2's file. Bespoke
        corpus (no planted near-dups, per-vector clusters, uncapped
        domains) so the planted containment pair deterministically
        reaches the arm — the test_day2_pipeline snippet-then-superset
        construction."""
        docs = generate_documents(
            spark, N, n_words=40, dup_rate=0.0
        ).withColumn(
            "source",
            F.when(
                F.col("doc_id") < DAY_SPLIT, "day1src"
            ).otherwise("day2src"),
        )
        vecs = generate_clustered_embeddings(
            spark, N, dim=16, n_clusters=N, noise=0.001
        ).select("vec_id", "embedding").localCheckpoint()
        snip_src = docs.filter(F.col("doc_id") == 110).select(
            F.lit(15).alias("doc_id"),
            F.array_join(
                F.slice(F.split(F.trim("text"), " +"), 1, 22), " "
            ).alias("snip_text"),
        )
        docs = (
            docs.join(F.broadcast(snip_src), "doc_id", "left")
            .withColumn("text", F.coalesce("snip_text", "text"))
            .drop("snip_text")
            .localCheckpoint()
        )
        cfg = dict(CFG, domain_cap=10**6, containment=True)
        input_dir = str(tmp_path / "ct_drop")
        os.makedirs(input_dir)
        vectors_dir = str(tmp_path / "ct_vectors")
        vecs.write.parquet(vectors_dir)
        s_state = str(tmp_path / "ct_s_state")
        ckpt = str(tmp_path / "ct_ckpt")

        for name, mtime, flt in (
            ("day1.parquet", 1_000_000_000, F.col("doc_id") < DAY_SPLIT),
            ("day2.parquet", 1_000_000_060, F.col("doc_id") >= DAY_SPLIT),
        ):
            _write_day_file(docs.filter(flt), input_dir, name, mtime)
            start_day2_stream(
                spark, input_dir, vectors_dir, s_state, ckpt,
                max_files=1, **cfg,
            ).awaitTermination(300)

        b_state = str(tmp_path / "ct_b_state")
        audits = []
        for bid, flt in (
            (1, F.col("doc_id") < DAY_SPLIT),
            (2, F.col("doc_id") >= DAY_SPLIT),
        ):
            d = docs.filter(flt)
            v = vecs.join(
                d.select(F.col("doc_id").alias("vec_id")),
                "vec_id",
                "left_semi",
            )
            audits.append(run_day2_ingest(d, v, b_state, batch_id=bid, **cfg))

        # the planted dethrone actually ran: snippet 15 is named as a
        # containment drop (superset 110 arrived after it shipped)
        ct_dir = os.path.join(b_state, "containment_drops")
        assert 15 in {
            r["doc_id"]
            for r in spark.read.option("basePath", ct_dir)
            .parquet(ct_dir)
            .collect()
        }

        got = _state_snapshot(spark, s_state)
        want = _state_snapshot(spark, b_state)
        for t in got:
            assert got[t] == want[t], f"state table {t} diverged"
        for sub in (
            ("minhash_index", "bands"),
            ("minhash_index", "shingles"),
            ("containment_index", "sketches"),
            ("containment_index", "df"),
            ("containment_index", "stop_shingles"),
            ("containment_drops",),
        ):
            assert _tree_rows(
                spark, os.path.join(s_state, *sub)
            ) == _tree_rows(
                spark, os.path.join(b_state, *sub)
            ), f"containment state {sub} diverged"
