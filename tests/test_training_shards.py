"""Training-shard writer: reproducibility, exactly-once coverage,
packing math, and balance."""

from __future__ import annotations

import hashlib
import os

import pytest

from etl_data_warehouse_spark.sources.catalog import load_table
from etl_data_warehouse_spark.sources.shards import (
    pack_training_shards,
    shard_manifest,
    write_training_shards,
)

N_SHARDS = 8
BUDGET = 256


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "text"
    )


def _content_fingerprint(spark, path: str) -> dict[int, str]:
    rows = (
        spark.read.parquet(path)
        .select("shard", "doc_id", "chunk_offset")
        .collect()
    )
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(
            (r["doc_id"], r["chunk_offset"])
        )
    return {
        s: hashlib.md5(str(sorted(v)).encode()).hexdigest()
        for s, v in by_shard.items()
    }


class TestTrainingShards:
    def test_exactly_once_and_packing_math(self, spark, docs):
        packed = pack_training_shards(
            docs, n_shards=N_SHARDS, budget=BUDGET
        ).collect()
        assert len(packed) == docs.count()
        assert len({r["doc_id"] for r in packed}) == len(packed)
        by_shard: dict[int, list] = {}
        for r in packed:
            assert 0 <= r["shard"] < N_SHARDS
            by_shard.setdefault(r["shard"], []).append(r)
        for rows in by_shard.values():
            rows.sort(key=lambda r: (r["shuffle_pos"], r["doc_id"]))
            offset = 0
            for r in rows:
                assert r["chunk_offset"] == offset
                assert r["chunk_in_shard"] == offset // BUDGET
                assert r["offset_in_chunk"] == offset % BUDGET
                offset += r["n_tokens"]

    def test_write_reproducible_and_manifest(self, spark, docs, tmp_path):
        p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        m1 = write_training_shards(
            docs, p1, n_shards=N_SHARDS, budget=BUDGET
        ).collect()
        m2 = write_training_shards(
            docs, p2, n_shards=N_SHARDS, budget=BUDGET
        ).collect()
        assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
        assert _content_fingerprint(spark, p1) == _content_fingerprint(
            spark, p2
        )
        # manifest is derived from the WRITTEN data
        total_docs = sum(r["n_docs"] for r in m1)
        assert total_docs == docs.count()
        assert sorted(r["shard"] for r in m1) == sorted(
            {r["shard"] for r in m1}
        )
        again = shard_manifest(spark, p1).collect()
        assert [tuple(r) for r in again] == [tuple(r) for r in m1]
        # partition layout on disk: shard=N dirs, each readable alone
        dirs = {
            d for d in os.listdir(p1) if d.startswith("shard=")
        }
        assert len(dirs) == len(m1)
        one = spark.read.parquet(os.path.join(p1, "shard=0"))
        assert one.count() == next(
            r["n_docs"] for r in m1 if r["shard"] == 0
        )

    def test_overwrite_swap_idempotent(self, spark, docs, tmp_path):
        p = str(tmp_path / "s")
        write_training_shards(docs, p, n_shards=N_SHARDS, budget=BUDGET)
        fp = _content_fingerprint(spark, p)
        write_training_shards(docs, p, n_shards=N_SHARDS, budget=BUDGET)
        assert _content_fingerprint(spark, p) == fp

    def test_balance(self, docs):
        # md5 sharding: no shard should dwarf another (loose bound at
        # 500 docs / 8 shards; tightens with corpus size)
        rows = pack_training_shards(
            docs, n_shards=N_SHARDS, budget=BUDGET
        ).collect()
        tokens: dict[int, int] = {}
        for r in rows:
            tokens[r["shard"]] = tokens.get(r["shard"], 0) + r["n_tokens"]
        assert len(tokens) == N_SHARDS
        assert max(tokens.values()) < 3 * min(tokens.values())


class TestAppendTrainingBatch:
    def _split(self, docs):
        b0 = docs.filter("doc_id % 3 != 0")
        b1 = docs.filter("doc_id % 3 = 0")
        return b0, b1

    def test_packed_prefix_and_continuity(self, spark, docs, tmp_path):
        from pyspark.sql import functions as F
        from etl_data_warehouse_spark.sources.shards import (
            append_training_batch,
        )

        p = str(tmp_path / "inc")
        b0, b1 = self._split(docs)
        append_training_batch(b0, p, 0, n_shards=N_SHARDS, budget=BUDGET)
        before = {
            (r["shard"], r["doc_id"]): r["chunk_offset"]
            for r in spark.read.option("basePath", p).parquet(p).collect()
        }
        append_training_batch(b1, p, 1, n_shards=N_SHARDS, budget=BUDGET)
        allr = spark.read.option("basePath", p).parquet(p).collect()
        # packed prefix: batch-0 offsets unchanged by the append
        for r in allr:
            if r["batch"] == 0:
                assert before[(r["shard"], r["doc_id"])] == r["chunk_offset"]
        # continuity: per shard, offsets tile the stream with no gaps
        by_shard: dict[int, list] = {}
        for r in allr:
            by_shard.setdefault(r["shard"], []).append(r)
        for rows in by_shard.values():
            rows.sort(key=lambda r: r["chunk_offset"])
            off = 0
            for r in rows:
                assert r["chunk_offset"] == off
                assert r["chunk_in_shard"] == off // BUDGET
                off += r["n_tokens"]
        assert len(allr) == docs.count()

    def test_replay_and_recrawl_idempotent(self, spark, docs, tmp_path):
        from etl_data_warehouse_spark.sources.shards import (
            append_training_batch,
        )

        p = str(tmp_path / "inc")
        b0, b1 = self._split(docs)
        append_training_batch(b0, p, 0, n_shards=N_SHARDS, budget=BUDGET)
        append_training_batch(b1, p, 1, n_shards=N_SHARDS, budget=BUDGET)
        snap = sorted(
            tuple(r)
            for r in spark.read.option("basePath", p).parquet(p).collect()
        )
        # replay batch 1 (same content) — overwrite makes it a no-op
        append_training_batch(b1, p, 1, n_shards=N_SHARDS, budget=BUDGET)
        # re-crawl: batch 2 re-delivers batch 0's docs — all dropped,
        # so batch=2 commits as a marker-only dir with no data files
        append_training_batch(b0, p, 2, n_shards=N_SHARDS, budget=BUDGET)
        assert os.path.exists(os.path.join(p, "batch=2", "_COMMITTED"))
        assert not any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(os.path.join(p, "batch=2"))
            for f in fs
        )
        after = sorted(
            tuple(r)
            for r in spark.read.option("basePath", p).parquet(p).collect()
        )
        assert after == snap

    def test_partial_batch_blocks_append_until_replayed(
        self, spark, docs, tmp_path
    ):
        """ADVICE r7 (medium): offsets must be a pure function of
        COMMITTED predecessors. A crashed (uncommitted) batch blocks
        later appends; its replay completes it; offsets then match the
        crash-free run exactly."""
        from etl_data_warehouse_spark.sources.shards import (
            append_training_batch,
            committed_batches,
        )

        p, pref = str(tmp_path / "inc"), str(tmp_path / "ref")
        b0, b1 = self._split(docs)
        b2 = b0.limit(40)
        # crash-free reference run
        for i, b in enumerate([b0, b1]):
            append_training_batch(
                b, pref, i, n_shards=N_SHARDS, budget=BUDGET
            )
        # crashy run: batch 1 "crashes" after writing data, before commit
        append_training_batch(b0, p, 0, n_shards=N_SHARDS, budget=BUDGET)
        append_training_batch(b1, p, 1, n_shards=N_SHARDS, budget=BUDGET)
        os.remove(os.path.join(p, "batch=1", "_COMMITTED"))
        assert committed_batches(p) == [0]
        with pytest.raises(RuntimeError, match="uncommitted earlier"):
            append_training_batch(
                b2, p, 2, n_shards=N_SHARDS, budget=BUDGET
            )
        # replay batch 1 → completes + commits; content ≡ crash-free run
        append_training_batch(b1, p, 1, n_shards=N_SHARDS, budget=BUDGET)
        assert committed_batches(p) == [0, 1]
        assert _content_fingerprint(spark, p) == _content_fingerprint(
            spark, pref
        )
        # batch 2 now proceeds (all re-crawled ids drop — marker only)
        append_training_batch(b2, p, 2, n_shards=N_SHARDS, budget=BUDGET)
        assert committed_batches(p) == [0, 1, 2]

    def test_replay_after_later_batch_keeps_offsets(
        self, spark, docs, tmp_path
    ):
        """Replaying a committed batch AFTER later batches landed must
        reproduce identical offsets (base sums only id < batch_id)."""
        from etl_data_warehouse_spark.sources.shards import (
            append_training_batch,
        )

        p = str(tmp_path / "inc")
        b0, b1 = self._split(docs)
        append_training_batch(b0, p, 0, n_shards=N_SHARDS, budget=BUDGET)
        append_training_batch(b1, p, 1, n_shards=N_SHARDS, budget=BUDGET)
        snap = _content_fingerprint(spark, p)
        append_training_batch(b0, p, 0, n_shards=N_SHARDS, budget=BUDGET)
        assert _content_fingerprint(spark, p) == snap
