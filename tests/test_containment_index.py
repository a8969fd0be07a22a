"""Persisted containment index (operators/containment_index): per-day
incremental verdicts == the one-shot
containment_pairs_indexed(corpus-as-of-day, sketch_df_filter=False)
restricted to the batch, bit-for-bit — including a corpus where a stop
shingle crosses max_df mid-stream; append idempotency under replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.containment_index import (
    append_to_containment_index,
    build_containment_index,
    incremental_containment,
    register_containment_tables,
)
from etl_data_warehouse_spark.operators.dedup import (
    containment_pairs_indexed,
    hashed_shingles,
)

BOILER = "the quick brown fox jumps lazy"  # 4 shingles shared corpus-wide
MAX_DF = 30
K = 8
TH = 0.9


def _day(spark, day, n=25, with_boiler=True, dups_of=()):
    """Day `day` batch: doc_ids in [1000*day, 1000*day + n); every doc
    carries the boilerplate suffix (df of its shingles grows by n per
    day — crosses MAX_DF=30 during day 2); `dups_of` plants exact
    copies of earlier docs under new ids (true containment-1.0 pairs
    in both orientations, carried by rare shingles)."""
    rows = []
    for i in range(n):
        did = 1000 * day + i
        suffix = f" {BOILER}" if with_boiler else ""
        rows.append((did, f"u{did}a u{did}b u{did}c{suffix}"))
    for j, (src_day, src_i) in enumerate(dups_of):
        src = 1000 * src_day + src_i
        suffix = f" {BOILER}" if with_boiler else ""
        rows.append(
            (1000 * day + 500 + j, f"u{src}a u{src}b u{src}c{suffix}")
        )
    return spark.createDataFrame(
        rows, "doc_id long, text string"
    ).localCheckpoint()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _oneshot_restricted(corpus, batch_ids, **kw):
    """The as-of-day one-shot twin, restricted to pairs involving the
    batch."""
    pairs = containment_pairs_indexed(
        corpus, threshold=TH, k=K, max_df=MAX_DF,
        sketch_df_filter=False, **kw,
    )
    return pairs.filter(
        F.col("doc_inner").isin(batch_ids)
        | F.col("doc_outer").isin(batch_ids)
    )


class TestContainmentIndex:
    def _run_days(self, spark, tmp_path, buckets=None, prefix=None):
        idx = str(tmp_path / "ct_idx")
        d1 = _day(spark, 1)
        d2 = _day(spark, 2, dups_of=[(1, 3), (1, 7)])
        d3 = _day(spark, 3, dups_of=[(2, 5), (1, 3)])
        days = {1: d1, 2: d2, 3: d3}

        build_containment_index(
            d1, idx, k=K, max_df=MAX_DF,
            buckets=buckets, table_prefix=prefix,
        )
        corpus = d1
        for day in (2, 3):
            batch = days[day]
            if buckets:
                register_containment_tables(spark, idx, prefix, buckets)
            inc = incremental_containment(
                spark,
                batch,
                hashed_shingles(corpus, 3),
                idx,
                threshold=TH,
                k=K,
                max_df=MAX_DF,
                sketches_table=f"{prefix}_ctsketches" if prefix else None,
                df_table=f"{prefix}_ctdf" if prefix else None,
                exclude_batch_id=day,
            )
            corpus = corpus.unionByName(batch).localCheckpoint()
            batch_ids = [r["doc_id"] for r in batch.collect()]
            want = _rows(_oneshot_restricted(corpus, batch_ids))
            got = _rows(inc)
            assert got == want, f"day {day}: {got} != {want}"
            assert len(got) >= 2  # the planted dup pairs surfaced
            append_to_containment_index(
                batch, idx, batch_id=day, k=K, max_df=MAX_DF,
                buckets=buckets, table_prefix=prefix,
            )
        return idx, days, corpus

    def test_daily_equals_asof_oneshot_plain(self, spark, tmp_path):
        # the boilerplate shingles (df 25 after day 1) cross MAX_DF=30
        # during day 2 — the as-of-day stop set and the one-shot's df
        # filter must apply the identical predicate on both days
        self._run_days(spark, tmp_path)

    def test_daily_equals_asof_oneshot_bucketed(self, spark, tmp_path):
        spark.sql("DROP TABLE IF EXISTS tci_ctsketches")
        spark.sql("DROP TABLE IF EXISTS tci_ctdf")
        self._run_days(spark, tmp_path, buckets=4, prefix="tci")

    def test_append_replay_is_idempotent(self, spark, tmp_path):
        idx, days, corpus = self._run_days(spark, tmp_path)
        batch = days[3]
        before = {
            t: _rows(spark.read.parquet(f"{idx}/{t}"))
            for t in ("sketches", "df")
        }
        # replay day 3's append: the sketch-table guard must absorb it
        append_to_containment_index(
            batch, idx, batch_id=3, k=K, max_df=MAX_DF
        )
        after = {
            t: _rows(spark.read.parquet(f"{idx}/{t}"))
            for t in ("sketches", "df")
        }
        assert before == after
        # and the probe AFTER the append still returns day-3's verdicts
        # (postings/df/sketches state masked via exclude_batch_id +
        # batch-id anti-joins)
        standing = corpus.join(
            batch.select("doc_id"), "doc_id", "left_anti"
        )
        inc = incremental_containment(
            spark, batch, hashed_shingles(standing, 3), idx,
            threshold=TH, k=K, max_df=MAX_DF, exclude_batch_id=3,
        )
        batch_ids = [r["doc_id"] for r in batch.collect()]
        assert _rows(inc) == _rows(
            _oneshot_restricted(corpus, batch_ids)
        )

    def test_stop_crossing_recorded_once(self, spark, tmp_path):
        idx, days, corpus = self._run_days(spark, tmp_path)
        stops = (
            spark.read.option("basePath", f"{idx}/stop_shingles")
            .parquet(f"{idx}/stop_shingles")
        )
        rows = stops.groupBy("batch").count().collect()
        by_batch = {r["batch"]: r["count"] for r in rows}
        # 4 boilerplate shingles cross 30 on day 2 (25 + 25 = 50),
        # never earlier, never re-recorded later
        assert by_batch.get(2) == 4
        assert by_batch.get(0, 0) == 0 and by_batch.get(1, 0) == 0
        assert by_batch.get(3, 0) == 0
        # every stop shingle appears in exactly one partition
        dup = (
            stops.groupBy("shingle")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dup == 0
