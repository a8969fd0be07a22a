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

    def test_append_with_shared_shingles_identical(self, spark, tmp_path):
        # day-2's fused index_appends (r12 task #3): passing a
        # precomputed hashed_shingles frame must leave every state
        # table bit-identical to the compute-own path
        idx_a, days, _ = self._run_days(spark, tmp_path)
        idx_b = str(tmp_path / "ct_idx_shared")
        build_containment_index(days[1], idx_b, k=K, max_df=MAX_DF)
        for day in (2, 3):
            append_to_containment_index(
                days[day], idx_b, batch_id=day, k=K, max_df=MAX_DF,
                shingles=hashed_shingles(
                    days[day], 3
                ).localCheckpoint(),
            )
        for t in ("sketches", "df", "stop_shingles"):
            assert _rows(
                spark.read.option("basePath", f"{idx_a}/{t}")
                .parquet(f"{idx_a}/{t}")
            ) == _rows(
                spark.read.option("basePath", f"{idx_b}/{t}")
                .parquet(f"{idx_b}/{t}")
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

    def test_late_superset_recall_under_stop_drift(self, spark, tmp_path):
        """Cross-orientation recall calibration (r12 task #8): a
        standing doc's sketch is drawn at INDEX time (bottom-k of ALL
        its shingles, df-independent), but the standing-as-inner probe
        filters the batch postings with the CURRENT stop set — sketch
        hashes that became stops since indexing can no longer match.
        Plant day-1 inners whose boilerplate shingles cross max_df on
        day 2, then land their SUPERSETS on day 3: every planted pair
        must still be found (the inners keep >= 3 non-stop sketch
        hashes; zero misses at k=8, c = 1.0 >= 0.9), and the one
        degenerate inner (pure boilerplate — its entire sketch became
        stops) must be missed by BOTH the incremental probe and its
        one-shot contract twin, identically."""
        idx = str(tmp_path / "ct_idx_drift")
        # day 1: 25 normal docs (unique triple + boiler) + one PURE
        # boilerplate doc (id 1900) — its 4 shingles are exactly the
        # ones that will cross MAX_DF on day 2
        d1 = _day(spark, 1).unionByName(
            spark.createDataFrame(
                [(1900, BOILER)], "doc_id long, text string"
            )
        ).localCheckpoint()
        d2 = _day(spark, 2)  # pushes boiler df 26 -> 51 > MAX_DF
        # day 3: supersets of day-1 inners 0..9 (full text embedded,
        # extra unique words around it) + a superset of the pure-
        # boilerplate doc
        sup_rows = []
        for i in range(10):
            inner = 1000 + i
            sup_rows.append(
                (
                    3000 + i,
                    f"x{3000 + i}p x{3000 + i}q u{inner}a u{inner}b "
                    f"u{inner}c {BOILER} x{3000 + i}r x{3000 + i}s",
                )
            )
        sup_rows.append((3900, f"y3900a y3900b {BOILER} y3900c y3900d"))
        d3 = spark.createDataFrame(
            sup_rows, "doc_id long, text string"
        ).localCheckpoint()

        build_containment_index(d1, idx, k=K, max_df=MAX_DF)
        corpus = d1
        for day, batch in ((2, d2), (3, d3)):
            inc = incremental_containment(
                spark, batch, hashed_shingles(corpus, 3), idx,
                threshold=TH, k=K, max_df=MAX_DF, exclude_batch_id=day,
            )
            corpus = corpus.unionByName(batch).localCheckpoint()
            batch_ids = [r["doc_id"] for r in batch.collect()]
            got = _rows(inc)
            assert got == _rows(_oneshot_restricted(corpus, batch_ids))
            if day == 3:
                found = {
                    (r[0], r[1]): r for r in got
                }  # (inner, outer) -> row
                # zero misses: all 10 planted (standing inner, late
                # superset) pairs surface despite the stop drift, with
                # exact containment 1.0
                for i in range(10):
                    row = found.get((1000 + i, 3000 + i))
                    assert row is not None, f"missed inner {1000 + i}"
                    assert row[-1] == 1.0
                # the degenerate pure-boilerplate inner is missed by
                # both paths identically (its whole sketch is stops —
                # the documented max_df caveat), already pinned by the
                # inc == one-shot equality above; make it explicit:
                assert (1900, 3900) not in found
            append_to_containment_index(
                batch, idx, batch_id=day, k=K, max_df=MAX_DF
            )
