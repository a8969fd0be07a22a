"""Streaming CDC materializer == batch changelog fold (cdc_stream.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators import cdc
from etl_data_warehouse_spark.sources.catalog import load_table
from etl_data_warehouse_spark.streaming.cdc_stream import (
    read_cdc_state,
    start_cdc_stream,
)


def _changes_from_events(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    return events.select(
        F.col("user_id").alias("key"),
        F.unix_millis("ts").alias("ts"),
        F.col("event_id").alias("change_id"),
        "value",
        F.when(F.col("event_type") == "error", cdc.DELETE_OP)
        .otherwise(cdc.UPSERT_OP)
        .alias("op"),
    )


class TestSnapshotDurability:
    def test_failed_write_preserves_previous_snapshot(self, spark, tmp_path):
        # A new version is written BEFORE the pointer moves: a crash
        # mid-write must leave the previous snapshot fully readable.
        from etl_data_warehouse_spark.streaming import cdc_stream as cs

        snap = str(tmp_path / "snapshot")
        state1 = spark.createDataFrame(
            [(1, 10, 1, 1.0, "U")], "key long, ts long, change_id long,"
            " value double, op string"
        )
        cs._commit_snapshot(snap, 0, state1)
        before = {tuple(r) for r in cs._read_snapshot(spark, snap).collect()}

        # simulate a crash: version dir partially written, pointer NOT
        # moved (the failure mode is any exception before os.replace)
        import os as _os

        _os.makedirs(f"{snap}/v000000000001")
        with open(f"{snap}/v000000000001/part-garbage.parquet", "w") as fh:
            fh.write("not parquet")
        after = {tuple(r) for r in cs._read_snapshot(spark, snap).collect()}
        assert after == before

        # a successful commit swaps the pointer and GCs the old version
        state2 = spark.createDataFrame(
            [(2, 20, 2, 2.0, "U")], "key long, ts long, change_id long,"
            " value double, op string"
        )
        cs._commit_snapshot(snap, 2, state2)
        got = {r["key"] for r in cs._read_snapshot(spark, snap).collect()}
        assert got == {2}
        assert not _os.path.exists(f"{snap}/v000000000000")

    def test_missing_snapshot_reads_none_but_corrupt_raises(
        self, spark, tmp_path
    ):
        from etl_data_warehouse_spark.streaming import cdc_stream as cs

        snap = str(tmp_path / "nosnap")
        assert cs._read_snapshot(spark, snap) is None

        # a POINTED-AT version that cannot be read is corruption, not
        # "no snapshot": it must raise, never silently reset state
        import os as _os

        import pytest as _pytest

        _os.makedirs(f"{snap}/v000000000007")
        with open(f"{snap}/{cs._POINTER}", "w") as fh:
            fh.write("v000000000007")
        with _pytest.raises(Exception):
            cs._read_snapshot(spark, snap).collect()

    def test_replay_of_committed_batch_does_not_wedge(self, spark, tmp_path):
        # At-least-once window: the snapshot commit swapped the pointer
        # but the stream checkpoint did not record the batch. The replay
        # re-merges reading FROM the pointed dir and re-commits the SAME
        # batch_id — this must not target the dir being read (Spark's
        # "Cannot overwrite a path that is also being read from").
        from etl_data_warehouse_spark.streaming import cdc_stream as cs

        snap = str(tmp_path / "snapshot_replay")
        state1 = spark.createDataFrame(
            [(1, 10, 1, 1.0, "U")], "key long, ts long, change_id long,"
            " value double, op string"
        )
        first_dir = cs._commit_snapshot(snap, 0, state1)

        # replayed merge plan reads the pointed snapshot lazily
        replayed = cs._read_snapshot(spark, snap).withColumn(
            "value", F.col("value") + 0.0
        )
        second_dir = cs._commit_snapshot(snap, 0, replayed)
        assert second_dir != first_dir  # uniquified, never overwritten
        got = {tuple(r) for r in cs._read_snapshot(spark, snap).collect()}
        assert got == {(1, 10, 1, 1.0, "U")}
        import os as _os

        assert not _os.path.exists(first_dir)  # superseded version GC'd

    def test_unpointed_data_raises_but_staging_debris_is_ignored(
        self, spark, tmp_path
    ):
        # Data with NO pointer is a lost pointer / foreign layout, not
        # "no snapshot yet" — silently rebuilding from the current batch
        # would reset state. Only in-flight .tmp- staging is benign.
        from etl_data_warehouse_spark.streaming import cdc_stream as cs

        import os as _os

        import pytest as _pytest

        snap = str(tmp_path / "snap_unpointed")
        _os.makedirs(f"{snap}/v000000000003")
        with _pytest.raises(RuntimeError, match="no _CURRENT pointer"):
            cs._read_snapshot(spark, snap)

        snap2 = str(tmp_path / "snap_staging")
        _os.makedirs(f"{snap2}/.tmp-v000000000000")
        assert cs._read_snapshot(spark, snap2) is None


class TestCdcStream:
    def test_streaming_equals_batch_fold(self, spark, sf_dir, tmp_path):
        changes = _changes_from_events(spark, sf_dir)
        input_dir = str(tmp_path / "in")
        snap = str(tmp_path / "snapshot")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)

        expected = {
            (r["key"], r["ts"], r["change_id"], r["value"])
            for r in cdc.apply_changelog(
                changes, ["key"], ["ts", "change_id"]
            ).collect()
        }
        assert expected

        # Two time-ordered microbatch runs — the CDC arrival pattern.
        cut = changes.agg(F.expr("percentile(ts, 0.5)")).first()[0]
        for pred in [F.col("ts") <= cut, F.col("ts") > cut]:
            changes.filter(pred).coalesce(1).write.mode("append").parquet(
                input_dir
            )
            q = start_cdc_stream(spark, input_dir, snap, ckpt)
            q.awaitTermination(120)

        got = {
            (r["key"], r["ts"], r["change_id"], r["value"])
            for r in read_cdc_state(spark, snap).collect()
        }
        assert got == expected

    def test_out_of_order_batches_converge(self, spark, sf_dir, tmp_path):
        # LATE batch arrives second: older changes must not clobber
        # newer snapshot rows (seq ordering, not arrival ordering).
        changes = _changes_from_events(spark, sf_dir)
        input_dir = str(tmp_path / "in")
        snap = str(tmp_path / "snapshot")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)

        expected = {
            (r["key"], r["ts"], r["change_id"], r["value"])
            for r in cdc.apply_changelog(
                changes, ["key"], ["ts", "change_id"]
            ).collect()
        }
        cut = changes.agg(F.expr("percentile(ts, 0.5)")).first()[0]
        for pred in [F.col("ts") > cut, F.col("ts") <= cut]:  # newest first
            changes.filter(pred).coalesce(1).write.mode("append").parquet(
                input_dir
            )
            q = start_cdc_stream(spark, input_dir, snap, ckpt)
            q.awaitTermination(120)

        got = {
            (r["key"], r["ts"], r["change_id"], r["value"])
            for r in read_cdc_state(spark, snap).collect()
        }
        assert got == expected


class TestSnapshotTimeTravel:
    def test_retention_window_and_versioned_reads(self, spark, tmp_path):
        from etl_data_warehouse_spark.streaming import cdc_stream as cs

        snap = str(tmp_path / "snap_tt")

        def _state(key, val):
            return spark.createDataFrame(
                [(key, 10, 1, val, "U")],
                "key long, ts long, change_id long, value double, op string",
            )

        cs._commit_snapshot(snap, 0, _state(1, 1.0), retain_versions=2)
        cs._commit_snapshot(snap, 1, _state(2, 2.0), retain_versions=2)
        cs._commit_snapshot(snap, 2, _state(3, 3.0), retain_versions=2)

        versions = cs.list_snapshot_versions(snap)
        assert versions == ["v000000000001", "v000000000002"]  # v0 GC'd

        # default read = current; versioned read = time travel
        assert {r["key"] for r in cs.read_cdc_state(spark, snap).collect()} == {3}
        assert {
            r["key"]
            for r in cs.read_cdc_state(
                spark, snap, version="v000000000001"
            ).collect()
        } == {2}

        # asking for the GC'd version is an explicit error
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError, match="not retained"):
            cs.read_cdc_state(spark, snap, version="v000000000000")

    def test_replay_suffix_order_survives_double_digit_retries(self):
        from etl_data_warehouse_spark.streaming import cdc_stream as cs

        # lexicographic would put '-r10' before '-r2'; the parsed key
        # must not
        names = ["v000000000003-r10", "v000000000003-r2", "v000000000003"]
        assert sorted(names, key=cs._version_sort_key) == [
            "v000000000003",
            "v000000000003-r2",
            "v000000000003-r10",
        ]
        # batch id dominates retry
        assert cs._version_sort_key("v000000000004") > cs._version_sort_key(
            "v000000000003-r99"
        )

    def test_unpointed_newer_version_excluded_from_time_travel(
        self, spark, tmp_path
    ):
        """A v* dir newer than the pointer target is a crash artifact
        (rename done, pointer swap not): it was never committed and
        must not appear in the time-travel list nor be readable as a
        'retained' version."""
        from etl_data_warehouse_spark.streaming import cdc_stream as cs

        snap = str(tmp_path / "snap_crash")
        state = spark.createDataFrame(
            [(1, 10, 1, 1.0, "U")],
            "key long, ts long, change_id long, value double, op string",
        )
        cs._commit_snapshot(snap, 0, state, retain_versions=5)
        cs._commit_snapshot(snap, 1, state, retain_versions=5)
        # simulate crash-after-rename-before-pointer-swap for batch 2
        orphan = os.path.join(snap, "v000000000002")
        state.write.mode("overwrite").parquet(orphan)

        versions = cs.list_snapshot_versions(snap)
        assert versions == ["v000000000000", "v000000000001"]
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError, match="not retained"):
            cs.read_cdc_state(spark, snap, version="v000000000002")
        # current read still serves the pointed-at committed version
        assert cs.read_cdc_state(spark, snap).count() == 1

    def test_orphan_stays_uncommitted_after_batch_replays(
        self, spark, tmp_path
    ):
        """ADVICE r7: with sort-key<=pointer inference, a crash-orphan
        v{B} became 'committed' retroactively once batch B replayed and
        committed v{B}-r1 ((B,0) <= (B,1)). The explicit commit log
        must keep the never-pointed orphan out — and GC it."""
        from etl_data_warehouse_spark.streaming import cdc_stream as cs

        snap = str(tmp_path / "snap_orphan_replay")
        state = spark.createDataFrame(
            [(1, 10, 1, 1.0, "U")],
            "key long, ts long, change_id long, value double, op string",
        )
        cs._commit_snapshot(snap, 0, state, retain_versions=5)
        # batch 1 crashes after rename, before pointer swap
        orphan = os.path.join(snap, "v000000000001")
        state.write.mode("overwrite").parquet(orphan)
        assert cs.list_snapshot_versions(snap) == ["v000000000000"]
        # batch 1 replays: the orphan name exists, so it commits as -r1
        d = cs._commit_snapshot(snap, 1, state, retain_versions=5)
        assert d.endswith("v000000000001-r1")
        versions = cs.list_snapshot_versions(snap)
        assert versions == ["v000000000000", "v000000000001-r1"]
        assert "v000000000001" not in versions
        # the orphan was garbage-collected by the commit
        assert not os.path.exists(orphan)
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError, match="not retained"):
            cs.read_cdc_state(spark, snap, version="v000000000001")
