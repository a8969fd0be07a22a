"""CDC changelog application + weighted sampling operator semantics.

Oracle parity for q87/q88/q89 is covered by test_oracle_parity; these
pin the operator-level contracts (delete handling, ordering, snapshot
merge, sample determinism/plan shape) on hand-built inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators import cdc, sampling


def _changelog(spark):
    # key 1: U then U  -> survives with the later value
    # key 2: U then D  -> deleted
    # key 3: D then U  -> survives (delete is not final)
    # key 4: single D  -> deleted (never existed downstream)
    rows = [
        (1, 10, 1, 100.0, "U"),
        (1, 20, 2, 110.0, "U"),
        (2, 10, 3, 200.0, "U"),
        (2, 30, 4, None, "D"),
        (3, 10, 5, None, "D"),
        (3, 15, 6, 300.0, "U"),
        (4, 10, 7, None, "D"),
    ]
    return spark.createDataFrame(
        rows, "key bigint, ts bigint, change_id bigint, value double, op string"
    )


class TestApplyChangelog:
    def test_last_writer_wins_and_deletes(self, spark):
        state = cdc.apply_changelog(
            _changelog(spark), ["key"], ["ts", "change_id"]
        )
        got = {r["key"]: r for r in state.collect()}
        assert set(got) == {1, 3}
        assert got[1]["value"] == 110.0 and got[1]["ts"] == 20
        assert got[3]["value"] == 300.0 and got[3]["ts"] == 15
        assert got[1]["n_changes"] == 2 and got[3]["n_changes"] == 2

    def test_tiebreak_on_second_seq_col(self, spark):
        # Same ts: change_id decides.
        rows = [(1, 10, 1, 1.0, "U"), (1, 10, 2, 2.0, "U")]
        df = spark.createDataFrame(
            rows,
            "key bigint, ts bigint, change_id bigint, value double, op string",
        )
        state = cdc.apply_changelog(df, ["key"], ["ts", "change_id"])
        assert state.collect()[0]["value"] == 2.0


class TestSnapshotDiff:
    """snapshot_diff (q96 core): emits exactly the differences, and the
    derived changelog merged back onto the old snapshot reproduces the
    new snapshot (diff/apply round-trip inverse)."""

    def _snaps(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)],
            "key bigint, name string, value double",
        )
        new = spark.createDataFrame(
            # 1 unchanged, 2 value-changed, 3 removed, 5 added,
            # 4 changed-to-NULL (null-safe comparison must flag it)
            [(1, "a", 1.0), (2, "b", 9.0), (5, "e", 5.0), (4, "d", None)],
            "key bigint, name string, value double",
        )
        return old, new

    def test_emits_only_differences(self, spark):
        old, new = self._snaps(spark)
        got = {
            r["key"]: r
            for r in cdc.snapshot_diff(old, new, ["key"]).collect()
        }
        assert set(got) == {2, 3, 4, 5}
        assert got[2]["change_kind"] == "changed" and got[2]["op"] == "U"
        assert got[3]["change_kind"] == "removed" and got[3]["op"] == "D"
        assert got[4]["change_kind"] == "changed"
        assert got[4]["value"] is None
        assert got[5]["change_kind"] == "added" and got[5]["op"] == "U"

    def test_roundtrip_merge_recovers_new_snapshot(self, spark):
        old, new = self._snaps(spark)
        changes = (
            cdc.snapshot_diff(old, new, ["key"])
            .drop("change_kind")
            .withColumn("seq", F.lit(1))
            .select("key", "seq", "name", "value", "op")
        )
        recovered = cdc.merge_changelog(old, changes, ["key"], ["seq"])
        assert {
            (r["key"], r["name"], r["value"])
            for r in recovered.select("key", "name", "value").collect()
        } == {tuple(r) for r in new.collect()}

    def test_identical_snapshots_diff_empty(self, spark):
        old, _ = self._snaps(spark)
        assert cdc.snapshot_diff(old, old, ["key"]).count() == 0


class TestMergeChangelog:
    def test_snapshot_plus_batch(self, spark):
        snapshot = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (5, 5.0)], "key bigint, value double"
        )
        state = cdc.merge_changelog(
            snapshot, _changelog(spark), ["key"], ["ts", "change_id"]
        )
        got = {r["key"]: r["value"] for r in state.collect()}
        # 1 updated, 2 deleted, 3 inserted, 4 delete-no-op, 5 untouched.
        assert got == {1: 110.0, 3: 300.0, 5: 5.0}

    def test_snapshot_seq_wins_over_older_change(self, spark):
        # Snapshot retains its seq columns from a prior fold: a
        # late-arriving change OLDER than the snapshot row must lose.
        snapshot = spark.createDataFrame(
            [(1, 50, 99, 500.0)], "key bigint, ts bigint, change_id bigint, value double"
        )
        late = spark.createDataFrame(
            [(1, 20, 1, 111.0, "U")],
            "key bigint, ts bigint, change_id bigint, value double, op string",
        )
        state = cdc.merge_changelog(
            snapshot, late, ["key"], ["ts", "change_id"]
        )
        rows = state.collect()
        assert len(rows) == 1 and rows[0]["value"] == 500.0
        assert rows[0]["n_changes"] == 2


class TestWeightedSample:
    def _pop(self, spark):
        return spark.range(0, 500).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7 + 1).cast("double").alias("w"),
        )

    def test_size_and_determinism_under_repartition(self, spark):
        pop = self._pop(spark)
        a = sampling.weighted_sample_topk(pop, "w", 50)
        b = sampling.weighted_sample_topk(pop.repartition(13), "w", 50)
        ka = sorted(r["doc_id"] for r in a.collect())
        kb = sorted(r["doc_id"] for r in b.collect())
        assert len(ka) == 50 and ka == kb

    def test_nonpositive_weights_excluded(self, spark):
        pop = spark.range(0, 20).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 10, -1.0).otherwise(1.0).alias("w"),
        )
        got = sampling.weighted_sample_topk(pop, "w", 15).collect()
        assert all(r["doc_id"] >= 10 for r in got)
        assert len(got) == 10  # only 10 eligible rows exist

    def test_heavy_weight_always_selected(self, spark):
        pop = spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") == 7, 1e12).otherwise(1.0).alias("w"),
        )
        got = {r["doc_id"] for r in sampling.weighted_sample_topk(pop, "w", 5).collect()}
        assert 7 in got

    def test_incremental_stability(self, spark):
        # Adding rows never perturbs existing priorities: picks from the
        # smaller corpus survive unless out-ranked by a new row.
        pop = self._pop(spark)
        small = sampling.weighted_sample_topk(pop.filter("doc_id < 250"), "w", 50)
        big = sampling.weighted_sample_topk(pop, "w", 50)
        small_keys = {r["doc_id"] for r in small.collect()}
        big_keys = {r["doc_id"] for r in big.collect()}
        # Every pick the bigger corpus dropped was displaced by a NEW row.
        displaced = small_keys - big_keys
        newcomers = big_keys - small_keys
        assert len(displaced) == len(newcomers)
        assert all(k >= 250 for k in newcomers)

    def test_plan_is_take_ordered(self, spark):
        plan = sampling.weighted_sample_topk(
            self._pop(spark), "w", 50
        )._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
