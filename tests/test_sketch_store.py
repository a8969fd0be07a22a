"""Persisted sketch panel (operators/sketch_store.py): appended state
must equal a fresh full-feed rebuild bit-for-bit, panel rollups must
equal direct one-pass builds over the raw events, and replay must be
idempotent — the same contracts as the LSH/ANN/LM persisted stores."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators.sketch_store import (
    _panel_slices,
    append_sketch_batch,
    build_sketch_store,
    load_panel,
    panel_distinct,
    panel_frequency,
    panel_quantiles,
)
from etl_data_warehouse_spark.operators.sketches import (
    _utc_day,
    hll_estimate_corrected,
    hll_merge_registers,
)
from etl_data_warehouse_spark.sources.catalog import load_table


def _split(events):
    a = events.filter(F.col("event_id") % 3 != 0)
    b = events.filter(F.col("event_id") % 3 == 0)
    return a, b


def _state_sets(spark, store_dir):
    panel = load_panel(spark, store_dir)
    return {
        "hll": {
            (r["day"], r["hll_idx"]): r["m_j"]
            for r in panel["hll"].collect()
        },
        "cm": {
            (r["day"], r["cm_row"], r["cm_pos"]): r["c"]
            for r in panel["cm"].collect()
        },
        "qhist": {
            (r["day"], r["bucket"]): r["n"]
            for r in panel["qhist"].collect()
        },
    }


class TestSketchStore:
    def test_append_equals_rebuild_bit_for_bit(
        self, spark, sf_dir, tmp_path
    ):
        events = load_table(spark, "events", sf_dir)
        a, b = _split(events)
        inc = str(tmp_path / "inc")
        full = str(tmp_path / "full")
        build_sketch_store(a, inc)
        append_sketch_batch(b, inc, batch_id=1)
        build_sketch_store(events, full)
        assert _state_sets(spark, inc) == _state_sets(spark, full)

    def test_replay_is_idempotent(self, spark, sf_dir, tmp_path):
        events = load_table(spark, "events", sf_dir)
        a, b = _split(events)
        store = str(tmp_path / "s")
        build_sketch_store(a, store)
        append_sketch_batch(b, store, batch_id=1)
        before = _state_sets(spark, store)
        append_sketch_batch(b, store, batch_id=1)  # replay
        assert _state_sets(spark, store) == before

    def test_hll_immune_to_slice_redelivery_counts_are_not(
        self, spark, sf_dir, tmp_path
    ):
        events = load_table(spark, "events", sf_dir)
        a, b = _split(events)
        store = str(tmp_path / "s")
        build_sketch_store(a, store)
        append_sketch_batch(b, store, batch_id=1)
        before = _state_sets(spark, store)
        # slice b delivered AGAIN under a new batch id (feed bug)
        append_sketch_batch(b, store, batch_id=2)
        after = _state_sets(spark, store)
        assert after["hll"] == before["hll"]  # MAX is idempotent
        assert after["cm"] != before["cm"]  # SUM is not — pinned
        assert after["qhist"] != before["qhist"]

    def test_panel_distinct_equals_direct_build(
        self, spark, sf_dir, tmp_path
    ):
        events = load_table(spark, "events", sf_dir)
        a, b = _split(events)
        store = str(tmp_path / "s")
        build_sketch_store(a, store)
        append_sketch_batch(b, store, batch_id=1)
        month = F.date_trunc("month", F.col("day"))
        got = {
            (r["month"], r["sketch_sum"], r["hll_estimate"])
            for r in panel_distinct(
                spark, store, month, "month"
            ).collect()
        }
        direct = hll_estimate_corrected(
            hll_merge_registers(
                _panel_slices(events)["hll"].select(
                    month.alias("month"), "hll_idx", "m_j"
                ),
                ["month"],
            ),
            ["month"],
        )
        exp = {
            (r["month"], r["sketch_sum"], r["hll_estimate"])
            for r in direct.collect()
        }
        assert got == exp
        # and the estimate is actually accurate at this SF
        exact = {
            r["month"]: r["n"]
            for r in events.groupBy(
                F.date_trunc(
                    "month", _utc_day("ts").cast("timestamp")
                ).alias("month")
            )
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        for month_v, _, est in got:
            n = exact[month_v]
            assert abs(est - n) / n < 0.25, (month_v, est, n)

    def test_panel_frequency_never_underestimates(
        self, spark, sf_dir, tmp_path
    ):
        events = load_table(spark, "events", sf_dir)
        a, b = _split(events)
        store = str(tmp_path / "s")
        build_sketch_store(a, store)
        append_sketch_batch(b, store, batch_id=1)
        exact = events.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("exact_n")
        )
        got = panel_frequency(spark, store, exact, "user_id").collect()
        assert len(got) == exact.count()
        assert all(r["cm_est"] >= r["exact_n"] for r in got)
        # w=1024 >> key cardinality at test SF: most probes exact
        frac = sum(r["cm_est"] == r["exact_n"] for r in got) / len(got)
        assert frac > 0.8, frac

    def test_panel_quantiles_within_relative_error(
        self, spark, sf_dir, tmp_path
    ):
        events = load_table(spark, "events", sf_dir)
        a, b = _split(events)
        store = str(tmp_path / "s")
        build_sketch_store(a, store)
        append_sketch_batch(b, store, batch_id=1)
        got = panel_quantiles(
            spark, store, F.lit("all"), "g", [50, 90]
        ).first()
        units = events.select(
            F.greatest(
                F.lit(1).cast("long"),
                F.round(F.col("value") * 1000).cast("long"),
            ).alias("vu")
        )
        n = units.count()
        assert got["n_values"] == n
        for q in (50, 90):
            exact = (
                units.orderBy("vu")
                .limit((n * q + 99) // 100)
                .agg(F.max("vu"))
                .first()[0]
            )
            est = got[f"p{q}_est"]
            # lower-bound estimate: within one sub-bucket below exact
            assert est <= exact
            assert (exact - est) / exact < 0.04, (q, est, exact)

    def test_panel_rolling_distinct_matches_exact(
        self, spark, sf_dir, tmp_path
    ):
        events = load_table(spark, "events", sf_dir)
        a, b = _split(events)
        store = str(tmp_path / "s")
        build_sketch_store(a, store)
        append_sketch_batch(b, store, batch_id=1)
        from etl_data_warehouse_spark.operators.sketch_store import (
            panel_rolling_distinct,
        )

        got = {
            r["day"]: (r["n_days_present"], r["hll_estimate"])
            for r in panel_rolling_distinct(spark, store, 7).collect()
        }
        # exact trailing-7-day distinct via a day-range self-join
        daily = events.select(
            _utc_day("ts").alias("day"), "user_id"
        ).distinct()
        days = daily.select("day").distinct()
        exact = {
            r["day"]: r["n"]
            for r in days.alias("d")
            .join(
                daily.alias("u"),
                (F.col("u.day") <= F.col("d.day"))
                & (
                    F.col("u.day")
                    >= F.date_sub(F.col("d.day"), 6)
                ),
            )
            .groupBy("d.day")
            .agg(F.countDistinct("u.user_id").alias("n"))
            .collect()
        }
        assert set(got) == set(exact)
        for day, (ndays, est) in got.items():
            n = exact[day]
            assert 1 <= ndays <= 7
            assert abs(est - n) / n < 0.25, (day, est, n)
