"""Z-order clustering + small-file compaction (sources/layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.sources import layout
from etl_data_warehouse_spark.sources.catalog import load_table


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


class TestZValue:
    def test_matches_python_reference(self, spark):
        rows = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows, "x long, y long")
        out = df.withColumn("z", layout.zvalue(["x", "y"], bits=4)).collect()
        for r in out:
            assert r["z"] == _morton(r["x"], r["y"], 4)

    def test_zvalue_is_locality_preserving(self, spark):
        # adjacent points differ in few z bits; the real invariant we
        # rely on: equal points -> equal z, and z is a bijection over
        # the grid (no two cells collide).
        rows = [(x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(rows, "x long, y long")
        n = (
            df.withColumn("z", layout.zvalue(["x", "y"], bits=5))
            .select("z")
            .distinct()
            .count()
        )
        assert n == 32 * 32

    def test_scaled_bounds(self, spark, sf_dir):
        li = load_table(spark, "lineitem", sf_dir)
        z = layout.with_zorder_columns(li, ["l_partkey", "l_suppkey"])
        row = z.agg(
            F.min("z_l_partkey"),
            F.max("z_l_partkey"),
            F.min("zval"),
            F.max("zval"),
            F.max("zbucket"),
        ).first()
        assert row[0] == 0 and row[1] == 255
        assert 0 <= row[2] and row[3] < (1 << 16)
        assert row[4] <= 15


class TestZOrderWrite:
    def test_file_pruning_beats_unsorted(self, spark, sf_dir, tmp_path):
        li = load_table(
            spark,
            "lineitem",
            sf_dir,
            columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"],
        )
        zpath = str(tmp_path / "z")
        upath = str(tmp_path / "u")
        layout.zorder_write(li, zpath, ["l_partkey", "l_suppkey"], n_files=16)
        li.repartition(16).write.parquet(upath)

        lo = li.agg(F.min("l_partkey")).first()[0]
        hi = li.agg(F.max("l_partkey")).first()[0]
        cut = lo + (hi - lo) // 20  # bottom ~5% of the partkey space
        pred = F.col("l_partkey").between(lo, cut)

        def touched(path: str) -> int:
            return (
                spark.read.parquet(path)
                .filter(pred)
                .select(F.input_file_name())
                .distinct()
                .count()
            )

        z_files, u_files = touched(zpath), touched(upath)
        # clustered layout: a 1-dim filter touches a minority of files;
        # the unsorted layout scatters the range over every file.
        assert z_files < u_files
        assert z_files <= 8
        # and the data survives intact
        assert (
            spark.read.parquet(zpath).filter(pred).count()
            == li.filter(pred).count()
        )

    def test_roundtrip_preserves_rows(self, spark, sf_dir, tmp_path):
        li = load_table(spark, "lineitem", sf_dir)
        p = str(tmp_path / "z2")
        layout.zorder_write(li, p, ["l_partkey", "l_suppkey"], n_files=8)
        back = spark.read.parquet(p)
        assert back.count() == li.count()
        assert back.agg(F.sum("l_quantity")).first()[0] == li.agg(
            F.sum("l_quantity")
        ).first()[0]
        assert set(back.columns) == set(li.columns)


class TestCompaction:
    def test_compacts_small_files(self, spark, sf_dir, tmp_path):
        li = load_table(spark, "lineitem", sf_dir)
        p = str(tmp_path / "frag")
        li.repartition(40).write.parquet(p)
        before_rows = spark.read.parquet(p).count()
        stats = layout.compact_small_files(
            spark, p, target_bytes=64 * 1024 * 1024
        )
        assert stats["files_before"] == 40
        assert stats["files_after"] < stats["files_before"]
        after = spark.read.parquet(p)
        assert after.count() == before_rows
        exact = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        assert after.agg(exact).first()[0] == li.agg(exact).first()[0]

    def test_compact_with_clustering_restore(self, spark, sf_dir, tmp_path):
        li = load_table(spark, "lineitem", sf_dir)
        p = str(tmp_path / "frag2")
        li.repartition(24).write.parquet(p)
        layout.compact_small_files(
            spark, p, target_bytes=64 * 1024 * 1024, sort_by="l_partkey"
        )
        assert spark.read.parquet(p).count() == li.count()
