"""Runtime row/partition pruning — the two Catalyst features that make
selective fact⋈dim joins cheap at 100 TB:

- Dynamic Partition Pruning: a filtered dim's keys become a runtime
  partition filter on the fact scan (only matching directories read).
- Runtime bloom filter: for non-partitioned join keys, a bloom built
  from the filtered creation side is pushed into the application-side
  scan, discarding non-joining rows before the shuffle.

Both are free once plans are declarative — these tests pin that the
repo's session + plan shapes actually trigger them (thresholds are
tuned down because the test facts are MBs, not the TBs the defaults
assume)."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestDynamicPartitionPruning:
    def test_filtered_dim_prunes_fact_partitions(self, spark, tmp_path):
        fact = spark.range(100_000).select(
            "id", (F.col("id") % 50).alias("pkey"), (F.col("id") * 2).alias("val")
        )
        fact.write.partitionBy("pkey").mode("overwrite").parquet(
            str(tmp_path / "fact")
        )
        dim = spark.range(50).select(
            F.col("id").alias("pkey"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
        )
        dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

        f = spark.read.parquet(str(tmp_path / "fact"))
        d = spark.read.parquet(str(tmp_path / "dim")).filter(
            F.col("name") == "n7"
        )
        j = f.join(d, "pkey").agg(F.sum("val").alias("s"))
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower()
        # value check: partition 7 holds ids ≡ 7 (mod 50)
        expect = sum(2 * i for i in range(7, 100_000, 50))
        assert rows[0]["s"] == expect

    def test_assert_dpp_enabled_in_repo_session(self, spark):
        assert (
            spark.conf.get(
                "spark.sql.optimizer.dynamicPartitionPruning.enabled"
            )
            == "true"
        )


class TestAqeSkewJoin:
    def test_aqe_splits_skewed_partition(self, spark, tmp_path):
        """The engine's declared skew posture is AQE-first (salting is
        the manual fallback, operators/skew.py): a hot key whose
        partition dwarfs the median must be split at runtime. Thresholds
        are scaled down from the 256 MB defaults to trigger on MB-scale
        test data."""
        left = spark.range(2_000_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        left.write.mode("overwrite").parquet(str(tmp_path / "skewed"))
        right = spark.range(200_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("tag")
        )
        right.write.mode("overwrite").parquet(str(tmp_path / "uniform"))

        keys = (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
        saved = {k: spark.conf.get(k) for k in keys}
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256k",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0"
        )
        try:
            j = (
                spark.read.parquet(str(tmp_path / "skewed"))
                .join(spark.read.parquet(str(tmp_path / "uniform")), "k")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            rows = j.collect()
            plan = j._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            assert "skew=true" in final
            # key 0 matches right row 0 -> 1.8M rows; keys id%10==9 match
            # nothing above 200k; ids 9,19,..,199999 -> 20k rows
            assert rows[0]["n"] == 1_800_000 + 20_000
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)


class TestRuntimeBloomFilter:
    def test_bloom_pushed_into_application_side(self, spark, tmp_path):
        big = spark.range(3_000_000).select(
            F.col("id").alias("k"), (F.col("id") % 1000).alias("g")
        )
        big.write.mode("overwrite").parquet(str(tmp_path / "big"))
        small = spark.range(2000).select(
            (F.col("id") * 37).alias("k"), (F.col("id") % 5).alias("tag")
        )
        small.write.mode("overwrite").parquet(str(tmp_path / "small"))

        saved = {
            k: spark.conf.get(k)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.optimizer.runtime.bloomFilter."
                "applicationSideScanSizeThreshold",
            )
        }
        # force a shuffle join (broadcast would subsume the bloom) and
        # scale the app-side threshold down from its 10 GiB default
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1024",
        )
        try:
            b = spark.read.parquet(str(tmp_path / "big"))
            s = spark.read.parquet(str(tmp_path / "small")).filter(
                F.col("tag") == 3
            )
            j = b.join(s, "k").agg(F.count("*").alias("n"))
            rows = j.collect()
            lp = j._jdf.queryExecution().optimizedPlan().toString()
            assert "bloom_filter_agg" in lp and "might_contain" in lp
            # ids 0..1999 step5 from tag==3 -> k=id*37 < 3M all match
            assert rows[0]["n"] == 400
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
