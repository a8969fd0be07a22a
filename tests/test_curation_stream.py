"""Streaming curation twin (streaming/curation_stream.py): blocklist
parity with batch always; single-batch drain == batch operator exactly;
cross-batch cap never exceeded; replayed batches idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.plans import web_curation as wc
from etl_data_warehouse_spark.streaming.curation_stream import (
    _capped_batch,
    curated_document_stream,
    run_curation_stream,
)

SF = "/root/testdata/sf0.001"
CAP = 2


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _drain(spark, in_dir, out_dir, ckpt):
    q = run_curation_stream(
        spark, in_dir, out_dir, ckpt, domain_cap=CAP, max_files=1
    )
    q.awaitTermination(300)


def _kept_ids(spark, out_dir):
    return sorted(
        r.doc_id
        for r in spark.read.parquet(os.path.join(out_dir, "curated")).collect()
    )


class TestCurationStream:
    def test_single_batch_equals_batch_operator(self, spark, tmp_path):
        in_dir = str(tmp_path / "in_one")
        _docs(spark).repartition(1).write.parquet(in_dir)
        out = str(tmp_path / "out_one")
        q = run_curation_stream(
            spark, in_dir, out, str(tmp_path / "ck_one"),
            domain_cap=CAP, max_files=100,
        )
        q.awaitTermination(300)
        want = sorted(
            r.doc_id
            for r in wc.curate_documents(_docs(spark), domain_cap=CAP)
            .select("doc_id")
            .collect()
        )
        assert _kept_ids(spark, out) == want

    def test_cross_batch_cap_and_blocklist(self, spark, tmp_path):
        # split the corpus into several files -> several microbatches
        in_dir = str(tmp_path / "in_many")
        _docs(spark).repartition(4).write.parquet(in_dir)
        out = str(tmp_path / "out_many")
        _drain(spark, in_dir, out, str(tmp_path / "ck_many"))

        curated = spark.read.parquet(os.path.join(out, "curated"))
        per_host = curated.groupBy("host").count().collect()
        assert per_host, "stream kept nothing"
        assert max(r["count"] for r in per_host) <= CAP
        # blocklist parity: no kept host is blocklisted
        n_blocked = curated.filter(wc.blocklisted("host")).count()
        assert n_blocked == 0
        # stateless half parity with the batch derivation
        want_hosts = {
            r.host
            for r in curated_document_stream(_docs(spark))
            .select("host")
            .distinct()
            .collect()
        }
        got_hosts = {r.host for r in curated.select("host").distinct().collect()}
        assert got_hosts <= want_hosts

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        in_dir = str(tmp_path / "in_replay")
        _docs(spark).repartition(2).write.parquet(in_dir)
        out = str(tmp_path / "out_replay")
        _drain(spark, in_dir, out, str(tmp_path / "ck_replay"))
        before = _kept_ids(spark, out)

        # replay batch 0 by hand: the budget probe excludes batch=0
        # itself, so the rewrite reproduces identical content
        curated_dir = os.path.join(out, "curated")
        b0 = (
            spark.read.option("basePath", curated_dir)
            .parquet(curated_dir)
            .filter(F.col("batch") == 0)
            .drop("batch")
        )
        # reconstruct batch-0's INPUT superset: every doc of its hosts
        # that the stateless half admits (rank decides again)
        hosts0 = b0.select("host").distinct()
        batch0_input = curated_document_stream(_docs(spark)).join(
            F.broadcast(hosts0), "host", "left_semi"
        )
        # restrict to the docs that were actually in microbatch 0's
        # file split: replay must use the same batch content, which the
        # checkpoint guarantees in production; here batch 0 wrote a
        # subset, so replay exactly its doc_ids' rows
        batch0_input = batch0_input.join(
            b0.select("doc_id"), "doc_id", "left_semi"
        )
        _capped_batch(spark, batch0_input, out, 0, CAP)
        after = _kept_ids(spark, out)
        assert after == before


class TestCapSemanticsContract:
    """The DECLARED streaming-vs-batch cap divergence (module
    docstring curation_stream.py:25-30 and COVERAGE.md): the batch
    operator keeps the GLOBALLY best-ranked docs per host; the
    streaming/day-batch cap is FIRST-BATCH-WINS because written shards
    are immutable. This test builds a 2-batch corpus that triggers the
    divergence and quantifies it exactly:

    - both variants keep exactly ``cap`` docs for the contended host
      (the cap itself is never violated — the shared invariant);
    - the batch operator's keeps are the global md5-rank winners;
    - the streaming keeps are batch-1's best-ranked docs, even though
      batch 2 carried globally better-ranked ones.
    """

    def test_divergence_is_exactly_first_batch_wins(self, spark, tmp_path):
        from etl_data_warehouse_spark.operators.sampling import hash_bucket

        # one source -> 11 hosts; pick the host whose docs we control,
        # then order its docs by the cap's own rank key
        docs = _docs(spark).localCheckpoint()
        hosted = wc.hosted_unblocked(docs).withColumn(
            "rk", hash_bucket("doc_id", "domcap", 1_000_000)
        )
        host = (
            hosted.groupBy("host")
            .count()
            .filter(F.col("count") > CAP)
            .orderBy(F.col("count").desc(), "host")
            .first()["host"]
        )
        ranked = [
            r["doc_id"]
            for r in hosted.filter(F.col("host") == host)
            .orderBy("rk", "doc_id")
            .collect()
        ]
        # batch 1 gets the WORST-ranked half, batch 2 the best-ranked:
        # maximal divergence between first-batch-wins and global rank
        worst_half = set(ranked[len(ranked) // 2:])
        on_host = F.col("doc_id").isin([int(d) for d in ranked])
        b1 = docs.filter(~on_host | F.col("doc_id").isin(
            [int(d) for d in worst_half]))
        b2 = docs.filter(on_host & ~F.col("doc_id").isin(
            [int(d) for d in worst_half]))

        out = str(tmp_path / "contract")
        _capped_batch(spark, wc.hosted_unblocked(b1), out, 1, CAP)
        _capped_batch(spark, wc.hosted_unblocked(b2), out, 2, CAP)
        stream_host = sorted(
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(out, "curated"))
            .filter(F.col("host") == host)
            .collect()
        )
        batch_host = sorted(
            r["doc_id"]
            for r in wc.curate_documents(docs, domain_cap=CAP)
            .filter(F.col("host") == host)
            .collect()
        )
        # shared invariant: the cap binds identically
        assert len(stream_host) == len(batch_host) == CAP
        # batch operator: global best rank
        assert batch_host == sorted(int(d) for d in ranked[:CAP])
        # streaming: batch-1's best rank (first-batch-wins), which by
        # construction includes globally WORSE docs — the quantified
        # divergence: the kept SETS differ (batch 2's globally better
        # ranked doc(s) lost to batch 1's spent budget)
        by_rank = [int(d) for d in ranked if int(d) in worst_half][:CAP]
        assert stream_host == sorted(by_rank)
        assert stream_host != batch_host
