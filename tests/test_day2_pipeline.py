"""The composed day-2 incremental ingest pipeline
(plans/day2_pipeline.run_day2_ingest): the whole daily chain —
curation gates → clean funnel → incremental MinHash + semantic dedup
→ cluster maintenance → index/vector appends → shard append — proven
equal to the full-rebuild twins BIT-FOR-BIT on a 2-day planted
corpus, replay-idempotent, with the streaming-vs-batch cap semantics
divergence quantified on a corpus built to trigger it.

Planting notes:
- day-1/day-2 sources differ, so their host sets are disjoint and the
  per-domain cap binds only WITHIN a day — exactly the regime where
  the pipeline's first-batch-wins cap equals the batch operator's
  globally-best-rank cap (the cross-day divergence is the documented
  streaming contract; TestCapSemanticsContract pins and quantifies it
  separately).
- doc_ids increase across days (the incremental operators' "earlier ==
  smaller id" discipline).
- docs carry planted near-dup pairs (generate_documents) and the
  embeddings are clustered (generate_clustered_embeddings), so BOTH
  dedup arms fire, including cross-day edges.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_warehouse_spark.operators import dedup, similarity
from etl_data_warehouse_spark.operators.cluster_index import read_clusters
from etl_data_warehouse_spark.operators.graph import connected_components
from etl_data_warehouse_spark.plans.day2_pipeline import run_day2_ingest
from etl_data_warehouse_spark.plans.web_curation import curate_documents
from etl_data_warehouse_spark.sources.generators import (
    generate_clustered_embeddings,
    generate_documents,
)
from etl_data_warehouse_spark.sources.shards import append_training_batch
from etl_data_warehouse_spark.streaming.corpus_stream import (
    clean_document_stream,
)
from pyspark.sql import Window

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
    """(docs, vectors) with a day column derived from doc_id."""
    day_src = F.when(F.col("doc_id") < DAY_SPLIT, "day1src").otherwise(
        "day2src"
    )
    docs = generate_documents(spark, N, n_words=40, dup_rate=0.15).withColumn(
        "source", day_src
    )
    # a handful of too-short docs per day exercise the quality gate
    short = F.col("doc_id").isin(3, 7, DAY_SPLIT + 3, DAY_SPLIT + 7)
    docs = docs.withColumn(
        "text",
        F.when(short, F.lit("w1 w2 w3 w4 w5")).otherwise(F.col("text")),
    )
    # one exact cross-day duplicate: day-2 doc 90 clones day-1 doc 10's
    # text (fingerprint dedup must drop 90)
    clone_src = docs.filter(F.col("doc_id") == 10).select(
        F.lit(90).alias("doc_id"), F.col("text").alias("clone_text")
    )
    docs = (
        docs.join(F.broadcast(clone_src), "doc_id", "left")
        .withColumn("text", F.coalesce("clone_text", "text"))
        .drop("clone_text")
    )
    vecs = generate_clustered_embeddings(
        spark, N, dim=16, n_clusters=40, noise=0.01
    ).select("vec_id", "embedding")
    return docs.localCheckpoint(), vecs.localCheckpoint()


def _split_days(docs, vecs):
    d1 = docs.filter(F.col("doc_id") < DAY_SPLIT)
    d2 = docs.filter(F.col("doc_id") >= DAY_SPLIT)
    v1 = vecs.filter(F.col("vec_id") < DAY_SPLIT)
    v2 = vecs.filter(F.col("vec_id") >= DAY_SPLIT)
    return d1, d2, v1, v2


def _full_rebuild(spark, docs, vecs, state_dir):
    """The batch-operator rebuild over the cumulative corpus, under
    the pipeline's own frozen centroids (trained at bootstrap — the
    trained-artifact contract: quantizers freeze at index build)."""
    curated = curate_documents(docs, domain_cap=CFG["domain_cap"])
    cleaned = clean_document_stream(curated)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    survivors = (
        cleaned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint()
    )
    pairs = dedup.minhash_lsh_pairs(
        survivors,
        num_hashes=CFG["num_hashes"],
        bands=CFG["bands"],
        threshold=CFG["jaccard_threshold"],
        n=CFG["shingle_n"],
    ).select("doc_a", "doc_b")
    cents = spark.read.parquet(
        os.path.join(state_dir, "ann_index", "centroids")
    )
    sv = vecs.join(
        survivors.select(F.col("doc_id").alias("vec_id")),
        "vec_id",
        "left_semi",
    )
    sem = similarity.semantic_dedup(
        sv, threshold=CFG["cosine_threshold"], centroids=cents
    )
    sem_edges = sem.filter(~F.col("kept")).select(
        F.col("dup_of").alias("doc_a"), F.col("vec_id").alias("doc_b")
    )
    edges = pairs.unionByName(sem_edges).distinct()
    mapping = connected_components(
        edges.select(
            F.col("doc_a").cast("long").alias("src"),
            F.col("doc_b").cast("long").alias("dst"),
        )
    ).select(F.col("node").alias("doc_id"), "component")
    dropped = mapping.filter(F.col("component") != F.col("doc_id")).select(
        "doc_id"
    )
    kept = survivors.join(dropped, "doc_id", "left_anti")
    return curated, survivors, mapping, kept.localCheckpoint()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _shard_rows(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.option("basePath", path).parquet(path).collect()
    )


class TestDay2Pipeline:
    def test_two_day_ingest_equals_full_rebuild(self, spark, tmp_path):
        docs, vecs = _corpus(spark)
        d1, d2, v1, v2 = _split_days(docs, vecs)
        state = str(tmp_path / "state")

        a1 = run_day2_ingest(d1, v1, state, batch_id=1, **CFG)
        a2 = run_day2_ingest(d2, v2, state, batch_id=2, **CFG)
        assert a1["bootstrap"] and not a2["bootstrap"]
        assert a1["status"] == a2["status"] == "SUCCESS"
        # the planting must actually exercise every gate
        assert a1["curation_dropped"] > 0 and a2["curation_dropped"] > 0
        assert a2["near_dup_edges"] > 0
        assert a2["kept_docs"] < a2["clean_survivors"]

        curated_f, survivors_f, mapping_f, kept_f = _full_rebuild(
            spark, docs, vecs, state
        )

        # 1. curation link: union of batch partitions == batch operator
        curated_pipe = spark.read.option(
            "basePath", os.path.join(state, "curated")
        ).parquet(os.path.join(state, "curated"))
        assert _rows(curated_pipe.select("doc_id")) == _rows(
            curated_f.select("doc_id")
        )

        # 2. clean corpus: sink content == rebuild survivors (full rows)
        sink = spark.read.parquet(os.path.join(state, "clean_documents"))
        assert _rows(sink) == _rows(survivors_f.select(*sink.columns))
        assert 90 not in [r["doc_id"] for r in sink.collect()]  # clone

        # 3. cluster mapping state == CC over the cumulative edge set
        mapping_pipe = read_clusters(spark, os.path.join(state, "clusters"))
        assert _rows(mapping_pipe.select("doc_id", "component")) == _rows(
            mapping_f.select("doc_id", "component")
        )

        # 4. keep verdicts. The pipeline's contract is AS-OF-DAY
        #    cluster-min (immutable sink: a later merge never unships
        #    an already-shipped doc), so:
        #    - day-2 keeps == one-shot rebuild keeps restricted to
        #      day-2 docs (bit-for-bit — the mapping is cumulative by
        #      the time day-2 ships);
        #    - day-1 keeps == the day-1-PREFIX rebuild (the batch
        #      operators over day-1's corpus alone);
        #    - vs the one-shot rebuild the pipeline only ever
        #      OVER-keeps, and every extra doc is a day-1 keeper
        #      dethroned by a day-2 merge (quantified exactly).
        shards = os.path.join(state, "shards")
        kept_pipe = {
            r["doc_id"]
            for r in spark.read.option("basePath", shards)
            .parquet(shards)
            .select("doc_id")
            .collect()
        }
        kept_full = {r["doc_id"] for r in kept_f.select("doc_id").collect()}
        assert kept_pipe >= kept_full  # never under-keeps
        assert {d for d in kept_pipe if d >= DAY_SPLIT} == {
            d for d in kept_full if d >= DAY_SPLIT
        }  # day-2 keeps are bit-exact vs the one-shot rebuild
        dethroned = kept_pipe - kept_full
        final_map = {
            r["doc_id"]: r["component"]
            for r in mapping_pipe.collect()
        }
        assert all(
            d < DAY_SPLIT and final_map.get(d, d) != d for d in dethroned
        ), "every over-keep must be a day-1 keeper dethroned by a merge"

        # day-1 prefix rebuild twin
        _, _, _, kept1_f = _full_rebuild(
            spark,
            docs.filter(F.col("doc_id") < DAY_SPLIT),
            vecs.filter(F.col("vec_id") < DAY_SPLIT),
            state,
        )
        kept1 = {r["doc_id"] for r in kept1_f.select("doc_id").collect()}
        assert {d for d in kept_pipe if d < DAY_SPLIT} == kept1

        # 5. shards == append_training_batch over exactly those per-day
        #    kept sets (bit-for-bit, offsets included)
        twin = str(tmp_path / "twin_shards")
        kept_cols = sink.columns
        day2_kept = [d for d in kept_full if d >= DAY_SPLIT]
        append_training_batch(
            kept1_f.select(*kept_cols),
            twin,
            1,
            n_shards=CFG["n_shards"],
            budget=CFG["pack_budget"],
        )
        append_training_batch(
            survivors_f.filter(F.col("doc_id").isin(day2_kept)).select(
                *kept_cols
            ),
            twin,
            2,
            n_shards=CFG["n_shards"],
            budget=CFG["pack_budget"],
        )
        assert _shard_rows(spark, shards) == _shard_rows(spark, twin)

    def test_containment_arm_catches_snippet_and_equals_rebuild(
        self, spark, tmp_path
    ):
        """The optional third dedup arm: a day-2 doc that is a 22-token
        SNIPPET of a day-1 keeper (Jaccard ~0.53 < 0.8, embedding
        unrelated — invisible to both standing arms) must be dropped by
        the containment arm, and the two-day kept set must equal the
        full-rebuild twin whose edges include
        containment_pairs_indexed(sketch_df_filter=False)."""
        docs, vecs = _corpus(spark)
        # doc 110 (day 2) becomes a prefix snippet of doc 10 (day 1 —
        # a pinned keeper: it ships in the base scenario and its exact
        # clone 90 is fingerprint-deduped before the near-dup arms)
        snip_src = docs.filter(F.col("doc_id") == 10).select(
            F.lit(110).alias("doc_id"),
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
        d1, d2, v1, v2 = _split_days(docs, vecs)
        state = str(tmp_path / "day2_ct_state")
        cfg = dict(CFG, containment=True)
        run_day2_ingest(d1, v1, state, batch_id=1, **cfg)
        r2 = run_day2_ingest(d2, v2, state, batch_id=2, **cfg)
        assert "containment_pairs" in r2["stage_sec"]

        shard_dir = os.path.join(state, "shards")
        shipped = {
            r["doc_id"]
            for r in spark.read.option("basePath", shard_dir)
            .parquet(shard_dir)
            .select("doc_id")
            .collect()
        }
        assert 10 in shipped  # the parent (day 1) ships
        assert 110 not in shipped  # the snippet is subset-duplication

        # two-day keeps == full-rebuild twin: cluster-min over the
        # Jaccard/semantic edges PLUS q163's orientation-aware
        # keep-longest drops from the containment pairs (directional —
        # they never enter the cluster mapping)
        curated, survivors, _, _ = _full_rebuild(spark, docs, vecs, state)
        cpairs = dedup.containment_pairs_indexed(
            survivors,
            threshold=cfg["containment_threshold"]
            if "containment_threshold" in cfg
            else 0.9,
            n=CFG["shingle_n"],
            sketch_df_filter=False,
        )
        ct_dropped = {
            r["doc_id"]
            for r in dedup.keep_longest_drops(cpairs).collect()
        }
        base_pairs = dedup.minhash_lsh_pairs(
            survivors,
            num_hashes=CFG["num_hashes"],
            bands=CFG["bands"],
            threshold=CFG["jaccard_threshold"],
            n=CFG["shingle_n"],
        ).select("doc_a", "doc_b")
        cents = spark.read.parquet(
            os.path.join(state, "ann_index", "centroids")
        )
        sv = vecs.join(
            survivors.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        sem = similarity.semantic_dedup(
            sv, threshold=CFG["cosine_threshold"], centroids=cents
        )
        edges = base_pairs.unionByName(
            sem.filter(~F.col("kept")).select(
                F.col("dup_of").alias("doc_a"),
                F.col("vec_id").alias("doc_b"),
            )
        ).distinct()
        mapping = connected_components(
            edges.select(
                F.col("doc_a").cast("long").alias("src"),
                F.col("doc_b").cast("long").alias("dst"),
            )
        ).select(F.col("node").alias("doc_id"), "component")
        dropped = {
            r["doc_id"]
            for r in mapping.filter(
                F.col("component") != F.col("doc_id")
            ).collect()
        } | ct_dropped
        rebuild_kept = {
            r["doc_id"] for r in survivors.collect()
        } - dropped
        # as-of-day contract (the immutable-sink asymmetry, same as the
        # base chain): day-2 keeps bit-exact vs the one-shot rebuild;
        # vs the rebuild the pipeline only ever OVER-keeps, and every
        # extra is a day-1 keeper dethroned later — by a day-2 cluster
        # merge or by a day-2 superset naming it as containment inner
        assert shipped >= rebuild_kept
        assert {d for d in shipped if d >= DAY_SPLIT} == {
            d for d in rebuild_kept if d >= DAY_SPLIT
        }
        comp = {r["doc_id"]: r["component"] for r in mapping.collect()}
        assert all(
            d < DAY_SPLIT and (comp.get(d, d) != d or d in ct_dropped)
            for d in shipped - rebuild_kept
        )

    def test_snippet_then_superset_keeps_superset(self, spark, tmp_path):
        """The orientation case the symmetrized (pre-r13) arm got
        BACKWARDS: a day-1 snippet whose SUPERSET arrives day 2. The
        cluster-min rule would keep the snippet (older, smaller id) and
        drop the superset; q163's keep-longest rule keeps the superset,
        records the snippet's dethroning in containment_drops, and
        compaction retracts it — so the post-compaction corpus equals
        containment_keep_longest over the cumulative survivors,
        bit-for-bit (kept flags AND justifying containers)."""
        from etl_data_warehouse_spark.sources.shards import (
            compact_training_shards,
        )

        # bespoke corpus: no planted Jaccard near-dups (dup_rate=0), one
        # cluster per vector (no semantic pairs at 0.95), uncapped
        # domains — the ONLY dedup signal is the planted containment
        docs = generate_documents(
            spark, N, n_words=40, dup_rate=0.0
        ).withColumn(
            "source",
            F.when(
                F.col("doc_id") < DAY_SPLIT, "day1src"
            ).otherwise("day2src"),
        )
        # day-1 doc 15 := 22-token prefix snippet of day-2 doc 110
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
        vecs = generate_clustered_embeddings(
            spark, N, dim=16, n_clusters=N, noise=0.001
        ).select("vec_id", "embedding").localCheckpoint()
        d1, d2, v1, v2 = _split_days(docs, vecs)
        state = str(tmp_path / "sts_state")
        cfg = dict(CFG, domain_cap=10**6, containment=True)
        r1 = run_day2_ingest(d1, v1, state, batch_id=1, **cfg)
        r2 = run_day2_ingest(d2, v2, state, batch_id=2, **cfg)

        shard_dir = os.path.join(state, "shards")
        shipped = {
            r["doc_id"]
            for r in spark.read.option("basePath", shard_dir)
            .parquet(shard_dir)
            .select("doc_id")
            .collect()
        }
        # day 1: the snippet ships (no superset exists yet); day 2: the
        # superset ships — the OPPOSITE of what cluster-min would do
        assert 15 in shipped and 110 in shipped
        assert r2["containment_dropped"] == 0  # no day-2 doc is inner

        # the dethroning is recorded: snippet 15 named as inner with
        # its justifying container
        ct_dir = os.path.join(state, "containment_drops")
        drops = {
            r["doc_id"]: r["container"]
            for r in spark.read.option("basePath", ct_dir)
            .parquet(ct_dir)
            .groupBy("doc_id")
            .agg(F.min("container").alias("container"))
            .collect()
        }
        assert 15 in drops

        # post-compaction corpus == q163's keep-longest over the
        # cumulative clean survivors, bit-for-bit (kept + container)
        sink = spark.read.parquet(os.path.join(state, "clean_documents"))
        exact = {
            r["doc_id"]: (r["kept"], r["container"])
            for r in dedup.containment_keep_longest(
                sink.select("doc_id", "text"),
                threshold=0.9,  # the pipeline's pinned default
                n=CFG["shingle_n"],
            ).collect()
        }
        assert exact[15] == (False, 110) and exact[110][0]
        assert drops == {
            d: c for d, (k, c) in exact.items() if not k
        }
        out = str(tmp_path / "sts_epoch")
        stats = compact_training_shards(
            spark,
            shard_dir,
            os.path.join(state, "clusters"),
            out,
            n_shards=CFG["n_shards"],
            budget=CFG["pack_budget"],
            containment_drops_path=ct_dir,
        )
        final = {
            r["doc_id"]
            for r in spark.read.option("basePath", out)
            .parquet(out)
            .select("doc_id")
            .collect()
        }
        assert final == {d for d, (k, _) in exact.items() if k}
        assert stats["retracted_docs"] == len(shipped) - len(final)

    def test_bucketed_index_survives_session_turnover(self, spark, tmp_path):
        # The bucketed MinHash tables (minhash_buckets default) are
        # registered by saveAsTable only in the session that wrote
        # them; a later session (tomorrow's batch job) must re-attach
        # the directories via register_minhash_tables' CREATE TABLE
        # path. Simulate session turnover by dropping the catalog
        # entries (EXTERNAL tables — files survive) between days and
        # prove the two-day result is bit-identical to the
        # single-session run.
        from etl_data_warehouse_spark.plans.day2_pipeline import (
            _minhash_table_prefix,
        )

        docs, vecs = _corpus(spark)
        d1, d2, v1, v2 = _split_days(docs, vecs)

        sa = str(tmp_path / "state_a")  # single-session twin
        run_day2_ingest(d1, v1, sa, batch_id=1, **CFG)
        run_day2_ingest(d2, v2, sa, batch_id=2, **CFG)

        sb = str(tmp_path / "state_b")  # catalog wiped between days
        run_day2_ingest(d1, v1, sb, batch_id=1, **CFG)
        pre = _minhash_table_prefix(sb)
        for sfx in ("bands", "shingles"):
            assert spark.catalog.tableExists(f"{pre}_{sfx}")
            spark.sql(f"DROP TABLE {pre}_{sfx}")
        run_day2_ingest(d2, v2, sb, batch_id=2, **CFG)
        # day-2 re-registered the tables from the surviving files
        for sfx in ("bands", "shingles"):
            assert spark.catalog.tableExists(f"{pre}_{sfx}")

        for sub in ("shards", "clean_documents"):
            assert _shard_rows(
                spark, os.path.join(sa, sub)
            ) == _shard_rows(spark, os.path.join(sb, sub))
        assert _rows(
            read_clusters(spark, os.path.join(sa, "clusters"))
        ) == _rows(read_clusters(spark, os.path.join(sb, "clusters")))

    def test_semantic_arrow_mode_equals_fold_mode(self, spark, tmp_path):
        # semantic_arrow=True (the 10^6 execution mode: numpy cell
        # assignment, gram-matrix refine, Arrow PQ encode) must produce
        # the same state as the fold default on a clear-margin corpus —
        # the documented fold-vs-BLAS divergence is confined to
        # exact-threshold float ties, which the planted corpus avoids
        from etl_data_warehouse_spark.operators.cluster_index import (
            read_clusters as _rc,
        )

        docs, vecs = _corpus(spark)
        d1, d2, v1, v2 = _split_days(docs, vecs)
        states = {}
        for mode, arrow in (("fold", False), ("arrow", True)):
            st = str(tmp_path / f"state_{mode}")
            # minhash_arrow rides along: the numpy signature twin is
            # bit-identical (TestArrowSignatures), so the whole-chain
            # state must not move either
            run_day2_ingest(
                d1, v1, st, batch_id=1, semantic_arrow=arrow,
                minhash_arrow=arrow, **CFG
            )
            run_day2_ingest(
                d2, v2, st, batch_id=2, semantic_arrow=arrow,
                minhash_arrow=arrow, **CFG
            )
            states[mode] = st
        for sub in ("shards", "clean_documents"):
            assert _shard_rows(
                spark, os.path.join(states["fold"], sub)
            ) == _shard_rows(
                spark, os.path.join(states["arrow"], sub)
            ), f"{sub} diverged between fold and arrow modes"
        assert _rows(_rc(spark, os.path.join(states["fold"], "clusters"))) == (
            _rows(_rc(spark, os.path.join(states["arrow"], "clusters")))
        )

    def test_day2_replay_is_idempotent(self, spark, tmp_path):
        docs, vecs = _corpus(spark)
        d1, d2, v1, v2 = _split_days(docs, vecs)
        state = str(tmp_path / "state")
        run_day2_ingest(d1, v1, state, batch_id=1, **CFG)
        a2 = run_day2_ingest(d2, v2, state, batch_id=2, **CFG)

        shards = os.path.join(state, "shards")
        sink = os.path.join(state, "clean_documents")
        before_shards = _shard_rows(spark, shards)
        before_sink = _rows(spark.read.parquet(sink))
        before_map = _rows(read_clusters(spark, os.path.join(state, "clusters")))

        r2 = run_day2_ingest(d2, v2, state, batch_id=2, **CFG)
        assert r2["clean_survivors"] == a2["clean_survivors"]
        assert r2["kept_docs"] == a2["kept_docs"]
        assert _shard_rows(spark, shards) == before_shards
        assert _rows(spark.read.parquet(sink)) == before_sink
        assert (
            _rows(read_clusters(spark, os.path.join(state, "clusters")))
            == before_map
        )

    def test_day2_replay_idempotent_with_containment(
        self, spark, tmp_path
    ):
        # replaying a day with the containment arm on must re-produce
        # the oriented drop state bit-for-bit: the incremental probe
        # masks the batch's own index rows (exclude_batch_id +
        # anti-joins) and the containment_drops/batch=N overwrite
        # rewrites identical content
        docs, vecs = _corpus(spark)
        snip_src = docs.filter(F.col("doc_id") == 10).select(
            F.lit(110).alias("doc_id"),
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
        d1, d2, v1, v2 = _split_days(docs, vecs)
        state = str(tmp_path / "ct_replay_state")
        cfg = dict(CFG, containment=True)
        run_day2_ingest(d1, v1, state, batch_id=1, **cfg)
        a2 = run_day2_ingest(d2, v2, state, batch_id=2, **cfg)
        ct_dir = os.path.join(state, "containment_drops")
        shards = os.path.join(state, "shards")
        before_drops = _shard_rows(spark, ct_dir)
        before_shards = _shard_rows(spark, shards)
        r2 = run_day2_ingest(d2, v2, state, batch_id=2, **cfg)
        assert r2["containment_dropped"] == a2["containment_dropped"]
        assert r2["kept_docs"] == a2["kept_docs"]
        assert _shard_rows(spark, ct_dir) == before_drops
        assert _shard_rows(spark, shards) == before_shards

    def test_all_recrawl_day_is_a_safe_noop(self, spark, tmp_path):
        # day-3 re-delivers day-1's TEXT under fresh ids: every doc is
        # fingerprint-deduped away; the chain must commit an empty day
        # without corrupting any state table
        docs, vecs = _corpus(spark)
        d1, d2, v1, v2 = _split_days(docs, vecs)
        state = str(tmp_path / "state")
        run_day2_ingest(d1, v1, state, batch_id=1, **CFG)
        run_day2_ingest(d2, v2, state, batch_id=2, **CFG)
        before = _shard_rows(spark, os.path.join(state, "shards"))

        d3 = d1.select(
            (F.col("doc_id") + 2 * N).alias("doc_id"),
            "text",
            "lang",
            F.col("source"),
            "n_chars",
        )
        v3 = v1.select((F.col("vec_id") + 2 * N).alias("vec_id"), "embedding")
        a3 = run_day2_ingest(d3, v3, state, batch_id=3, **CFG)
        assert a3["clean_survivors"] == 0
        assert a3["kept_docs"] == 0
        assert _shard_rows(spark, os.path.join(state, "shards")) == before
        assert os.path.exists(
            os.path.join(state, "shards", "batch=3", "_COMMITTED")
        )

    def test_config_mismatch_raises(self, spark, tmp_path):
        docs, vecs = _corpus(spark)
        d1, _, v1, _ = _split_days(docs, vecs)
        state = str(tmp_path / "state")
        run_day2_ingest(d1, v1, state, batch_id=1, **CFG)
        bad = dict(CFG, bands=16)
        import pytest

        with pytest.raises(ValueError, match="config mismatch"):
            run_day2_ingest(d1, v1, state, batch_id=1, **bad)


class TestShardCompaction:
    def test_compaction_restores_one_shot_keeps(self, spark, tmp_path):
        """compact_training_shards is the offline remedy for the
        pipeline's as-of-day over-keeps: after compaction the shard
        contents equal the ONE-SHOT rebuild's keeps, bit-for-bit
        against an append twin packed from exactly those docs."""
        from etl_data_warehouse_spark.sources.shards import (
            compact_training_shards,
        )

        docs, vecs = _corpus(spark)
        d1, d2, v1, v2 = _split_days(docs, vecs)
        state = str(tmp_path / "state")
        run_day2_ingest(d1, v1, state, batch_id=1, **CFG)
        run_day2_ingest(d2, v2, state, batch_id=2, **CFG)

        _, survivors_f, _, kept_f = _full_rebuild(spark, docs, vecs, state)
        kept_full = {r["doc_id"] for r in kept_f.select("doc_id").collect()}
        shards = os.path.join(state, "shards")
        kept_pipe = {
            r["doc_id"]
            for r in spark.read.option("basePath", shards)
            .parquet(shards)
            .select("doc_id")
            .collect()
        }
        assert kept_pipe > kept_full  # the corpus DOES dethrone

        out = str(tmp_path / "compacted")
        res = compact_training_shards(
            spark,
            shards,
            os.path.join(state, "clusters"),
            out,
            n_shards=CFG["n_shards"],
            budget=CFG["pack_budget"],
        )
        got = spark.read.option("basePath", out).parquet(out)
        assert {r["doc_id"] for r in got.select("doc_id").collect()} == (
            kept_full
        )
        assert res["retracted_docs"] == len(kept_pipe - kept_full) > 0

        # bit-for-bit repack equality (offsets included) vs an append
        # twin over exactly the one-shot keeps
        twin = str(tmp_path / "twin")
        from etl_data_warehouse_spark.sources.shards import (
            append_training_batch,
        )

        append_training_batch(
            kept_f.select("doc_id", "text", "lang", "source", "fingerprint"),
            twin,
            0,
            n_shards=CFG["n_shards"],
            budget=CFG["pack_budget"],
        )
        cols = sorted(
            set(got.columns)
            & set(spark.read.option("basePath", twin).parquet(twin).columns)
        )
        assert _rows(got.select(*cols)) == _rows(
            spark.read.option("basePath", twin).parquet(twin).select(*cols)
        )

        # epoch safety: in-place compaction must refuse
        import pytest

        with pytest.raises(ValueError, match="new epoch"):
            compact_training_shards(
                spark, shards, os.path.join(state, "clusters"), shards
            )

    def test_three_day_dethrone_then_compaction_epoch(
        self, spark, tmp_path
    ):
        """The full operational story through the PUBLIC surface only
        (run_day2_ingest + compact_training_shards): a day-3 near-dup
        Z bridges two day-1 keepers Y < X — pairwise Jaccard 0.75
        (below the 0.8 threshold: both ship on day 1) but 0.857 vs Z —
        so day-3's cluster merge dethrones the shipped keeper X in the
        mapping while the immutable shard log retains it; compaction
        into a fresh epoch then restores one-shot-rebuild equality."""
        from etl_data_warehouse_spark.sources.shards import (
            compact_training_shards,
        )

        # ids chosen to SURVIVE the blocklist + per-domain cap (the
        # curation gates key on doc-derived hosts, not text, so the
        # planted texts don't change survival): 110 is blocklisted,
        # 111 passes — probed once, pinned here
        Y_ID, X_ID, Z_ID = 10, 30, 111
        core = " ".join(f"core{i}" for i in range(20))
        planted = {
            Y_ID: core + " ya yb yc",
            X_ID: core + " xa xb xc",
            Z_ID: core,
        }
        day_src = (
            F.when(F.col("doc_id") < 40, "d1src")
            .when(F.col("doc_id") < 80, "d2src")
            .otherwise("d3src")
        )
        docs = generate_documents(
            spark, N, n_words=40, dup_rate=0.0
        ).withColumn("source", day_src)
        repl = F.col("text")
        for k, v in planted.items():
            repl = F.when(F.col("doc_id") == k, F.lit(v)).otherwise(repl)
        docs = docs.withColumn("text", repl).localCheckpoint()
        # one cluster per vector: no accidental semantic edges — the
        # dethrone must come from the planted MinHash bridge alone
        vecs = (
            generate_clustered_embeddings(
                spark, N, dim=16, n_clusters=N, noise=0.01
            )
            .select("vec_id", "embedding")
            .localCheckpoint()
        )

        state = str(tmp_path / "state")
        shards = os.path.join(state, "shards")
        for bid, (lo, hi) in enumerate(
            ((0, 40), (40, 80), (80, 120)), start=1
        ):
            run_day2_ingest(
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ),
                vecs.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ),
                state,
                batch_id=bid,
                **CFG,
            )
            if bid == 1:
                day1 = {
                    r["doc_id"]
                    for r in spark.read.option("basePath", shards)
                    .parquet(shards)
                    .select("doc_id")
                    .collect()
                }
                assert {Y_ID, X_ID} <= day1  # both ship on day 1

        shipped = {
            r["doc_id"]
            for r in spark.read.option("basePath", shards)
            .parquet(shards)
            .select("doc_id")
            .collect()
        }
        assert X_ID in shipped  # immutable log retains the keeper
        assert Z_ID not in shipped  # Z itself dropped as-of-day
        comp = {
            r["doc_id"]: r["component"]
            for r in read_clusters(
                spark, os.path.join(state, "clusters")
            ).collect()
        }
        assert comp.get(X_ID) == Y_ID  # X dethroned by the day-3 merge
        assert comp.get(Z_ID) == Y_ID

        out = str(tmp_path / "epoch1")
        res = compact_training_shards(
            spark,
            shards,
            os.path.join(state, "clusters"),
            out,
            n_shards=CFG["n_shards"],
            budget=CFG["pack_budget"],
        )
        compacted = {
            r["doc_id"]
            for r in spark.read.option("basePath", out)
            .parquet(out)
            .select("doc_id")
            .collect()
        }
        assert X_ID not in compacted and Y_ID in compacted
        dethroned = {d for d, c in comp.items() if c != d}
        assert compacted == shipped - dethroned
        assert res["retracted_docs"] == len(shipped - compacted) > 0

        # strong form: the fresh epoch == the one-shot rebuild's keeps
        _, _, _, kept_f = _full_rebuild(spark, docs, vecs, state)
        assert compacted == {
            r["doc_id"] for r in kept_f.select("doc_id").collect()
        }
