"""Connected components / dedup clustering (operators/graph.py)."""

from __future__ import annotations

import pytest

from etl_data_warehouse_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


class TestConnectedComponents:
    def test_hand_graph(self, spark):
        # components: {1,2,3,4} (path), {10,11} (edge), 20 absent (no edge)
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
        )
        got = {
            r["node"]: r["component"]
            for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_min_label_crosses_long_path(self, spark):
        # a 12-node path needs multiple propagation rounds
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], ["src", "dst"]
        )
        comps = {
            r["component"] for r in connected_components(edges).collect()
        }
        assert comps == {0}

    def test_nonconvergence_raises(self, spark):
        edges = spark.createDataFrame([(i, i + 1) for i in range(8)], ["src", "dst"])
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_iterations=1)


class TestDedupClusters:
    def test_cluster_invariants(self, spark, sf_dir):
        from etl_data_warehouse_spark.operators.dedup import minhash_lsh_pairs
        from etl_data_warehouse_spark.sources.catalog import load_table

        docs = load_table(spark, "documents", sf_dir)
        pairs = minhash_lsh_pairs(docs, threshold=0.8)
        rows = dedup_clusters(docs, pairs).collect()

        assert len(rows) == docs.count()  # every doc assigned exactly once
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        for cid, members in by_cluster.items():
            ids = [m["doc_id"] for m in members]
            assert cid == min(ids)  # label is the min reachable id
            for m in members:
                assert m["cluster_size"] == len(members)
                assert m["is_canonical"] == (m["doc_id"] == cid)
        # every near-dup pair landed in one cluster
        assignment = {r["doc_id"]: r["cluster_id"] for r in rows}
        for p in pairs.collect():
            assert assignment[p["doc_a"]] == assignment[p["doc_b"]]
