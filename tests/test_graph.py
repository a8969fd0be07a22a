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


class TestLabelPropagation:
    def test_matches_python_sync_reference(self, spark):
        from collections import Counter

        from etl_data_warehouse_spark.operators.graph import (
            label_propagation,
        )

        # two triangles joined by one bridge edge
        und = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
        sym = und + [(b, a) for a, b in und]
        edges = spark.createDataFrame(sym, "src long, dst long")
        got = {
            r["node"]: r["label"]
            for r in label_propagation(edges, iterations=3).collect()
        }

        nbrs: dict[int, list[int]] = {}
        for a, b in sym:
            nbrs.setdefault(a, []).append(b)
        labels = {n: n for n in nbrs}
        for _ in range(3):
            nxt = {}
            for n in nbrs:
                c = Counter(labels[m] for m in nbrs[n])
                best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[n] = best[0]
            labels = nxt
        assert got == labels

    def test_disconnected_components_stay_separate(self, spark):
        from etl_data_warehouse_spark.operators.graph import (
            label_propagation,
        )

        und = [(0, 1), (1, 2), (10, 11), (11, 12)]
        sym = und + [(b, a) for a, b in und]
        edges = spark.createDataFrame(sym, "src long, dst long")
        rows = label_propagation(edges, iterations=3).collect()
        lab = {r["node"]: r["label"] for r in rows}
        assert {lab[0], lab[1], lab[2]}.isdisjoint(
            {lab[10], lab[11], lab[12]}
        )
