"""Union-find vs min-label propagation equivalence + stage tests."""

import numpy as np
import pytest

from dedup_restore_ray.functions.unionfind import (UnionFind,
                                                   connected_component_labels,
                                                   min_label_round)


class TestUnionFind:
    def test_basic(self):
        labels = connected_component_labels([(1, 2), (2, 3), (5, 6)])
        assert labels[1] == labels[2] == labels[3] == 1
        assert labels[5] == labels[6] == 5

    def test_min_label_wins(self):
        labels = connected_component_labels([(9, 5), (5, 2), (7, 9)])
        assert all(v == 2 for v in labels.values())

    def test_string_keys(self):
        labels = connected_component_labels([("b", "a"), ("c", "b")])
        assert all(v == "a" for v in labels.values())


class TestLabelPropagationEquivalence:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_graph_fixpoint_matches_union_find(self, seed):
        rng = np.random.default_rng(seed)
        n = 60
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(80)]
        edges = [(u, v) for u, v in edges if u != v]
        uf_labels = connected_component_labels(edges)
        # iterate min-label rounds to fixpoint
        nodes = {x for e in edges for x in e}
        labels = {x: x for x in nodes}
        us = [u for u, v in edges]
        vs = [v for u, v in edges]
        for _ in range(n):
            labels, changed = min_label_round(labels, us, vs)
            if changed == 0:
                break
        assert labels == uf_labels

    def test_chain_converges(self):
        edges = [(i, i + 1) for i in range(20)]
        labels = {x: x for x in range(21)}
        for _ in range(25):
            labels, changed = min_label_round(labels, *zip(*edges))
            if changed == 0:
                break
        assert all(v == 0 for v in labels.values())


@pytest.mark.usefixtures("ray_session")
class TestDistributedCluster:
    def test_label_prop_matches_union_find(self):
        import ray.data as rd
        from dedup_restore_ray.stages.cluster import (cluster_label_propagation,
                                                      cluster_union_find)
        edges = [(3, 9), (9, 12), (1, 2), (2, 3), (50, 60)]
        ds = rd.from_items([{"u": u, "v": v} for u, v in edges])
        lp = cluster_label_propagation(ds)
        uf = cluster_union_find(edges)
        assert lp == uf


@pytest.mark.usefixtures("ray_session")
class TestDistributedLabelPropagation:
    def test_matches_union_find(self):
        import ray.data as rd
        from dedup_restore_ray.stages.cluster import (
            cluster_label_propagation_distributed, cluster_union_find)
        edges = [(3, 9), (9, 12), (1, 2), (2, 3), (50, 60), (60, 61),
                 (61, 50)]
        ds = rd.from_items([{"u": u, "v": v} for u, v in edges])
        labels_ds = cluster_label_propagation_distributed(ds)
        got = {r["node"]: r["label"] for r in labels_ds.take_all()}
        assert got == cluster_union_find(edges)

    def test_attach_join(self):
        import ray.data as rd
        import pyarrow as pa
        from dedup_restore_ray.stages.cluster import (
            attach_cluster_ids_distributed, cluster_label_propagation_distributed)
        edges = rd.from_items([{"u": 2, "v": 5}])
        labels = cluster_label_propagation_distributed(edges)
        assigns = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 5, 7], pa.int64()),
            "canonical_id": pa.array([1, 2, 2, 7], pa.int64()),
            "is_dup": pa.array([False, False, True, False]),
        }))
        out = attach_cluster_ids_distributed(assigns, labels).to_pandas()
        cl = dict(zip(out.doc_id, out.cluster_id))
        assert cl == {1: 1, 2: 2, 5: 2, 7: 7}


@pytest.mark.usefixtures("ray_session")
class TestClusterRepresentatives:
    """Quality-aware canonical selection (q_cluster_representatives_docs):
    per cluster the winner is the longest doc, ties break to min id."""

    def test_longest_wins_per_cluster(self):
        import pandas as pd
        from dedup_restore_ray.queries import QUERIES
        sf = "/root/testdata/sf0.001"
        out = QUERIES["cluster_representatives_docs"](sf).to_pandas()
        docs = pd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "n_chars"])
        assert len(out) == len(docs)
        m = out.merge(docs, on="doc_id")
        # exactly one keeper per cluster, and it is a member
        keepers = m[m.keep]
        assert (keepers.groupby("cluster_id").size() == 1).all()
        assert set(m.cluster_id) == set(keepers.cluster_id)
        assert (keepers.doc_id == keepers.rep_doc_id).all()
        # the keeper maximizes (n_chars, -doc_id) within its cluster
        best = (m.sort_values(["n_chars", "doc_id"],
                              ascending=[False, True])
                .groupby("cluster_id").first())
        got = keepers.set_index("cluster_id").doc_id.sort_index()
        assert (got == best.doc_id.sort_index()).all()
        # every row carries its cluster's rep
        rep_of = keepers.set_index("cluster_id").rep_doc_id
        assert (m.rep_doc_id.values
                == rep_of.loc[m.cluster_id].values).all()


@pytest.mark.usefixtures("ray_session")
class TestUnionFindArrays:
    """The vectorized driver tier (dictionary encode + min-label
    pointer doubling) must equal UnionFind.labels() exactly — int and
    string ids, chains, random graphs, empty input (round 5: replaces
    the Python edge walk that was a fixed 7-8s serial term at 8M
    docs)."""

    def _check(self, edges):
        import pyarrow as pa
        import ray.data as rd
        from dedup_restore_ray.stages.cluster import \
            cluster_union_find_arrays
        uf = UnionFind()
        for u, v in edges:
            uf.union(u, v)
        want = uf.labels()
        ds = rd.from_arrow(pa.table({
            "u": pa.array([e[0] for e in edges]),
            "v": pa.array([e[1] for e in edges])}))
        nodes, labels = cluster_union_find_arrays(ds)
        got = dict(zip(nodes.to_pylist(), labels.to_pylist()))
        assert got == want

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_graph_parity(self, seed):
        rng = np.random.default_rng(seed)
        n = 200
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, n, size=(300, 2)) if a != b]
        self._check(edges)

    def test_long_chain(self):
        # worst case for plain propagation; pointer doubling makes it
        # O(log n) passes
        self._check([(i, i + 1) for i in range(500)])

    def test_string_ids(self):
        self._check([("url/b", "url/a"), ("url/c", "url/b"),
                     ("url/x", "url/y")])

    def test_empty(self):
        import pyarrow as pa
        import ray.data as rd
        from dedup_restore_ray.stages.cluster import \
            cluster_union_find_arrays
        ds = rd.from_arrow(pa.table({"u": pa.array([], pa.int64()),
                                     "v": pa.array([], pa.int64())}))
        nodes, labels = cluster_union_find_arrays(ds)
        assert len(nodes) == 0 and len(labels) == 0
