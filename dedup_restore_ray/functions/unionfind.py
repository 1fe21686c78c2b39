"""Union-find over duplicate-pair edges.

Two interchangeable implementations of the clustering fixpoint
(north_rule: 'iterative union-find implemented as repeated
groupby-min-label propagation until fixpoint'):

- ``UnionFind``: classic path-compressed driver-side structure for
  graphs that fit one machine (the candidate graph after exact dedup is
  a small fraction of the corpus).
- ``min_label_rounds``: one round of the distributed formulation —
  pure numpy on (node, label) + edge arrays; the Ray stage
  (stages/cluster.py) drives rounds until no label changes.

Both produce identical fixpoints: cluster label = min node id in the
connected component (tested in tests/test_cluster.py).
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    """Path-halving union-find keyed by arbitrary hashables."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            root = parent[root]
        # path compression
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # min-label wins → deterministic canonical representative
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def labels(self) -> dict:
        """node -> min-id-in-component for every node ever seen."""
        return {x: self.find(x) for x in list(self.parent)}


def min_label_round(
    labels: dict, edges_u: np.ndarray | list, edges_v: np.ndarray | list
) -> tuple[dict, int]:
    """One synchronous min-label propagation round over an edge list.

    new_label(n) = min(label(n), min over neighbors m of label(m)).
    Returns (new_labels, num_changed).  Used by tests as the oracle for
    the distributed stage.
    """
    new = dict(labels)
    changed = 0
    for u, v in zip(edges_u, edges_v):
        lu, lv = new[u], new[v]
        if lu < lv:
            new[v] = lu
        elif lv < lu:
            new[u] = lv
    for k in new:
        if new[k] != labels[k]:
            changed += 1
    return new, changed


def connected_component_labels(edges: list[tuple]) -> dict:
    """min-id component labels for all nodes appearing in edges."""
    uf = UnionFind()
    for u, v in edges:
        uf.union(u, v)
    return uf.labels()
