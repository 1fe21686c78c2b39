"""Clustering: union-find via iterative groupby-min-label propagation.

north_rule: 'merged into duplicate clusters via an iterative union-find
implemented as repeated groupby-min-label propagation until fixpoint'.

Formulation.  Nodes = docs appearing in >= 1 duplicate edge (a small
fraction of the corpus — exact dups were already collapsed and LSH
candidates are verified).  label(n) starts as n; each round:

    new_label(n) = min(label(n), min_{(n,m) in E} label(m))

until no label changes (fixpoint = min node id per connected component,
identical to union-find — proven equivalent in tests/test_cluster.py).

Execution tiers (all produce the identical fixpoint — tested):
  1. ``cluster_union_find`` — driver-side path compression; default
     while the edge list fits one machine.
  2. ``cluster_label_propagation`` — grouped-min rounds with a
     broadcast label map (``ray.put`` once per round; the label table
     covers only duplicate docs, SURVEY §4 'broadcast small sides').
  3. ``cluster_label_propagation_distributed`` — no driver state at
     all: per-round neighbor-label delivery via the sort-scatter
     lookup (_scatter_lookup) + grouped min; convergence detected by a
     monotone label-multiset hash.  (Ray's ``Dataset.join`` is avoided
     deliberately — it fails on union-produced block layouts.)
Round count is bounded: with min-label propagation over both edge
directions the label of a component's minimum reaches every node in
<= diameter rounds; cfg.max_label_rounds caps pathological chains.
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


def cluster_union_find_arrays(edges: "ray.data.Dataset"
                              ) -> tuple[pa.Array, pa.Array]:
    """Vectorized driver-tier connected components: ``(nodes,
    labels)`` Arrow arrays with label = MIN member id per component —
    the same fixpoint as ``UnionFind.labels()`` (parity-tested).

    The dict union-find walked every edge as a Python tuple: at 8M
    docs (~1M+ edges) that loop was a fixed 7-8 s on BOTH scaling
    legs — the largest remaining serial term of the flagship.  Here
    endpoints are dictionary-encoded once (Arrow C++), relabeled to
    their sort rank so min-rank == min-id, and components resolve by
    min-label propagation with pointer doubling (``lab = lab[lab]``)
    — O(E) numpy work per pass, O(log n) passes."""
    import pyarrow.compute as pc

    us, vs = [], []
    for b in edges.iter_batches(batch_size=1 << 20,
                                batch_format="pyarrow"):
        us.append(b.column("u").combine_chunks())
        vs.append(b.column("v").combine_chunks())
    if not us or all(len(c) == 0 for c in us):
        empty = pa.array([], pa.int64())
        return empty, empty
    both = pa.chunked_array(us + vs).combine_chunks()
    d = pc.dictionary_encode(both)
    idx = np.asarray(d.indices, dtype=np.int64)
    n_edges = len(both) // 2
    vocab = d.dictionary
    # rank nodes by VALUE order so the minimum rank is the minimum id
    order = np.asarray(pc.sort_indices(vocab), dtype=np.int64)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[order] = np.arange(len(vocab), dtype=np.int64)
    ui = rank[idx[:n_edges]]
    vi = rank[idx[n_edges:]]
    lab = np.arange(len(vocab), dtype=np.int64)
    while True:
        prev = lab.copy()
        np.minimum.at(lab, ui, lab[vi])
        np.minimum.at(lab, vi, lab[ui])
        lab = lab[lab]                      # pointer doubling
        if np.array_equal(lab, prev):
            break
    # back to value space: node (vocab[j]) -> vocab[order[lab[rank[j]]]]
    sorted_vocab = vocab.take(pa.array(order))
    labels = sorted_vocab.take(pa.array(lab[rank]))
    return vocab, labels


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


def _pa_schema(ds: "ray.data.Dataset") -> pa.Schema:
    s = ds.schema()
    if s is None:       # empty dataset: Dataset.schema() returns None
        raise ValueError(
            "dataset has no schema (empty input to a join/scatter "
            "stage) — filter/guard empty sides before the rendezvous")
    return pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])


def _scatter_sorted_runs(refs: "ray.data.Dataset",
                         store: "ray.data.Dataset",
                         key_col: str, payload_col: str,
                         out_cols: list[str]):
    """Shared plumbing for the sort-scatter lookups: tag store rows
    (slot -1) and ref rows (slot 0), co-sort on (key, slot), return
    (interior, edge, payload_type).  The sorted run is materialized
    once (inside sorted_split) and can feed several kernels."""
    from dedup_restore_ray.stages.groups import sorted_split

    payload_type = _pa_schema(store).field(payload_col).type
    refs_schema = _pa_schema(refs)

    def store_rows(b: pa.Table) -> pa.Table:
        cols = {key_col: b.column(key_col),
                "slot": pa.array(np.full(b.num_rows, -1, np.int8)),
                payload_col: b.column(payload_col)}
        for c in out_cols:
            if c in b.schema.names:
                cols[c] = b.column(c)
            else:
                cols[c] = pa.nulls(b.num_rows, refs_schema.field(c).type)
        return pa.table(cols)

    def ref_rows(b: pa.Table) -> pa.Table:
        cols = {key_col: b.column(key_col),
                "slot": pa.array(np.zeros(b.num_rows, np.int8)),
                payload_col: pa.nulls(b.num_rows, payload_type)}
        for c in out_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    rows = (store.map_batches(store_rows, batch_format="pyarrow")
            .union(refs.map_batches(ref_rows, batch_format="pyarrow")))
    interior, edge = sorted_split(rows, [key_col, "slot"], [key_col])
    return interior, edge, payload_type


def _make_scatter_kernel(key_col: str, payload_col, payload_type,
                         out_cols: list[str], emit: str):
    """Block kernel over (key, slot)-sorted rows.  emit='hit' -> refs
    whose key group leads with a store row, payload attached;
    emit='miss' -> refs whose group has no store row (out_cols only);
    emit='both' -> every ref with payload (null on miss) + __hit flag."""
    from dedup_restore_ray.stages.groups import group_bounds

    def scatter(b: pa.Table) -> pa.Table:
        fields = [(c, b.schema.field(c).type) for c in out_cols]
        if emit in ("hit", "both"):
            fields = fields + [(payload_col, payload_type)]
        if emit == "both":
            fields = fields + [("__hit", pa.bool_())]
        out_schema = pa.schema(fields)
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        sizes = ends - starts
        slot = np.asarray(b.column("slot"))
        has_store = slot[starts] == -1
        hit_rows = np.repeat(has_store, sizes)
        if emit == "hit":
            ref_mask = (slot >= 0) & hit_rows
        elif emit == "miss":
            ref_mask = (slot >= 0) & ~hit_rows
        else:
            ref_mask = slot >= 0
        rr = np.flatnonzero(ref_mask)
        if len(rr) == 0:
            return out_schema.empty_table()
        cols = {c: b.column(c).take(pa.array(rr)) for c in out_cols}
        if emit in ("hit", "both"):
            store_idx = np.repeat(starts, sizes)
            # misses take their own (null) payload cell
            src = np.where(hit_rows[rr], store_idx[rr], rr)
            cols[payload_col] = b.column(payload_col).take(pa.array(src))
        if emit == "both":
            cols["__hit"] = pa.array(hit_rows[rr])
        return pa.table(cols)

    return scatter


def _apply_scatter(interior, edge, key_col, kernel):
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(key_col, "ascending"), ("slot", "ascending")])),
                batch_format="pyarrow")))


def scatter_lookup_split(refs: "ray.data.Dataset",
                         store: "ray.data.Dataset",
                         key_col: str, payload_col: str,
                         out_cols: list[str]
                         ) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """One sort-scatter pass returning BOTH (hits, misses): hits carry
    out_cols + payload_col; misses carry out_cols only (refs whose key
    has no store row).  ONE sort + ONE residual groupby total: a
    combined kernel tags every ref hit/miss, the tagged result is
    materialized once (coalesced), and the two outputs are cheap
    filters over it — where sequential lookup + anti-join would pay
    two sorts and two residual shuffles."""
    interior, edge, ptype = _scatter_sorted_runs(refs, store, key_col,
                                                 payload_col, out_cols)
    both_k = _make_scatter_kernel(key_col, payload_col, ptype, out_cols,
                                  "both")
    from dedup_restore_ray.stages.groups import flatten_blocks
    combined = flatten_blocks(
        _apply_scatter(interior, edge, key_col, both_k))

    def hits_of(b: pa.Table) -> pa.Table:
        sel = b.filter(b.column("__hit").combine_chunks())
        return sel.drop_columns(["__hit"])

    def misses_of(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sel = b.filter(pc.invert(b.column("__hit").combine_chunks()))
        return sel.drop_columns(["__hit", payload_col])

    return (combined.map_batches(hits_of, batch_format="pyarrow"),
            combined.map_batches(misses_of, batch_format="pyarrow"))


def _scatter_lookup(refs: "ray.data.Dataset", store: "ray.data.Dataset",
                    key_col: str, payload_col: str, out_cols: list[str]
                    ) -> "ray.data.Dataset":
    """Distributed key->payload lookup via one sort-scatter (no
    Dataset.join): ``store`` rows (slot -1) lead each key group after a
    sort on (key, slot); a vectorized take replicates the payload onto
    the reference rows.  refs must carry key_col + out_cols; output =
    out_cols + payload_col.  Keys absent from the store drop their
    refs."""
    interior, edge, ptype = _scatter_sorted_runs(refs, store, key_col,
                                                 payload_col, out_cols)
    hit_k = _make_scatter_kernel(key_col, payload_col, ptype, out_cols,
                                 "hit")
    return _apply_scatter(interior, edge, key_col, hit_k)


def cluster_label_propagation_distributed(edges: "ray.data.Dataset",
                                          cfg: PipelineConfig | None = None
                                          ) -> "ray.data.Dataset":
    """Fully distributed min-label propagation — NO driver-side label
    map.  Each round: one sort-scatter delivers label(v) to u (and
    label(u) to v), one grouped min folds messages with current labels.
    The formulation for graphs beyond ``cfg.broadcast_limit`` nodes;
    per-round cost is ~2 sort shuffles of the (small) label/edge
    tables, so prefer the broadcast variant when the label table fits
    one machine.  Returns the fixpoint Dataset (node, label)."""
    from dedup_restore_ray.stages.groups import (distinct_rows,
                                                 grouped_aggregate)
    cfg = cfg or PipelineConfig()
    edges = edges.select_columns(["u", "v"]).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            b.column("u").combine_chunks(),
            b.column("v").combine_chunks()])})

    nodes = distinct_rows(
        edges.map_batches(endpoints, batch_format="pyarrow"), ["node"])
    labels = nodes.map_batches(
        lambda b: b.append_column("label", b.column("node")),
        batch_format="pyarrow").materialize()
    n_nodes = labels.count()

    def both_dir(b: pa.Table) -> pa.Table:
        # (key=v, dst=u) and (key=u, dst=v): deliver each endpoint's
        # label to its partner
        return pa.table({
            "node": pa.concat_arrays([b.column("v").combine_chunks(),
                                      b.column("u").combine_chunks()]),
            "dst": pa.concat_arrays([b.column("u").combine_chunks(),
                                     b.column("v").combine_chunks()]),
        })

    refs = edges.map_batches(both_dir, batch_format="pyarrow").materialize()

    # fold width for the per-round repartition: scale with the cluster
    # so rounds don't serialize on a fixed block count at larger sizes
    try:
        fold_width = max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        fold_width = 8

    # convergence: min-label propagation is monotone, so the label
    # multiset shrinks strictly until fixpoint — compare a cheap
    # order-independent reduction instead of a join.  Hashing is fully
    # vectorized (arrow_row_hashes: splitmix64 / rolling-hash over the
    # flat string buffer, no to_pylist), and each round computes ONE
    # signature: last round's new_sig is this round's old_sig.
    def lsum(b: pa.Table) -> pa.Table:
        from dedup_restore_ray.functions.hashing import arrow_row_hashes
        h = arrow_row_hashes(b.column("label"))
        with np.errstate(over="ignore"):
            s = int(np.sum(h, dtype=np.uint64))
        return pa.table({"s": pa.array([s], pa.uint64())})

    def sig_of(ds: "ray.data.Dataset") -> int:
        return sum(r["s"] for r in ds.map_batches(
            lsum, batch_format="pyarrow").take_all()) & 0xFFFFFFFFFFFFFFFF

    prev_sig = sig_of(labels)
    for _round in range(cfg.max_label_rounds):
        msgs = _scatter_lookup(refs, labels, key_col="node",
                               payload_col="label", out_cols=["dst"])
        msgs = msgs.map_batches(
            lambda b: pa.table({"node": b.column("dst"),
                                "label": b.column("label")}),
            batch_format="pyarrow")
        # repartition+materialize before the aggregate sort: the union
        # DAG accumulates tiny blocks each round, and Ray's sort
        # planner over-estimates memory from block counts (observed:
        # '13GB driver memory' for a 10-row dataset) and stalls
        folded = msgs.union(labels).repartition(fold_width).materialize()
        new_labels = grouped_aggregate(
            folded, ["node"], {"label": ("label", "min")}).materialize()
        new_sig = sig_of(new_labels)
        labels = new_labels
        if new_sig == prev_sig:
            break
        prev_sig = new_sig
    assert labels.count() == n_nodes
    return labels


def attach_cluster_ids_distributed(assignments: "ray.data.Dataset",
                                   labels: "ray.data.Dataset"
                                   ) -> "ray.data.Dataset":
    """Beyond-broadcast cluster attachment: the label lookup is the
    same sort-scatter; docs whose canonical is outside the duplicate
    graph cluster alone (label = own canonical)."""
    lab = labels.map_batches(
        lambda b: pa.table({"canonical_id": b.column("node"),
                            "cluster_label": b.column("label")}),
        batch_format="pyarrow")
    refs = assignments.select_columns(["doc_id", "canonical_id", "is_dup"])
    hit = _scatter_lookup(refs, lab, key_col="canonical_id",
                          payload_col="cluster_label",
                          out_cols=["doc_id", "canonical_id", "is_dup"])
    hit = hit.map_batches(
        lambda b: (b.append_column("cluster_id", b.column("cluster_label"))
                   .drop_columns(["cluster_label"])),
        batch_format="pyarrow")
    # misses: docs whose canonical has no label row — self-cluster.
    # recover them distributively: all assignments minus hits by doc_id
    # is exactly the set whose canonical is absent from labels; since
    # labels covers every node with >= 1 edge, misses are docs whose
    # canonical never appeared in an edge -> canonical IS the cluster.
    labset_rows = lab.map_batches(
        lambda b: pa.table({"canonical_id": b.column("canonical_id")}),
        batch_format="pyarrow")
    miss = _anti_by_key(refs, labset_rows, "canonical_id")
    miss = miss.map_batches(
        lambda b: b.append_column("cluster_id", b.column("canonical_id")),
        batch_format="pyarrow")
    return hit.union(miss)


def _anti_by_key(refs: "ray.data.Dataset", keys: "ray.data.Dataset",
                 key_col: str) -> "ray.data.Dataset":
    """Distributed anti-semijoin via the same sort-scatter trick: key
    rows (slot -1) mark present keys; ref rows in groups WITHOUT a key
    row survive."""
    from dedup_restore_ray.stages.groups import group_bounds, sorted_split

    # capture the refs schema ONCE — Dataset.schema() inside a
    # per-batch closure can trigger plan execution on every call
    refs_schema = _pa_schema(refs)
    out_fields = list(refs_schema.names)

    def key_rows(b: pa.Table) -> pa.Table:
        cols = {key_col: b.column(key_col),
                "slot": pa.array(np.full(b.num_rows, -1, np.int8))}
        for f in out_fields:
            if f != key_col:
                cols[f] = pa.nulls(b.num_rows, refs_schema.field(f).type)
        return pa.table(cols)

    def ref_rows(b: pa.Table) -> pa.Table:
        cols = {key_col: b.column(key_col),
                "slot": pa.array(np.zeros(b.num_rows, np.int8))}
        for f in out_fields:
            if f != key_col:
                cols[f] = b.column(f)
        return pa.table(cols)

    rows = (keys.map_batches(key_rows, batch_format="pyarrow")
            .union(refs.map_batches(ref_rows, batch_format="pyarrow")))

    def pick_missing(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([(f, refs_schema.field(f).type)
                                for f in out_fields])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        sizes = ends - starts
        slot = np.asarray(b.column("slot"))
        no_store = slot[starts] != -1
        ref_mask = (slot >= 0) & np.repeat(no_store, sizes)
        rr = np.flatnonzero(ref_mask)
        return pa.table({f: b.column(f).take(pa.array(rr))
                         for f in out_fields})

    interior, edge = sorted_split(rows, [key_col, "slot"], [key_col])
    return (interior.map_batches(pick_missing, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: pick_missing(g.sort_by(
                    [(key_col, "ascending"), ("slot", "ascending")])),
                batch_format="pyarrow")))


def attach_cluster_ids(assignments: "ray.data.Dataset",
                       labels: "dict | tuple",
                       exact_canonical: bool = True) -> "ray.data.Dataset":
    """exact-dedup assignments (doc_id, canonical_id, is_dup) + near-dup
    labels {canonical -> cluster} (a dict, or the (nodes, labels)
    Arrow-array pair from cluster_union_find_arrays) -> final
    (doc_id, cluster_id).

    A doc's cluster: follow its exact canonical, then that canonical's
    near-dup component label; docs untouched by any edge cluster alone
    (cluster_id = own canonical id).

    The label side is broadcast as a packed (sorted uint64 key hash,
    Arrow value array) pair, not a dict — a dict ref deserializes the
    whole Python map in every task, while the pack is zero-copy from
    the object store and looked up with one searchsorted per batch
    (the same idiom as ``only_canonical`` in pipelines/dedup.py).
    Integer ids hash via the bijective splitmix64, so the probe is
    exact; string ids share the pair chain's negligible-collision
    rolling hash (_id_hashes docstring)."""
    import pyarrow.compute as pc

    from dedup_restore_ray.stages.verify import _id_hashes

    if isinstance(labels, tuple):
        keys, label_vals = labels
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if isinstance(label_vals, pa.ChunkedArray):
            label_vals = label_vals.combine_chunks()
    elif labels:
        keys = pa.array(list(labels.keys()))
        label_vals = pa.array(list(labels.values()))
    else:
        keys = None

    if keys is None or len(keys) == 0:
        def passthrough(b: pa.Table) -> pa.Table:
            return b.append_column(
                "cluster_id", b.column("canonical_id").combine_chunks())
        return assignments.map_batches(passthrough,
                                       batch_format="pyarrow")

    kh = _id_hashes(keys)
    order = np.argsort(kh, kind="stable")
    vals = label_vals.take(pa.array(order.astype(np.int64)))
    ref = ray.put((kh[order], vals))

    def assign(batch: pa.Table) -> pa.Table:
        kh_s, vals_s = ray.get(ref)
        canon = batch.column("canonical_id").combine_chunks()
        ih = _id_hashes(canon)
        pos = np.searchsorted(kh_s, ih)
        np.minimum(pos, len(kh_s) - 1, out=pos)
        hit = kh_s[pos] == ih
        mapped = vals_s.take(
            pa.array(np.where(hit, pos, 0).astype(np.int64)))
        if mapped.type != canon.type:
            mapped = mapped.cast(canon.type)
        cluster = pc.if_else(pa.array(hit), mapped, canon)
        return batch.append_column("cluster_id", cluster)

    return assignments.map_batches(assign, batch_format="pyarrow")
