"""Exact dedup: content-hash groupby, first-wins canonical.

Semantics of the reference's fingerprint-index dedup
(reference: src/dedup.c:105-175): the first occurrence of a fingerprint
becomes canonical (gets a new chunk counter / container slot,
src/dedup.c:148-173); later occurrences become references to it
(src/dedup.c:135-146).  On Ray the index lookup becomes a
hash-partitioned shuffle: ``groupby(content_hash)`` brings every copy
of a key to one task; canonical = min(doc_id) (the deterministic
stand-in for the reference's global arrival counter — SURVEY §7.4
'global ordering without global counters').
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def exact_dedup(ds: "ray.data.Dataset", hash_col: str = "content_hash",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """(hash_col, id_col, ...) -> (doc_id, canonical_id, is_dup).

    One sort shuffle over (hash, id) only — we shuffle 20-byte keys,
    not text (SURVEY §4: minimize what moves)."""
    from dedup_restore_ray.stages.groups import mark_canonical
    proj = ds.select_columns([hash_col, id_col])
    if hash_col != "content_hash":
        proj = proj.rename_columns({hash_col: "content_hash"})
    if id_col != "doc_id":
        proj = proj.rename_columns({id_col: "doc_id"})
    return mark_canonical(proj, "content_hash").select_columns(
        ["doc_id", "canonical_id", "is_dup"])


def exact_dedup_mark(signatures: "ray.data.Dataset") -> "ray.data.Dataset":
    """Full signature rows + (canonical_id, is_dup) — ONE sort shuffle
    keyed by content_hash produces both the assignment table and the
    canonical-representative set, with no driver-side state (the
    distributed replacement for the reference's in-heap fingerprint
    index, src/diskhash.c / src/memstore.c)."""
    from dedup_restore_ray.stages.groups import mark_canonical
    return mark_canonical(signatures, "content_hash")


def source_overlap_matrix(rows: "ray.data.Dataset",
                          hash_col: str = "content_hash",
                          group_col: str = "source"
                          ) -> "ray.data.Dataset":
    """Cross-source duplication matrix: for every unordered source
    pair (a < b), the number of document pairs with IDENTICAL content
    across the two sources — the cross-snapshot / cross-domain overlap
    report a webtext dedup pipeline publishes (e.g. CommonCrawl
    snapshot-vs-snapshot duplication).

    SQL equivalent::

        SELECT a.source, b.source, count(*) FROM docs a JOIN docs b
        ON a.text = b.text WHERE a.source < b.source GROUP BY 1, 2

    — but the naive join is O(dup_cluster^2) rows moved.  Here the
    shuffle volume is one (hash, source) projection:

      1. grouped count per (hash, source)  — one sort, output is
         |distinct (text, source)| rows;
      2. per-hash cross products cnt_a*cnt_b over source pairs — the
         per-group fanout is <= C(|sources|, 2), vectorized by group
         size class (groups are tiny: #distinct sources per text);
      3. grouped sum per (source_a, source_b)  — output is the
         |sources|^2 matrix.

    Input: rows with [hash_col, group_col]."""
    import numpy as np
    from dedup_restore_ray.stages.groups import (group_bounds,
                                                 grouped_aggregate,
                                                 sorted_split)

    counts = grouped_aggregate(rows.select_columns([hash_col, group_col]),
                               [hash_col, group_col], {},
                               count_alias="cnt")

    def cross(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "source_a": pa.array([], b.schema.field(group_col).type),
            "source_b": pa.array([], b.schema.field(group_col).type),
            "w": pa.array([], pa.int64())})
        n = b.num_rows
        if n == 0:
            return empty
        starts, ends = group_bounds(b, [hash_col])
        sizes = ends - starts
        us, vs = [], []
        for s in np.unique(sizes):
            s = int(s)
            if s < 2:
                continue
            class_starts = starts[sizes == s]
            iu, iv = np.triu_indices(s, k=1)
            us.append((class_starts[:, None] + iu[None, :]).reshape(-1))
            vs.append((class_starts[:, None] + iv[None, :]).reshape(-1))
        if not us:
            return empty
        ui = np.concatenate(us)
        vi = np.concatenate(vs)
        cnt = np.asarray(b.column("cnt"), dtype=np.int64)
        src = b.column(group_col)
        # sources ascend within a hash group (sort key), so a < b
        return pa.table({"source_a": src.take(pa.array(ui)),
                         "source_b": src.take(pa.array(vi)),
                         "w": pa.array(cnt[ui] * cnt[vi], pa.int64())})

    interior, edge = sorted_split(counts, [hash_col, group_col],
                                  [hash_col])
    pairs = (interior.map_batches(cross, batch_format="pyarrow",
                                  batch_size=None)
             .union(edge.groupby(hash_col).map_groups(
                 lambda g: cross(g.sort_by(
                     [(hash_col, "ascending"),
                      (group_col, "ascending")])),
                 batch_format="pyarrow")))
    return grouped_aggregate(pairs, ["source_a", "source_b"],
                             {"n_pairs": ("w", "sum")})


def exact_dup_edges(assignments: "ray.data.Dataset") -> "ray.data.Dataset":
    """Edges (u=doc_id, v=canonical_id) for duplicate rows only —
    feed into clustering alongside near-dup edges."""

    def to_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dup = batch.filter(pc.field("is_dup"))
        return pa.table({"u": dup.column("doc_id"),
                         "v": dup.column("canonical_id")})

    return assignments.map_batches(to_edges, batch_format="pyarrow")


def keyed_dup_edges(ds: "ray.data.Dataset", key_col: str,
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """Star edges (min-id -> other) within each key group — used for
    the norm-hash rail: docs with identical *normalized* token streams
    have shingle-Jaccard exactly 1 (incl. the degenerate all-empty
    group), so they merge without Jaccard verification.  Built on the
    vectorized canonical marker: edge = (canonical, doc) for dup rows."""
    from dedup_restore_ray.stages.groups import mark_canonical
    proj = ds.select_columns([key_col, id_col])
    if id_col != "doc_id":
        proj = proj.rename_columns({id_col: "doc_id"})
    marked = mark_canonical(proj, key_col)

    def to_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dup = batch.filter(batch.column("is_dup").combine_chunks())
        return pa.table({"u": dup.column("canonical_id"),
                         "v": dup.column("doc_id")})

    return marked.map_batches(to_edges, batch_format="pyarrow")
