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
