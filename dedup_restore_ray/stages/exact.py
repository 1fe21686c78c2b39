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


def _assign_canonical(group: pd.DataFrame) -> pd.DataFrame:
    canon = group["doc_id"].min()
    out = group[["doc_id"]].copy()
    out["canonical_id"] = canon
    out["is_dup"] = out["doc_id"] != canon
    return out


def exact_dedup(ds: "ray.data.Dataset", hash_col: str = "content_hash",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """(hash_col, id_col, ...) -> (doc_id, canonical_id, is_dup).

    One shuffle.  The within-batch pre-dedup a combiner would do is
    intentionally omitted here: the hash column is 20 bytes/row, so the
    shuffle is tiny relative to the corpus (we shuffle keys, not text).
    """
    proj = ds.select_columns([hash_col, id_col])
    if hash_col != "content_hash":
        proj = proj.rename_columns({hash_col: "content_hash"})
    if id_col != "doc_id":
        proj = proj.rename_columns({id_col: "doc_id"})
    return proj.groupby("content_hash").map_groups(
        _assign_canonical, batch_format="pandas")


def _mark_canonical_arrow(group: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    canon = pc.min(group.column("doc_id"))
    n = len(group)
    canon_arr = pa.array([canon.as_py()] * n, group.schema.field("doc_id").type)
    is_dup = pc.not_equal(group.column("doc_id"), canon)
    return (group.append_column("canonical_id", canon_arr)
                 .append_column("is_dup", is_dup))


def exact_dedup_mark(signatures: "ray.data.Dataset") -> "ray.data.Dataset":
    """Full signature rows + (canonical_id, is_dup) — ONE shuffle keyed
    by content_hash produces both the assignment table and the
    canonical-representative set, with no driver-side state (the
    distributed replacement for the reference's in-heap fingerprint
    index).  Arrow-native map_groups so list<uint64> columns round-trip
    losslessly."""
    return signatures.groupby("content_hash").map_groups(
        _mark_canonical_arrow, batch_format="pyarrow")


def exact_dup_edges(assignments: "ray.data.Dataset") -> "ray.data.Dataset":
    """Edges (u=doc_id, v=canonical_id) for duplicate rows only —
    feed into clustering alongside near-dup edges."""

    def to_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dup = batch.filter(pc.field("is_dup"))
        return pa.table({"u": dup.column("doc_id"),
                         "v": dup.column("canonical_id")})

    return assignments.map_batches(to_edges, batch_format="pyarrow")


def _star_edges(group: pd.DataFrame) -> pd.DataFrame:
    ids = group["doc_id"].sort_values().to_numpy()
    if len(ids) < 2:
        return pd.DataFrame({"u": ids[:0], "v": ids[:0]})
    return pd.DataFrame({"u": [ids[0]] * (len(ids) - 1), "v": ids[1:]})


def keyed_dup_edges(ds: "ray.data.Dataset", key_col: str,
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """Star edges (min-id, other) within each key group — used for the
    norm-hash rail: docs with identical *normalized* token streams have
    shingle-Jaccard exactly 1 (incl. the degenerate all-empty group),
    so they merge without Jaccard verification."""
    proj = ds.select_columns([key_col, id_col])
    if id_col != "doc_id":
        proj = proj.rename_columns({id_col: "doc_id"})
    return proj.groupby(key_col).map_groups(_star_edges, batch_format="pandas")
