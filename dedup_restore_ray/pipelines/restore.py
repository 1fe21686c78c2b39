"""Restore / reconstruction: duplicate-aware storage -> full corpus.

The reference's restore engine reads a recipe (ordered chunk refs),
groups refs by container so each container is read once, and scatters
bytes into ordered assembly buffers (reference: src/look_ahead.c:710-840,
R1-R3 in SURVEY §2.5).  The Ray formulation:

  recipe   = assignments (doc_id -> canonical_id)      [one row per doc]
  container= canonical text store (canonical_id -> text)
  restore  = join recipe x store on canonical_id, reorder by doc_id

The join IS the 'group by container, read once' optimization: hash
partitioning brings every reference to a canonical together with its
single stored copy, so each stored row is fetched once per partition —
the exact analogue of the look-ahead window's container grouping.

Strategies:
  - broadcast: canonical store shipped once via ray.put (small store);
  - sort: the sort-scatter machinery of stages/groups.py (store rows
    and reference rows co-sorted on canonical_id) — fully distributed.

Invariant (the reference's restored-bytes check,
src/look_ahead.c:204-215): restored text is byte-identical to the
original for every doc (verified in tests via content hashes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dedup_restore_ray.stages.groups import group_bounds, sorted_split


def canonical_store(docs: "ray.data.Dataset", assignments: "ray.data.Dataset",
                    id_col: str = "doc_id", text_col: str = "text"
                    ) -> "ray.data.Dataset":
    """The deduplicated store: text of canonical docs only (the
    'containers' — unique content, stored once).

    Canonical membership is broadcast as a packed sorted uint64
    id-hash array (zero-copy from the object store; a Python set would
    fully unpickle in every task) and tested with one vectorized
    searchsorted per batch — same pattern as the canonical filter in
    pipelines/dedup.py."""
    import pyarrow.compute as pc
    from dedup_restore_ray.stages.verify import _id_hashes

    canon_parts = []
    for b in assignments.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
        keep = pc.invert(b.column("is_dup").combine_chunks())
        canon_parts.append(_id_hashes(b.filter(keep).column("doc_id")))
    canon_hashes = (np.sort(np.concatenate(canon_parts)) if canon_parts
                    else np.empty(0, np.uint64))
    ref = ray.put(canon_hashes)

    def filt(batch: pa.Table) -> pa.Table:
        ch = ray.get(ref)
        ih = _id_hashes(batch.column(id_col))
        pos = np.searchsorted(ch, ih)
        pos[pos == len(ch)] = max(len(ch) - 1, 0)
        mask = (ch[pos] == ih) if len(ch) else np.zeros(len(ih), bool)
        out = batch.filter(pa.array(mask)).select([id_col, text_col])
        return out.rename_columns(["canonical_id", "stored_text"])

    return docs.map_batches(filt, batch_format="pyarrow")


def windowed_restore(assignments: "ray.data.Dataset",
                     store: "ray.data.Dataset",
                     window_size: int = 1024,
                     order_cols: tuple = ("doc_id",)) -> dict:
    """Look-ahead-window restore (reference R1-R3/R5:
    src/look_ahead.c:710-840): stream the recipe in windows of
    ``window_size`` ordered refs; per window, group refs by canonical
    so each stored row ('container') is fetched ONCE per window, then
    scatter texts back into recipe order.

    Returns the reference's restore-efficiency counters
    (src/optsmr.c:319-324): total_container_read (stored-row fetches,
    the quantity the whole LAW/FAA apparatus minimizes — it shrinks as
    window_size grows), restored_rows, restored_bytes, plus a content
    hash of the restored stream for byte-identity checks.

    On Ray the window is the unit of driver-side batching; the
    per-window gather itself is a broadcast lookup against the store
    (small side).  This operator exists for parity with the
    reference's windowed restore (R5-R12) — the one-shot
    ``restore_corpus`` is the production path, where the groupby makes
    every container read exactly once for the WHOLE job (the
    window_size -> infinity limit).
    """
    import hashlib
    texts: dict = {}
    for b in store.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for c, t in zip(b.column("canonical_id").to_pylist(),
                        b.column("stored_text").to_pylist()):
            texts[c] = t
    total_container_read = 0
    restored_rows = 0
    restored_bytes = 0
    digest = hashlib.sha1()
    ordered = assignments.sort(list(order_cols))
    for win in ordered.iter_batches(batch_size=window_size,
                                    batch_format="pyarrow"):
        refs = win.column("canonical_id").to_pylist()
        # group refs by container: one fetch per distinct canonical.
        # A canonical missing from the store is a store/recipe
        # inconsistency — fail loudly (the reference's restore depends
        # hard on container reads succeeding, src/look_ahead.c:374-443)
        window_cache = {}
        for c in refs:
            if c not in window_cache:
                if c not in texts:
                    raise KeyError(
                        f"canonical_id {c!r} referenced by recipe is "
                        f"absent from the store (windowed_restore)")
                window_cache[c] = texts[c]
                total_container_read += 1
        for c in refs:
            t = window_cache[c]
            restored_rows += 1
            restored_bytes += len(t)
            digest.update(t.encode())
            digest.update(b"\x00")
    return {
        "total_container_read": total_container_read,
        "restored_rows": restored_rows,
        "restored_bytes": restored_bytes,
        "window_size": window_size,
        "restored_sha1": digest.hexdigest(),
    }


def restore_corpus(assignments: "ray.data.Dataset",
                   store: "ray.data.Dataset",
                   strategy: str = "sort") -> "ray.data.Dataset":
    """(doc_id, canonical_id) x (canonical_id, stored_text) ->
    (doc_id, restored_text)."""
    if strategy == "broadcast":
        texts = {}
        for b in store.iter_batches(batch_size=8192, batch_format="pyarrow"):
            for k, t in zip(b.column("canonical_id").to_pylist(),
                            b.column("stored_text").to_pylist()):
                texts[k] = t
        ref = ray.put(texts)

        def gather(batch: pa.Table) -> pa.Table:
            tmap = ray.get(ref)
            refs_ = batch.column("canonical_id").to_pylist()
            missing = [c for c in refs_ if c not in tmap]
            if missing:
                raise KeyError(
                    f"{len(missing)} canonical ids referenced by the "
                    f"recipe are absent from the store (first: "
                    f"{missing[0]!r})")
            restored = [tmap[c] for c in refs_]
            return pa.table({"doc_id": batch.column("doc_id"),
                             "restored_text": pa.array(restored, pa.string())})

        return assignments.map_batches(gather, batch_format="pyarrow")

    if strategy == "sort":
        # sort-scatter: store rows (slot -1) lead each canonical group,
        # reference rows follow; one vectorized take replicates text.
        def store_rows(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "canonical_id": b.column("canonical_id"),
                "slot": pa.array(np.full(n, -1, np.int8)),
                "doc_id": b.column("canonical_id"),
                "text": b.column("stored_text"),
            })

        def ref_rows(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "canonical_id": b.column("canonical_id"),
                "slot": pa.array(np.zeros(n, np.int8)),
                "doc_id": b.column("doc_id"),
                "text": pa.array([None] * n, pa.string()),
            })

        rows = (store.map_batches(store_rows, batch_format="pyarrow")
                .union(assignments.select_columns(["doc_id", "canonical_id"])
                       .map_batches(ref_rows, batch_format="pyarrow")))

        def scatter(b: pa.Table) -> pa.Table:
            out_schema = pa.schema([
                ("doc_id", b.schema.field("doc_id").type),
                ("restored_text", pa.string())])
            n = b.num_rows
            if n == 0:
                return out_schema.empty_table()
            starts, ends = group_bounds(b, ["canonical_id"])
            sizes = ends - starts
            slot = np.asarray(b.column("slot"))
            has_store = slot[starts] == -1
            store_idx = np.repeat(starts, sizes)
            ref_mask = (slot >= 0) & np.repeat(has_store, sizes)
            # refs whose canonical group has no store row = store/
            # recipe inconsistency — fail loudly rather than dropping
            orphan = (slot >= 0) & ~np.repeat(has_store, sizes)
            if orphan.any():
                bad = b.column("canonical_id").take(
                    pa.array(np.flatnonzero(orphan)[:1]))[0].as_py()
                raise KeyError(
                    f"canonical_id {bad!r} referenced by recipe is "
                    f"absent from the store (restore_corpus sort path)")
            rr = np.flatnonzero(ref_mask)
            if len(rr) == 0:
                return out_schema.empty_table()
            return pa.table({
                "doc_id": b.column("doc_id").take(pa.array(rr)),
                "restored_text": b.column("text").take(
                    pa.array(store_idx[rr])),
            })

        interior, edge = sorted_split(rows, ["canonical_id", "slot"],
                                      ["canonical_id"])
        return (interior.map_batches(scatter, batch_format="pyarrow",
                                     batch_size=None)
                .union(edge.groupby("canonical_id").map_groups(
                    lambda g: scatter(g.sort_by(
                        [("canonical_id", "ascending"),
                         ("slot", "ascending")])),
                    batch_format="pyarrow")))

    raise ValueError(f"unknown strategy {strategy!r}")
