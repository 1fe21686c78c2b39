"""Direct random WRITE on the deduplicated store (reference R15:
``write_to_reloaded``, src/direct_rw.c:213-307).

The reference's update path: splice the new bytes into the affected
chunk range, write the spliced chunks as NEW files under fresh counter
ids (src/direct_rw.c:277-297), and patch the recipe entries in place
(src/direct_rw.c:299-301) — old chunks stay in their containers until
GC.  The Ray-Data formulation at document granularity:

  1. hash the new content of every updated doc (map_batches);
  2. rendezvous updates with the store by content hash (one
     sort-scatter — stages/cluster._scatter_lookup): content that
     already exists re-points the doc at the existing canonical
     (the dedup hit branch, src/dedup.c:135-146); content that
     doesn't exist gets a FRESH canonical id derived from the content
     hash (negative int / '~v:' prefix — disjoint from doc-id space,
     and idempotent: re-writing identical content converges on the
     same store row);
  3. first-wins marking picks one writer per fresh content
     (mark_canonical — the same kernel as exact dedup) and appends
     exactly one new store row per distinct new content;
  4. assignments are patched in place (anti-join out the updated
     docs' old rows, union the repointed rows) — the recipe patch.

Old store rows whose last reference was repointed remain until
``vacuum_store`` (the reference likewise leaves superseded chunks in
their containers).  Everything is shuffle/scatter — no driver-side
state beyond counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedup_restore_ray.functions.hashing import content_hashes_arrow
from dedup_restore_ray.stages.cluster import scatter_lookup_split
from dedup_restore_ray.stages.groups import mark_canonical
from dedup_restore_ray.stages.joins import anti_join, semi_join


@dataclass
class UpdateResult:
    assignments: "ray.data.Dataset"   # doc_id, canonical_id, is_dup (patched)
    store: "ray.data.Dataset"         # canonical_id, stored_text (appended)
    metrics: dict = field(default_factory=dict)


def _fresh_ids(hashes: list[bytes], id_type: pa.DataType) -> pa.Array:
    """Content-derived canonical id for newly written content, disjoint
    from the doc-id namespace (the reference's fresh chunk_counter ids,
    src/direct_rw.c:283-284 — but deterministic/idempotent: identical
    content maps to the same id on every run)."""
    h64 = np.frombuffer(b"".join(h[:8] for h in hashes), dtype=np.uint64)
    if pa.types.is_integer(id_type):
        # negative, nonzero: doc ids are non-negative
        vals = -((h64 >> np.uint64(1)).astype(np.int64) | np.int64(1))
        return pa.array(vals, id_type)
    return pa.array(["~v:" + h.hex() for h in hashes], id_type)


def _hash_col(ds: "ray.data.Dataset", text_col: str,
              out_cols: list[str]) -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        h = content_hashes_arrow(batch.column(text_col))
        cols = {c: batch.column(c) for c in out_cols}
        cols["content_hash"] = pa.array(h, pa.binary(20))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def apply_updates(assignments: "ray.data.Dataset",
                  store: "ray.data.Dataset",
                  updates: "ray.data.Dataset",
                  id_col: str = "doc_id",
                  text_col: str = "new_text",
                  collect_metrics: bool = True) -> UpdateResult:
    """Point-update documents in the deduplicated store.

    assignments: (doc_id, canonical_id, is_dup) — the recipe.
    store:       (canonical_id, stored_text) — the containers.
    updates:     (doc_id, new_text) — the writes.

    Returns patched assignments + store (old rows retained; see
    ``vacuum_store``) and, when ``collect_metrics``, the
    reference-style counters: n_updates, dedup_hits (existing content
    re-pointed), new_store_rows (fresh containers written),
    rewritten_bytes.  ``collect_metrics=False`` skips the count /
    take_all barriers those counters force (each one executes part of
    the DAG) — the patched datasets are identical either way.
    """
    updates = updates.materialize()
    n_updates = updates.count() if collect_metrics else None
    id_type_ds = assignments.schema()
    id_type = dict(zip(id_type_ds.names, id_type_ds.types))[id_col]

    up_hashed = _hash_col(updates, text_col, [id_col, text_col])
    store_hashed = _hash_col(store, "stored_text", ["canonical_id"])

    # ONE sort-scatter rendezvous yields both branches (hits = content
    # already stored, misses = genuinely new content with their texts)
    hits, misses = scatter_lookup_split(
        up_hashed, store_hashed, key_col="content_hash",
        payload_col="canonical_id",
        out_cols=[id_col, text_col, "content_hash"])
    n_hits = None
    if collect_metrics:
        hits = hits.materialize()
        n_hits = hits.count()

    def hit_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            "canonical_id": b.column("canonical_id"),
            "is_dup": pc.not_equal(b.column("canonical_id"),
                                   b.column(id_col)),
        })

    patched_hits = hits.map_batches(hit_rows, batch_format="pyarrow")

    def add_fresh(b: pa.Table) -> pa.Table:
        fresh = _fresh_ids(b.column("content_hash").to_pylist(), id_type)
        return pa.table({id_col: b.column(id_col),
                         text_col: b.column(text_col),
                         "new_canonical": fresh})

    miss_rows = misses.map_batches(add_fresh, batch_format="pyarrow")
    # first-wins writer election per fresh content — the exact-dedup
    # kernel (one sort; the content hash is the key via new_canonical)
    marked = mark_canonical(miss_rows, "new_canonical",
                            id_col=id_col).materialize()

    def writer_rows(b: pa.Table) -> pa.Table:
        keep = pc.invert(b.column("is_dup").combine_chunks())
        w = b.filter(keep)
        return pa.table({"canonical_id": w.column("new_canonical"),
                         "stored_text": w.column(text_col)})

    new_store_rows = marked.map_batches(writer_rows,
                                        batch_format="pyarrow")
    n_new = rewritten_bytes = None
    if collect_metrics:
        new_store_rows = new_store_rows.materialize()
        n_new = new_store_rows.count()
        rewritten = new_store_rows.map_batches(
            lambda b: pa.table({"n": pa.array(
                [int(pc.sum(pc.utf8_length(b.column("stored_text"))).as_py()
                     or 0)], pa.int64())}),
            batch_format="pyarrow").take_all()
        rewritten_bytes = sum(r["n"] for r in rewritten)

    def miss_assign(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b.column(id_col),
                         "canonical_id": b.column("new_canonical"),
                         "is_dup": b.column("is_dup")})

    patched_misses = marked.map_batches(miss_assign, batch_format="pyarrow")

    # --- recipe patch: replace updated docs' rows in place ------------
    # The update set is usually tiny next to the corpus: below the
    # broadcast gate, anti-filter with a packed sorted uint64 id-hash
    # array + searchsorted (zero-copy broadcast, no shuffle) instead of
    # the sort-based anti_join — same gate discipline as the flagship's
    # canonical filter (pipelines/dedup.py).
    from dedup_restore_ray.config import PipelineConfig
    broadcast_limit = PipelineConfig().broadcast_limit
    asg = assignments.select_columns([id_col, "canonical_id", "is_dup"])
    if updates.count() <= broadcast_limit:
        import ray as _ray
        from dedup_restore_ray.stages.verify import _id_hashes
        parts = [_id_hashes(b.column(id_col))
                 for b in updates.iter_batches(batch_size=65536,
                                               batch_format="pyarrow")]
        keys = (np.sort(np.concatenate(parts)) if parts
                else np.empty(0, np.uint64))
        kref = _ray.put(keys)

        def not_updated(b: pa.Table) -> pa.Table:
            k = _ray.get(kref)
            if not len(k) or not b.num_rows:
                return b
            ih = _id_hashes(b.column(id_col))
            pos = np.searchsorted(k, ih)
            pos[pos == len(k)] = len(k) - 1
            return b.filter(pa.array(k[pos] != ih))

        untouched = asg.map_batches(not_updated, batch_format="pyarrow")
    else:
        untouched = anti_join(asg, updates.select_columns([id_col]), id_col)
    # coalesce the deep union-of-scatter DAG so downstream sorts
    # (restore, further updates) don't hit the tiny-block sort stall
    from dedup_restore_ray.stages.groups import flatten_blocks
    new_assignments = flatten_blocks(
        untouched.union(patched_hits).union(patched_misses))
    new_store = store.union(new_store_rows)

    metrics = {}
    if collect_metrics:
        metrics = {
            "n_updates": n_updates,
            "dedup_hits": n_hits,
            "new_store_rows": n_new,
            "rewritten_bytes": rewritten_bytes,
        }
    return UpdateResult(
        assignments=new_assignments,
        store=new_store,
        metrics=metrics)


def vacuum_store(assignments: "ray.data.Dataset",
                 store: "ray.data.Dataset") -> "ray.data.Dataset":
    """GC pass: drop store rows no assignment references any more
    (the reference has no online GC — superseded chunks sit in their
    containers; this is the offline compaction a real deployment runs).
    One distributed semi-join."""
    keys = assignments.map_batches(
        lambda b: pa.table({"canonical_id": b.column("canonical_id")}),
        batch_format="pyarrow")
    return semi_join(store, keys, "canonical_id")
