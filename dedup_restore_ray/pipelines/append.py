"""Incremental (append) dedup: dedup a NEW shard against an EXISTING
store without recomputing the store.

The reference's fingerprint index persists across backup streams — a
chunk arriving in stream N+1 dedups against everything stream 1..N
wrote (reference: src/dedup.c index lifetime across trace_work
batches).  The Ray-native analogue is a persisted
``(content_hash, canonical_id)`` hash-store table plus ONE co-sort per
appended shard: store rows (slot -1) lead their hash group, so a
vectorized first-wins kernel assigns every new doc either the store's
canonical (hash already known) or the min new doc id (first occurrence
in this shard) — no driver-resident index, no rescan of old text.

Semantics note: store-wins differs from batch first-wins only when id
order interleaves shards; when appended ids are all newer (the backup
stream case), incremental == batch bit-for-bit
(TestAppendDedup::test_equals_batch_when_ids_ordered).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from dedup_restore_ray.functions.hashing import content_hashes_arrow


def hash_new_docs(docs: "ray.data.Dataset", id_col: str = "doc_id",
                  text_col: str = "text") -> "ray.data.Dataset":
    """(content_hash binary(20), doc_id) for an incoming shard."""
    def f(b: pa.Table) -> pa.Table:
        # fill_null first: this path hashes missing text as sha1(b""),
        # not the all-zero null digest of content_hashes_arrow
        h = content_hashes_arrow(b.column(text_col).fill_null(""))
        return pa.table({"content_hash": pa.array(h, pa.binary(20)),
                         "doc_id": b.column(id_col)})
    return docs.map_batches(f, batch_format="pyarrow")


def canonical_hash_store(signatures: "ray.data.Dataset",
                         assignments: "ray.data.Dataset" | None = None
                         ) -> "ray.data.Dataset":
    """(content_hash, canonical_id) — one row per distinct hash, the
    min doc id as canonical (what a completed run's store contains)."""
    from dedup_restore_ray.stages.groups import mark_canonical
    proj = signatures.select_columns(["content_hash", "doc_id"])
    marked = mark_canonical(proj, "content_hash")

    def canon(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sel = b.filter(pc.invert(b.column("is_dup").combine_chunks()))
        return pa.table({"content_hash": sel.column("content_hash"),
                         "canonical_id": sel.column("doc_id")})
    return marked.map_batches(canon, batch_format="pyarrow")


def write_hash_store(store: "ray.data.Dataset", path: str) -> None:
    store.write_parquet(path)


def read_hash_store(path: str) -> "ray.data.Dataset":
    from dedup_restore_ray.sources.io import read_parquet_clean
    return read_parquet_clean(path,
                              columns=["content_hash", "canonical_id"])


def append_exact_dedup(new_hashed: "ray.data.Dataset",
                       store: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, canonical_id, is_dup) for the NEW shard only.

    One sort shuffle over 29 B/row (20-byte hash + slot + id): store
    rows sort first within their hash group (slot -1), the group
    leader's id is everyone's canonical, and a new row is a dup unless
    it IS the leader."""
    from dedup_restore_ray.stages.groups import group_bounds, sorted_split

    def store_rows(b: pa.Table) -> pa.Table:
        return pa.table({"content_hash": b.column("content_hash"),
                         "slot": pa.array(
                             np.full(b.num_rows, -1, np.int8)),
                         "doc_id": b.column("canonical_id")})

    def new_rows(b: pa.Table) -> pa.Table:
        return pa.table({"content_hash": b.column("content_hash"),
                         "slot": pa.array(
                             np.zeros(b.num_rows, np.int8)),
                         "doc_id": b.column("doc_id")})

    rows = (store.map_batches(store_rows, batch_format="pyarrow")
            .union(new_hashed.map_batches(new_rows,
                                          batch_format="pyarrow")))
    sort_keys = ["content_hash", "slot", "doc_id"]
    interior, edge = sorted_split(rows, sort_keys, ["content_hash"])

    def kernel(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "canonical_id": pa.array([], pa.int64()),
                             "is_dup": pa.array([], pa.bool_())})
        starts, ends = group_bounds(b, ["content_hash"])
        sizes = ends - starts
        canon_idx = np.repeat(starts, sizes)
        canonical = b.column("doc_id").take(pa.array(canon_idx))
        is_dup = np.arange(n, dtype=np.int64) != canon_idx
        keep = np.asarray(b.column("slot")) >= 0
        kp = pa.array(keep)
        return pa.table({"doc_id": b.column("doc_id").filter(kp),
                         "canonical_id": canonical.filter(kp),
                         "is_dup": pa.array(is_dup[keep])})

    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby("content_hash").map_groups(
                lambda g: kernel(g.sort_by(
                    [(c, "ascending") for c in sort_keys])),
                batch_format="pyarrow")))


def near_dup_append(new_sigs: "ray.data.Dataset",
                    store_sigs: "ray.data.Dataset",
                    cfg=None) -> "ray.data.Dataset":
    """Near-dup pairs for an appended shard against an existing
    signature store: band candidates over store + shard (a doc's LSH
    bands don't depend on the corpus, so the union reproduces exactly
    the batch candidates), filtered to pairs touching the shard, then
    exact-Jaccard verified.  The shard's id set is the only broadcast
    (shard-sized, per the small-side doctrine); the store streams
    through the band sort like any other rows.  Returns (u, v,
    jaccard) with u < v, at least one side in the shard."""
    import ray
    from dedup_restore_ray.config import PipelineConfig
    from dedup_restore_ray.stages.pairs import candidate_pairs
    from dedup_restore_ray.stages.verify import verify_pairs
    cfg = cfg or PipelineConfig()
    id_pdf = new_sigs.select_columns(["doc_id"]).to_pandas()
    # an empty Dataset materializes with no columns at all
    new_ids = (np.sort(id_pdf["doc_id"].to_numpy(dtype=np.int64))
               if "doc_id" in id_pdf.columns
               else np.array([], dtype=np.int64))
    ref = ray.put(new_ids)
    sigs = store_sigs.union(new_sigs).materialize()
    cands = candidate_pairs(sigs, cfg, use_simhash=True,
                            use_fingerprints=True, use_norm=False)

    def touch_new(b: pa.Table) -> pa.Table:
        w = ray.get(ref)
        if len(w) == 0 or b.num_rows == 0:
            return b.slice(0, 0)
        def isin(col):
            x = np.asarray(b.column(col), dtype=np.int64)
            pos = np.searchsorted(w, x)
            pos[pos >= len(w)] = 0
            return w[pos] == x
        return b.filter(pa.array(isin("u") | isin("v")))

    return verify_pairs(cands.map_batches(touch_new,
                                          batch_format="pyarrow"),
                        sigs, cfg)
