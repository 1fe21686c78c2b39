"""Exact-Jaccard verification of candidate pairs.

The authoritative check after LSH (north_rule); analogous to the
reference's exact fingerprint comparison after the bloom-filter
prefilter (reference: src/dedup.c:120-146 — bloom hit is only a hint,
the disk-hash lookup decides).

Two data-movement strategies (SURVEY §4 'broadcast small sides'):

- ``broadcast``: the shingle sets of *pair members only* (docs that
  collided in some bucket) are packed into three numpy arrays
  (sorted id-hashes, CSR offsets, flat shingle hashes) and ``ray.put``
  once.  Packed arrays deserialize zero-copy from the object store —
  a plain dict of numpy arrays costs a full unpickle of every entry in
  EVERY task and destroys scaling.  Lookup is a vectorized
  searchsorted per batch.
- ``join``: two hash-partitioned ``Dataset.join``s attach each side's
  shingles to the pair rows; fully distributed, no driver state —
  the path when the member set outgrows one machine's memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.hashing import hash_bytes_u64, mix64
from dedup_restore_ray.functions.jaccard import (jaccard_batch,
                                                 jaccard_batch2,
                                                 jaccard_counts_batch2,
                                                 jaccard_sorted)


def _id_hashes(ids) -> np.ndarray:
    """Stable uint64 hash per doc id.  Accepts a pyarrow
    (Chunked)Array, numpy array, or Python list; every input form
    routes through ONE definition per type, so hashes computed from a
    list always agree with hashes computed from the Arrow column.

    Integer ids: vectorized splitmix64 — a *bijection* on uint64, so
    zero collisions.  String/binary ids: arrow_row_hashes (one
    length-mixed rolling hash over the flat Arrow byte buffer — no
    per-row Python; collision risk n^2/2^64, negligible below ~10^8
    members; the join strategy is the exact path beyond that).  The
    per-value blake2b loop survives only for exotic id types."""
    from dedup_restore_ray.functions.hashing import arrow_row_hashes

    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if not isinstance(ids, pa.Array):
        arr = np.asarray(ids)
        if arr.dtype.kind in "iu":
            return mix64(arr.astype(np.uint64))
        ids = pa.array(ids)
    if pa.types.is_integer(ids.type):
        return mix64(np.asarray(ids).astype(np.uint64))
    if (pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type)
            or pa.types.is_binary(ids.type)
            or pa.types.is_large_binary(ids.type)):
        return arrow_row_hashes(ids)
    vals = ids.to_pylist()
    return np.fromiter((hash_bytes_u64(str(x).encode()) for x in vals),
                       dtype=np.uint64, count=len(vals))


def _member_shingle_pack(pairs: "ray.data.Dataset",
                         signatures: "ray.data.Dataset"):
    """(sorted member id-hashes, CSR offsets, flat shingles) for docs
    appearing in pairs.  Streams both datasets; only pair members are
    held."""
    mh: list[np.ndarray] = []
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        mh.append(_id_hashes(b.column("u")))
        mh.append(_id_hashes(b.column("v")))
    members = (np.unique(np.concatenate(mh)) if mh
               else np.empty(0, np.uint64))
    # packed sorted uint64 array: zero-copy from the object store +
    # vectorized searchsorted (a Python set would fully unpickle in
    # every task and test membership per row)
    member_ref = ray.put(members)

    def filt(batch: pa.Table) -> pa.Table:
        mem = ray.get(member_ref)
        ih = _id_hashes(batch.column("doc_id"))
        pos = np.searchsorted(mem, ih)
        pos[pos == len(mem)] = max(len(mem) - 1, 0)
        mask = (mem[pos] == ih) if len(mem) else np.zeros(len(ih), bool)
        out = batch.select(["doc_id", "shingles"]).filter(pa.array(mask))
        return out

    ids_parts, shingle_parts, count_parts = [], [], []
    for b in (signatures.map_batches(filt, batch_format="pyarrow")
              .iter_batches(batch_size=8192, batch_format="pyarrow")):
        ids_parts.append(_id_hashes(b.column("doc_id")))
        sh = b.column("shingles").combine_chunks()
        shingle_parts.append(np.asarray(sh.flatten(), dtype=np.uint64))
        count_parts.append(np.diff(np.asarray(sh.offsets)))
    if not ids_parts:
        return (np.empty(0, np.uint64), np.zeros(1, np.int64),
                np.empty(0, np.uint64))
    ids = np.concatenate(ids_parts)
    counts = np.concatenate(count_parts).astype(np.int64)
    flat = np.concatenate(shingle_parts)
    # sort members by id-hash; reorder CSR with a vectorized element
    # permutation (no per-member python loop)
    order = np.argsort(ids, kind="stable")
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    new_counts = counts[order]
    offsets = np.concatenate(([0], np.cumsum(new_counts)))
    total = int(offsets[-1])
    elem_idx = (np.repeat(starts[order] - offsets[:-1], new_counts)
                + np.arange(total, dtype=np.int64))
    new_flat = flat[elem_idx]
    return ids[order], offsets, new_flat


class _VerifyPacked:
    """Stateless-task batch fn over the packed broadcast ref.

    ``emit_all=True`` keeps REJECTED candidates too (jaccard below
    threshold): the flagship fuses its candidate_pairs counter into
    this pass — the materialized all-rows output's metadata count IS
    the candidate count, and the verified subset is one cheap filter
    over it, replacing a whole extra execution barrier."""

    def __init__(self, pack_ref, threshold: float, emit_all: bool = False,
                 hashed_ids: bool = False, emit_counts: bool = False):
        self.ref = pack_ref
        self.threshold = threshold
        self.emit_all = emit_all
        # hashed_ids: u/v already carry the uint64 id hash (the hashed
        # pair chain) — skip re-hashing
        self.hashed_ids = hashed_ids
        # emit_counts: also emit the integer legs (n_inter, n_union)
        # so downstream thresholds can compare 100*i >= t*u exactly
        # (threshold-sweep / containment reports); the ratio path
        # stays the allocation-free kernel when off
        self.emit_counts = emit_counts
        self._pack = None

    @staticmethod
    def _lookup(pack, h: np.ndarray):
        """(starts, lens) of each probe hash in one pack; misses -> 0."""
        ids, offsets, _ = pack
        m = len(ids)
        if m == 0:
            z = np.zeros(len(h), np.int64)
            return z, z.copy()
        i = np.minimum(np.searchsorted(ids, h), m - 1)
        offs = np.asarray(offsets, dtype=np.int64)
        found = ids[i] == h
        return (np.where(found, offs[i], 0),
                np.where(found, offs[i + 1] - offs[i], 0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sharded = isinstance(self.ref, ShardedPack)
        if self._pack is None:
            # zero-copy from the object store in both forms; sharded
            # arrays are plasma-backed and shared across co-located
            # workers (no per-worker copy)
            self._pack = (tuple(ray.get(r) for r in self.ref.shard_refs)
                          if sharded else ray.get(self.ref))
        n = batch.num_rows
        if self.hashed_ids:
            uh = np.asarray(batch.column("u").combine_chunks())
            vh = np.asarray(batch.column("v").combine_chunks())
        else:
            uh = _id_hashes(batch.column("u"))
            vh = _id_hashes(batch.column("v"))
        n_inter = n_union = None
        if not sharded:
            ids, offsets, flat = self._pack
            if len(ids) == 0:
                jac = np.zeros(n, dtype=np.float64)
                if self.emit_counts:
                    n_inter = np.zeros(n, np.int64)
                    n_union = np.zeros(n, np.int64)
            else:
                a_starts, a_lens = self._lookup(self._pack, uh)
                b_starts, b_lens = self._lookup(self._pack, vh)
                # one batched CSR merge-intersect for the whole batch —
                # no per-pair Python (docs missing from the pack
                # compare as ∅)
                if self.emit_counts:
                    n_inter, n_union = jaccard_counts_batch2(
                        flat, a_starts, a_lens, flat, b_starts, b_lens)
                    jac = np.where(n_union == 0, 1.0,
                                   n_inter / np.maximum(n_union, 1))
                else:
                    jac = jaccard_batch(flat, a_starts, a_lens,
                                        b_starts, b_lens)
        else:
            packs = self._pack
            K = len(packs)
            if self.ref.shift >= 64:      # single shard: all keys 0
                ku = np.zeros(n, np.int64)
                kv = np.zeros(n, np.int64)
            else:
                shift = np.uint64(self.ref.shift)
                ku = (uh >> shift).astype(np.int64)
                kv = (vh >> shift).astype(np.int64)
            a_starts = np.zeros(n, np.int64)
            a_lens = np.zeros(n, np.int64)
            b_starts = np.zeros(n, np.int64)
            b_lens = np.zeros(n, np.int64)
            for s in range(K):
                mu = ku == s
                if mu.any():
                    st, ln = self._lookup(packs[s], uh[mu])
                    a_starts[mu] = st
                    a_lens[mu] = ln
                mv = kv == s
                if mv.any():
                    st, ln = self._lookup(packs[s], vh[mv])
                    b_starts[mv] = st
                    b_lens[mv] = ln
            jac = np.zeros(n, dtype=np.float64)
            if self.emit_counts:
                n_inter = np.zeros(n, np.int64)
                n_union = np.zeros(n, np.int64)
            combos = ku * K + kv
            for c in np.unique(combos):
                m = combos == c
                if self.emit_counts:
                    ii, uu = jaccard_counts_batch2(
                        packs[int(c) // K][2], a_starts[m], a_lens[m],
                        packs[int(c) % K][2], b_starts[m], b_lens[m])
                    n_inter[m] = ii
                    n_union[m] = uu
                    jac[m] = np.where(uu == 0, 1.0,
                                      ii / np.maximum(uu, 1))
                else:
                    jac[m] = jaccard_batch2(
                        packs[int(c) // K][2], a_starts[m], a_lens[m],
                        packs[int(c) % K][2], b_starts[m], b_lens[m])
        out = batch.append_column("jaccard", pa.array(jac))
        if self.emit_counts:
            out = out.append_column("n_inter", pa.array(n_inter))
            out = out.append_column("n_union", pa.array(n_union))
        if self.emit_all:
            return out
        return out.filter(pa.array(jac >= self.threshold))


def verify_pairs_scatter(pairs: "ray.data.Dataset",
                         signatures: "ray.data.Dataset",
                         cfg: PipelineConfig,
                         hashed_ids: bool = False) -> "ray.data.Dataset":
    """Fully distributed verification — no driver-side shingle gather.

    ``hashed_ids=True``: pairs carry uint64 id hashes (the hashed pair
    chain) — the doc_id payload through both scatters is then the hash
    itself, the output (u, v) stays hashed, and the caller resolves
    raw ids over the (small) verified subset (pairs.resolve_pair_ids).

    Two sort-scatter phases on the stages/groups.py machinery:
      1. sort (doc_hash, slot): each doc group leads with its signature
         row (slot -1) followed by its pair-reference rows; a vectorized
         take replicates the doc's shingle list onto each reference.
      2. sort (pair_id, slot): each pair group now holds both members'
         shingles side by side; exact Jaccard per group.
    The only driver state is the sorted member-hash array (8 B per pair
    member — vs. the full shingle sets for the broadcast strategy).
    Data moved ~ shingles x (1 + pair participations) — all through
    the object store, scaling with workers.
    """
    from dedup_restore_ray.stages.groups import (group_bounds, sorted_split)

    def pair_hashes(b: pa.Table, col: str) -> np.ndarray:
        if hashed_ids:
            return np.asarray(b.column(col).combine_chunks())
        return _id_hashes(b.column(col))

    # member hash set (tiny: u64 per member)
    mh: list[np.ndarray] = []
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        mh.append(pair_hashes(b, "u"))
        mh.append(pair_hashes(b, "v"))
    members = (np.unique(np.concatenate(mh)) if mh
               else np.empty(0, np.uint64))
    member_ref = ray.put(members)

    shingle_type = pa.list_(pa.uint64())

    def sig_rows(batch: pa.Table) -> pa.Table:
        mem = ray.get(member_ref)
        ih = _id_hashes(batch.column("doc_id"))
        pos = np.searchsorted(mem, ih)
        pos[pos == len(mem)] = max(len(mem) - 1, 0)
        mask = (mem[pos] == ih) if len(mem) else np.zeros(len(ih), bool)
        sel = batch.filter(pa.array(mask))
        n = sel.num_rows
        doc_payload = (pa.array(ih[mask], pa.uint64()) if hashed_ids
                       else sel.column("doc_id").combine_chunks())
        return pa.table({
            "doc_hash": pa.array(ih[mask], pa.uint64()),
            "slot": pa.array(np.full(n, -1, np.int8)),
            "pair_id": pa.array(np.zeros(n, np.uint64)),
            "doc_id": doc_payload,
            "shingles": sel.column("shingles").cast(shingle_type),
        })

    def pair_rows(batch: pa.Table) -> pa.Table:
        uh = pair_hashes(batch, "u")
        vh = pair_hashes(batch, "v")
        from dedup_restore_ray.functions.hashing import combine64
        pid = combine64(uh, vh)
        n = batch.num_rows
        doc_hash = np.concatenate([uh, vh])
        slot = np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
        pair_id = np.concatenate([pid, pid])
        doc_id = (pa.array(doc_hash, pa.uint64()) if hashed_ids
                  else pa.concat_arrays([
                      batch.column("u").combine_chunks(),
                      batch.column("v").combine_chunks()]))
        empty_shingles = pa.ListArray.from_arrays(
            pa.array(np.zeros(2 * n + 1, np.int32)),
            pa.array([], pa.uint64()))
        return pa.table({
            "doc_hash": pa.array(doc_hash, pa.uint64()),
            "slot": pa.array(slot),
            "pair_id": pa.array(pair_id, pa.uint64()),
            "doc_id": doc_id,
            "shingles": empty_shingles,
        })

    rows = (signatures.map_batches(sig_rows, batch_format="pyarrow")
            .union(pairs.map_batches(pair_rows, batch_format="pyarrow")))

    def scatter_block(b: pa.Table) -> pa.Table:
        """sorted by (doc_hash, slot): replicate each doc's shingle list
        (slot -1 leads the group) onto its reference rows."""
        n = b.num_rows
        out_schema = pa.schema([
            ("pair_id", pa.uint64()), ("slot", pa.int8()),
            ("doc_id", b.schema.field("doc_id").type),
            ("shingles", shingle_type)])
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, ["doc_hash"])
        sizes = ends - starts
        slot = np.asarray(b.column("slot"))
        # group's first row must be its signature row; groups without
        # one (doc absent from signatures) produce nothing
        has_sig = slot[starts] == -1
        sig_idx = np.repeat(starts, sizes)
        ref_mask = (slot >= 0) & np.repeat(has_sig, sizes)
        if not ref_mask.any():
            return out_schema.empty_table()
        ref_rows = np.flatnonzero(ref_mask)
        sig_of_ref = sig_idx[ref_rows]
        sh = b.column("shingles").combine_chunks()
        return pa.table({
            "pair_id": b.column("pair_id").take(pa.array(ref_rows)),
            "slot": b.column("slot").take(pa.array(ref_rows)),
            "doc_id": b.column("doc_id").take(pa.array(ref_rows)),
            "shingles": sh.take(pa.array(sig_of_ref)),
        })

    interior, edge = sorted_split(rows, ["doc_hash", "slot"], ["doc_hash"])
    scat = (interior.map_batches(scatter_block, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby("doc_hash").map_groups(
                lambda g: scatter_block(
                    g.sort_by([("doc_hash", "ascending"),
                               ("slot", "ascending")])),
                batch_format="pyarrow")))

    threshold = cfg.jaccard_threshold

    def check_block(b: pa.Table) -> pa.Table:
        """sorted by (pair_id, slot): groups of 2 rows -> jaccard."""
        id_t = b.schema.field("doc_id").type
        out_schema = pa.schema([("u", id_t), ("v", id_t),
                                ("jaccard", pa.float64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, ["pair_id"])
        sizes = ends - starts
        ok = sizes == 2
        g0 = starts[ok]
        if len(g0) == 0:
            return out_schema.empty_table()
        sh = b.column("shingles").combine_chunks()
        offs = np.asarray(sh.offsets, dtype=np.int64)
        flat = np.asarray(sh.flatten(), dtype=np.uint64)
        # batched CSR merge-intersect over every pair group at once
        jac = jaccard_batch(flat,
                            offs[g0], offs[g0 + 1] - offs[g0],
                            offs[g0 + 1], offs[g0 + 2] - offs[g0 + 1])
        keep = jac >= threshold
        ku = pa.array(g0[keep])
        kv = pa.array(g0[keep] + 1)
        return pa.table({"u": b.column("doc_id").take(ku),
                         "v": b.column("doc_id").take(kv),
                         "jaccard": pa.array(jac[keep])})

    interior2, edge2 = sorted_split(scat, ["pair_id", "slot"], ["pair_id"])
    return (interior2.map_batches(check_block, batch_format="pyarrow",
                                  batch_size=None)
            .union(edge2.groupby("pair_id").map_groups(
                lambda g: check_block(
                    g.sort_by([("pair_id", "ascending"),
                               ("slot", "ascending")])),
                batch_format="pyarrow")))


def build_shingle_pack(signatures: "ray.data.Dataset",
                       return_ids: bool = False):
    """Pack EVERY doc of ``signatures`` (sorted id-hashes, CSR offsets,
    flat shingles) — no member restriction, so it can be built
    concurrently with candidate generation (pipelines/dedup.py runs it
    in a driver thread while the pair sort executes).

    ``return_ids=True`` appends a 4th element: the raw doc_id Arrow
    array in the SAME hash-sorted order — the id-resolution table for
    the hashed pair chain (pairs.resolve_pair_ids), gathered in this
    same single driver pass instead of a second one."""
    ids_parts, shingle_parts, count_parts = [], [], []
    raw_parts = [] if return_ids else None
    for b in signatures.iter_batches(batch_size=8192,
                                     batch_format="pyarrow"):
        ids_parts.append(_id_hashes(b.column("doc_id")))
        sh = b.column("shingles").combine_chunks()
        shingle_parts.append(np.asarray(sh.flatten(), dtype=np.uint64))
        count_parts.append(np.diff(np.asarray(sh.offsets)))
        if return_ids:
            raw_parts.append(b.column("doc_id").combine_chunks())
    if not ids_parts:
        base = (np.empty(0, np.uint64), np.zeros(1, np.int64),
                np.empty(0, np.uint64))
        return base + (pa.array([], pa.string()),) if return_ids else base
    ids = np.concatenate(ids_parts)
    counts = np.concatenate(count_parts).astype(np.int64)
    flat = np.concatenate(shingle_parts)
    order = np.argsort(ids, kind="stable")
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    new_counts = counts[order]
    offsets = np.concatenate(([0], np.cumsum(new_counts)))
    total = int(offsets[-1])
    elem_idx = (np.repeat(starts[order] - offsets[:-1], new_counts)
                + np.arange(total, dtype=np.int64))
    if return_ids:
        raw = pa.concat_arrays(raw_parts).take(pa.array(order))
        return ids[order], offsets, flat[elem_idx], raw
    return ids[order], offsets, flat[elem_idx]


class ShardedPack:
    """Handle for a hash-range-sharded shingle pack living in the
    object store: ``shard_refs[s]`` resolves to the (sorted id-hashes,
    CSR offsets, flat shingles) tuple for hash range
    ``[s << shift, (s+1) << shift)``.  Shard s of a probe hash h is
    ``h >> shift`` — no boundary table needed.  Built fully by Ray
    tasks (build_shingle_pack_sharded); the driver never touches the
    shingle bytes."""

    def __init__(self, shard_refs: list, shift: int):
        self.shard_refs = shard_refs
        self.shift = shift


def _empty_pack_parts(n_shards: int, return_ids: bool):
    part = [np.empty(0, np.uint64), np.empty(0, np.int64),
            np.empty(0, np.uint64)]
    if return_ids:
        part.append(pa.array([], pa.string()))
    parts = [tuple(part) for _ in range(n_shards)]
    return parts[0] if n_shards == 1 else parts


@ray.remote
def _pack_part_task(n_shards: int, shift: int, member, return_ids: bool,
                    *blocks):
    """Phase 1 of the distributed pack build: extract (id-hash, shingle
    CSR[, raw id]) rows from signature blocks, keep only ``member``
    docs (sorted uint64 id-hash array, or None for all), sort by
    id-hash and split at shard boundaries.  Returns n_shards objects,
    each a sorted run for its hash range."""
    ids_parts, count_parts, flat_parts, raw_parts = [], [], [], []
    for b in blocks:
        if isinstance(b, bytes):        # never expected; defensive
            raise TypeError("block ref resolved to bytes")
        ids = _id_hashes(b.column("doc_id"))
        sh = b.column("shingles").combine_chunks()
        if member is not None and len(ids):
            if len(member):
                pos = np.searchsorted(member, ids)
                pos[pos == len(member)] = len(member) - 1
                mask = member[pos] == ids
            else:
                mask = np.zeros(len(ids), bool)
            if not mask.all():
                keep = pa.array(mask)
                sh = sh.filter(keep)
                if return_ids:
                    raw_parts.append(
                        b.column("doc_id").combine_chunks().filter(keep))
                ids = ids[mask]
            elif return_ids:
                raw_parts.append(b.column("doc_id").combine_chunks())
        elif return_ids:
            raw_parts.append(b.column("doc_id").combine_chunks())
        ids_parts.append(ids)
        flat_parts.append(np.asarray(sh.flatten(), dtype=np.uint64))
        count_parts.append(np.diff(np.asarray(sh.offsets)).astype(np.int64))
    if not ids_parts or not sum(len(p) for p in ids_parts):
        return _empty_pack_parts(n_shards, return_ids)
    ids = np.concatenate(ids_parts)
    counts = np.concatenate(count_parts)
    flat = np.concatenate(flat_parts)
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    counts_s = counts[order]
    starts = np.concatenate((np.zeros(1, np.int64), np.cumsum(counts)[:-1]))
    offsets = np.concatenate((np.zeros(1, np.int64), np.cumsum(counts_s)))
    total = int(offsets[-1])
    elem_idx = (np.repeat(starts[order] - offsets[:-1], counts_s)
                + np.arange(total, dtype=np.int64))
    flat_s = flat[elem_idx]
    raw_s = None
    if return_ids:
        raw = (pa.concat_arrays(raw_parts) if len(raw_parts) > 1
               else raw_parts[0])
        raw_s = raw.take(pa.array(order))
    # split the sorted run at shard boundaries (shard = hash >> shift)
    edges = (np.arange(1, n_shards, dtype=np.uint64) << np.uint64(shift))
    bounds = np.searchsorted(ids_s, edges)
    id_runs = np.split(ids_s, bounds)
    cnt_runs = np.split(counts_s, bounds)
    flat_bounds = offsets[bounds]
    flat_runs = np.split(flat_s, flat_bounds)
    out = []
    lo = np.concatenate((np.zeros(1, np.int64), bounds))
    hi = np.concatenate((bounds, np.array([len(ids_s)], np.int64)))
    for s in range(n_shards):
        part = [id_runs[s], cnt_runs[s], flat_runs[s]]
        if return_ids:
            part.append(raw_s.slice(int(lo[s]), int(hi[s] - lo[s])))
        out.append(tuple(part))
    return out[0] if n_shards == 1 else out


@ray.remote
def _pack_shard_task(return_ids: bool, *parts):
    """Phase 2: merge one shard's sorted runs from every phase-1 task
    into the final (ids_sorted, CSR offsets, flat[, raw ids]) pack.
    Returns (pack_tuple, idtab_tuple)."""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        pack = (np.empty(0, np.uint64), np.zeros(1, np.int64),
                np.empty(0, np.uint64))
        return pack, (np.empty(0, np.uint64), pa.array([], pa.string()))
    ids = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    flat = np.concatenate([p[2] for p in parts])
    order = np.argsort(ids, kind="stable")   # merge of sorted runs
    ids_s = ids[order]
    counts_s = counts[order]
    starts = np.concatenate((np.zeros(1, np.int64), np.cumsum(counts)[:-1]))
    offsets = np.concatenate((np.zeros(1, np.int64), np.cumsum(counts_s)))
    total = int(offsets[-1])
    elem_idx = (np.repeat(starts[order] - offsets[:-1], counts_s)
                + np.arange(total, dtype=np.int64))
    pack = (ids_s, offsets, flat[elem_idx])
    if not return_ids:
        return pack, (np.empty(0, np.uint64), pa.array([], pa.string()))
    raw = [p[3] for p in parts]
    raw = pa.concat_arrays(raw) if len(raw) > 1 else raw[0]
    return pack, (ids_s, raw.take(pa.array(order)))


@ray.remote
def _merge_id_tables(*tabs):
    """Concatenate per-shard (sorted id-hash, raw id) tables — shards
    are ascending hash ranges, so plain concatenation is globally
    sorted (the resolve_pair_ids broadcast-table format)."""
    tabs = [t for t in tabs if len(t[0])]
    if not tabs:
        return np.empty(0, np.uint64), pa.array([], pa.string())
    if len(tabs) == 1:
        return tabs[0]
    idh = np.concatenate([t[0] for t in tabs])
    raw = pa.concat_arrays([
        t[1].combine_chunks() if isinstance(t[1], pa.ChunkedArray) else t[1]
        for t in tabs])
    return idh, raw


def build_shingle_pack_sharded(signatures: "ray.data.Dataset",
                               member_ref=None,
                               n_shards: int = 8,
                               return_ids: bool = False,
                               blocks_per_task: int | None = None):
    """Distributed replacement for the driver-serial
    ``build_shingle_pack``: every phase (string-id hashing, member
    filtering, CSR extraction, sorting, merging) runs as Ray tasks
    over the MATERIALIZED ``signatures`` dataset's block refs; the
    driver holds only ObjectRefs.  The build overlaps the candidate
    sort naturally — _VerifyPacked blocks in ray.get until shards
    land.  (Round-2 scaling analysis: the driver-thread pack build
    was an ~11 s serial tail at 1M docs / 4 CPUs — the binding
    Amdahl floor of the candidate+verify stage.)

    member_ref: optional ray.ObjectRef to a SORTED uint64 id-hash
    array; only matching docs enter the pack (the flagship passes its
    canonical-hash set, replacing the only_canonical re-execution).

    Returns (ShardedPack, idtab_ref) — idtab_ref resolves to the
    (sorted id-hashes, raw ids) broadcast table when return_ids, else
    None."""
    n_shards = max(1, n_shards)
    if n_shards & (n_shards - 1):
        raise ValueError("n_shards must be a power of two")
    shift = 64 - (n_shards.bit_length() - 1)
    block_refs = []
    for bundle in signatures.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    if not block_refs:
        parts = _empty_pack_parts(1, return_ids)
        empty = (parts[0], parts[1], parts[2])
        pack = ShardedPack([ray.put(empty)] * n_shards, shift)
        idtab = (ray.put((np.empty(0, np.uint64),
                          pa.array([], pa.string())))
                 if return_ids else None)
        return pack, idtab
    if blocks_per_task is None:
        # aim for ~2 phase-1 tasks per CPU so the extract/sort work
        # spreads across the pool even on narrow hosts
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        blocks_per_task = max(1, len(block_refs) // (2 * cpus))
    part_futs = []
    for g in range(0, len(block_refs), blocks_per_task):
        group = block_refs[g:g + blocks_per_task]
        fut = _pack_part_task.options(num_returns=n_shards).remote(
            n_shards, shift, member_ref, return_ids, *group)
        part_futs.append([fut] if n_shards == 1 else fut)
    shard_refs, idtab_refs = [], []
    for s in range(n_shards):
        pr, ir = _pack_shard_task.options(num_returns=2).remote(
            return_ids, *[fs[s] for fs in part_futs])
        shard_refs.append(pr)
        idtab_refs.append(ir)
    idtab = _merge_id_tables.remote(*idtab_refs) if return_ids else None
    return ShardedPack(shard_refs, shift), idtab


def verify_pairs_with_pack(pairs: "ray.data.Dataset", pack_ref,
                           cfg: PipelineConfig) -> "ray.data.Dataset":
    """Verification against a prebuilt (possibly concurrently built)
    shingle pack ref."""
    return pairs.map_batches(
        _VerifyPacked(pack_ref, cfg.jaccard_threshold),
        batch_format="pyarrow")


def verify_pairs(pairs: "ray.data.Dataset", signatures: "ray.data.Dataset",
                 cfg: PipelineConfig | None = None,
                 strategy: str = "broadcast",
                 hashed_ids: bool = False,
                 emit_counts: bool = False) -> "ray.data.Dataset":
    """candidate (u,v) -> verified (u, v, jaccard >= threshold);
    ``emit_counts=True`` (broadcast strategy) adds the integer legs
    (n_inter, n_union) for exact downstream threshold arithmetic."""
    cfg = cfg or PipelineConfig()
    if hashed_ids and strategy != "scatter":
        raise ValueError("hashed_ids pairs are supported by the scatter "
                         "strategy (use _VerifyPacked(hashed_ids=True) "
                         "for the broadcast form)")
    if emit_counts and strategy != "broadcast":
        raise ValueError("emit_counts rides the packed broadcast "
                         "verify (_VerifyPacked)")
    if strategy == "scatter":
        return verify_pairs_scatter(pairs, signatures, cfg,
                                    hashed_ids=hashed_ids)
    if strategy == "broadcast":
        pack = _member_shingle_pack(pairs, signatures)
        ref = ray.put(pack)
        return pairs.map_batches(
            _VerifyPacked(ref, cfg.jaccard_threshold,
                          emit_counts=emit_counts),
            batch_format="pyarrow")
    if strategy == "join":
        # Acero hash join rejects list-typed payload columns — carry the
        # sorted shingle sets as little-endian uint64 blobs instead.
        def to_blob(batch: pa.Table) -> pa.Table:
            sh = batch.column("shingles").combine_chunks()
            offs = np.asarray(sh.offsets)
            flat = np.asarray(sh.flatten(), dtype=np.uint64)
            blobs = [flat[offs[i]:offs[i + 1]].tobytes()
                     for i in range(batch.num_rows)]
            return pa.table({"doc_id": batch.column("doc_id"),
                             "shingle_blob": pa.array(blobs, pa.binary())})

        sigs = signatures.select_columns(["doc_id", "shingles"]).map_batches(
            to_blob, batch_format="pyarrow")
        left = pairs.join(
            sigs.rename_columns({"doc_id": "u", "shingle_blob": "blob_u"}),
            join_type="inner", num_partitions=8, on=("u",))
        both = left.join(
            sigs.rename_columns({"doc_id": "v", "shingle_blob": "blob_v"}),
            join_type="inner", num_partitions=8, on=("v",))

        def verify(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            jac = np.empty(n, dtype=np.float64)
            bu = batch.column("blob_u").to_pylist()
            bv = batch.column("blob_v").to_pylist()
            for i in range(n):
                jac[i] = jaccard_sorted(
                    np.frombuffer(bu[i] or b"", dtype=np.uint64),
                    np.frombuffer(bv[i] or b"", dtype=np.uint64))
            out = pa.table({"u": batch.column("u"),
                            "v": batch.column("v"),
                            "jaccard": pa.array(jac)})
            return out.filter(pa.array(jac >= cfg.jaccard_threshold))

        return both.map_batches(verify, batch_format="pyarrow")
    raise ValueError(f"unknown strategy {strategy!r}")
