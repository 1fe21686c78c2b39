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
from dedup_restore_ray.functions.hashing import hash_bytes_u64
from dedup_restore_ray.functions.jaccard import jaccard_sorted


def _id_hashes(ids: list) -> np.ndarray:
    """Stable uint64 hash per doc id (any type).  Collision risk
    n^2/2^64 — negligible below ~10^8 members; the join strategy is the
    exact path beyond that."""
    return np.fromiter((hash_bytes_u64(str(x).encode()) for x in ids),
                       dtype=np.uint64, count=len(ids))


def _member_shingle_pack(pairs: "ray.data.Dataset",
                         signatures: "ray.data.Dataset"):
    """(sorted member id-hashes, CSR offsets, flat shingles) for docs
    appearing in pairs.  Streams both datasets; only pair members are
    held."""
    members: set[int] = set()
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        members.update(_id_hashes(b.column("u").to_pylist()).tolist())
        members.update(_id_hashes(b.column("v").to_pylist()).tolist())
    member_ref = ray.put(members)

    def filt(batch: pa.Table) -> pa.Table:
        mset = ray.get(member_ref)
        ih = _id_hashes(batch.column("doc_id").to_pylist())
        mask = pa.array([int(h) in mset for h in ih])
        out = batch.select(["doc_id", "shingles"]).filter(mask)
        return out

    ids_parts, shingle_parts, count_parts = [], [], []
    for b in (signatures.map_batches(filt, batch_format="pyarrow")
              .iter_batches(batch_size=8192, batch_format="pyarrow")):
        ids_parts.append(_id_hashes(b.column("doc_id").to_pylist()))
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
    """Stateless-task batch fn over the packed broadcast ref."""

    def __init__(self, pack_ref, threshold: float):
        self.ref = pack_ref
        self.threshold = threshold
        self._pack = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._pack is None:
            self._pack = ray.get(self.ref)   # three arrays, zero-copy
        ids, offsets, flat = self._pack
        n = batch.num_rows
        uh = _id_hashes(batch.column("u").to_pylist())
        vh = _id_hashes(batch.column("v").to_pylist())
        iu = np.searchsorted(ids, uh)
        iv = np.searchsorted(ids, vh)
        m = len(ids)
        jac = np.zeros(n, dtype=np.float64)
        empty = np.empty(0, dtype=np.uint64)
        for i in range(n):
            a = (flat[offsets[iu[i]]:offsets[iu[i] + 1]]
                 if iu[i] < m and ids[iu[i]] == uh[i] else empty)
            b = (flat[offsets[iv[i]]:offsets[iv[i] + 1]]
                 if iv[i] < m and ids[iv[i]] == vh[i] else empty)
            jac[i] = jaccard_sorted(a, b)
        out = batch.append_column("jaccard", pa.array(jac))
        return out.filter(pa.array(jac >= self.threshold))


def verify_pairs(pairs: "ray.data.Dataset", signatures: "ray.data.Dataset",
                 cfg: PipelineConfig | None = None,
                 strategy: str = "broadcast") -> "ray.data.Dataset":
    """candidate (u,v) -> verified (u, v, jaccard >= threshold)."""
    cfg = cfg or PipelineConfig()
    if strategy == "broadcast":
        pack = _member_shingle_pack(pairs, signatures)
        ref = ray.put(pack)
        return pairs.map_batches(
            _VerifyPacked(ref, cfg.jaccard_threshold),
            batch_format="pyarrow")
    if strategy == "join":
        sigs = signatures.select_columns(["doc_id", "shingles"])
        left = pairs.join(
            sigs.rename_columns({"doc_id": "u", "shingles": "shingles_u"}),
            join_type="inner", num_partitions=8, on=("u",))
        both = left.join(
            sigs.rename_columns({"doc_id": "v", "shingles": "shingles_v"}),
            join_type="inner", num_partitions=8, on=("v",))

        def verify(batch: pd.DataFrame) -> pd.DataFrame:
            jac = np.empty(len(batch), dtype=np.float64)
            su = batch["shingles_u"].to_numpy()
            sv = batch["shingles_v"].to_numpy()
            for i in range(len(batch)):
                jac[i] = jaccard_sorted(np.asarray(su[i], dtype=np.uint64),
                                        np.asarray(sv[i], dtype=np.uint64))
            out = batch[["u", "v"]].copy()
            out["jaccard"] = jac
            return out[out["jaccard"] >= cfg.jaccard_threshold]

        return both.map_batches(verify, batch_format="pandas")
    raise ValueError(f"unknown strategy {strategy!r}")
