"""Exact-Jaccard verification of candidate pairs.

The authoritative check after LSH (north_rule); analogous to the
reference's exact fingerprint comparison after the bloom-filter
prefilter (reference: src/dedup.c:120-146 — bloom hit is only a hint,
the disk-hash lookup decides).

Two data-movement strategies (SURVEY §4 'broadcast small sides'):

- ``broadcast``: the shingle sets of *pair members only* (a small
  fraction of the corpus — only docs that collided in some bucket) are
  gathered into an object-store ref with ``ray.put`` once; verification
  is a stateless ``map_batches`` over the pairs dataset reading the ref.
  Right whenever the member set fits comfortably in memory.
- ``join``: two hash-partitioned ``Dataset.join``s attach each side's
  shingles to the pair rows; fully distributed, no driver state —
  the 100 TB path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.jaccard import jaccard_sorted


def _member_shingle_map(pairs: "ray.data.Dataset",
                        signatures: "ray.data.Dataset") -> dict:
    """{doc_id: sorted uint64 shingle array} for docs appearing in pairs.
    Streams both datasets; only pair members are held."""
    members: set = set()
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        members.update(b.column("u").to_pylist())
        members.update(b.column("v").to_pylist())
    member_ref = ray.put(members)

    def filt(batch: pa.Table) -> pa.Table:
        mset = ray.get(member_ref)
        mask = pa.array([d in mset for d in batch.column("doc_id").to_pylist()])
        return batch.filter(mask).select(["doc_id", "shingles"])

    shingle_map: dict = {}
    for b in (signatures.map_batches(filt, batch_format="pyarrow")
              .iter_batches(batch_size=8192, batch_format="pyarrow")):
        ids = b.column("doc_id").to_pylist()
        sh = b.column("shingles").to_pylist()
        for d, s in zip(ids, sh):
            shingle_map[d] = np.asarray(s, dtype=np.uint64)
    return shingle_map


class _VerifyWithRef:
    """Stateless-task batch fn holding the broadcast ref; the dict is
    fetched zero-copy-ish from the object store once per task."""

    def __init__(self, shingle_ref, threshold: float):
        self.ref = shingle_ref
        self.threshold = threshold
        self._map = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._map is None:
            self._map = ray.get(self.ref)
        m = self._map
        empty = np.empty(0, dtype=np.uint64)
        n = batch.num_rows
        jac = np.empty(n, dtype=np.float64)
        us = batch.column("u").to_pylist()
        vs = batch.column("v").to_pylist()
        for i in range(n):
            jac[i] = jaccard_sorted(m.get(us[i], empty), m.get(vs[i], empty))
        out = batch.append_column("jaccard", pa.array(jac))
        return out.filter(pa.array(jac >= self.threshold))


def verify_pairs(pairs: "ray.data.Dataset", signatures: "ray.data.Dataset",
                 cfg: PipelineConfig | None = None,
                 strategy: str = "broadcast") -> "ray.data.Dataset":
    """candidate (u,v) -> verified (u, v, jaccard >= threshold)."""
    cfg = cfg or PipelineConfig()
    if strategy == "broadcast":
        shingle_map = _member_shingle_map(pairs, signatures)
        ref = ray.put(shingle_map)
        return pairs.map_batches(
            _VerifyWithRef(ref, cfg.jaccard_threshold),
            batch_format="pyarrow")
    if strategy == "join":
        sigs = signatures.select_columns(["doc_id", "shingles"])
        left = pairs.join(
            sigs.rename_columns({"doc_id": "u", "shingles": "shingles_u"}),
            join_type="inner", num_partitions=max(2, pairs.num_blocks()),
            on=("u",))
        both = left.join(
            sigs.rename_columns({"doc_id": "v", "shingles": "shingles_v"}),
            join_type="inner", num_partitions=max(2, pairs.num_blocks()),
            on=("v",))

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
