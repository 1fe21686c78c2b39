"""Candidate-pair generation: band expansion + bucket groupby with
explicit skew handling.

The LSH bucket shuffle replaces the reference's central fingerprint
index (SURVEY §2.3 L2/L5 → 'the tier collapses into the shuffle').
Band rows are (bucket_key, doc_id); a ``groupby(bucket_key)`` then
pairs members within each bucket.

Skew (north_rule: 'explicit salted-key skew splitting'): web corpora
have pathological buckets (boilerplate pages).  A bucket of size n
would emit O(n^2) pairs.  Strategy:
  - n <= max_bucket_pairs: all C(n,2) pairs (exact within bucket);
  - n  > max_bucket_pairs: *salted star+chain* pairing — members are
    split into ``num_salts`` deterministic sub-buckets; within each
    sub-bucket a chain (m_i, m_i+1) is emitted, and each sub-bucket's
    minimum member is paired to the bucket's global minimum (the star
    across salt boundaries).  This keeps every member transitively
    connected to the bucket minimum in O(n) pairs, which is sufficient
    for *clustering* (union-find closes the transitive hull); pairwise
    verification happens on these edges only.
All emitted pairs carry their source tag for metrics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.hashing import U64, combine64
from dedup_restore_ray.functions.lsh import band_keys
from dedup_restore_ray.functions.minhash import EMPTY_SIG
from dedup_restore_ray.functions.simhash import simhash_band_keys


class BandExpand:
    """signatures batch -> (bucket_key:uint64, doc_id) bucket rows.

    The union of candidate *sources* in one row stream (so ONE sort +
    pair chain serves them all):
      - minhash LSH bands (16 per doc) — near-dup candidates;
      - SimHash bands (hamming <= t pigeonhole guarantee), when
        ``use_simhash``;
      - winnowed substring fingerprints, when ``use_fingerprints``
        (the suffix-array pass's shuffle formulation);
      - the norm-hash rail, when ``use_norm`` — docs with identical
        normalized token streams share a bucket; their pairs verify at
        Jaccard exactly 1 (incl. the zero-shingle group), so the rail
        needs no separate edge stage.
    Each source's keys are mixed with a distinct tag so keyspaces never
    collide across sources.
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 use_simhash: bool = True, use_fingerprints: bool = True,
                 use_norm: bool = True, use_minhash: bool = True):
        self.cfg = cfg or PipelineConfig()
        self.use_minhash = use_minhash
        self.use_simhash = use_simhash
        self.use_fingerprints = use_fingerprints
        self.use_norm = use_norm
        self.n_simhash_bands = self.cfg.simhash_hamming_threshold + 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        if n == 0:
            return pa.table({"bucket_key": pa.array([], pa.uint64()),
                             "doc_id": batch.column("doc_id")})
        if "bucket_keys" in batch.schema.names:
            # keys precomputed by SignatureStage(emit_bucket_keys=True)
            bk = batch.column("bucket_keys").combine_chunks()
            counts = np.diff(np.asarray(bk.offsets))
            idx = np.repeat(np.arange(n), counts)
            return pa.table({
                "bucket_key": pa.array(np.asarray(bk.flatten(),
                                                  dtype=U64), pa.uint64()),
                "doc_id": batch.column("doc_id").take(pa.array(idx)),
            })
        mh = np.asarray(batch.column("minhash").combine_chunks().flatten(),
                        dtype=U64).reshape(n, cfg.num_perm)
        keys, ids = [], []
        if self.use_minhash:
            bk = band_keys(mh, cfg.num_bands, cfg.rows_per_band)  # [n, B]
            keys.append(bk.reshape(-1))
            ids.append(np.repeat(np.arange(n), cfg.num_bands))
        if self.use_simhash:
            sh = np.asarray(batch.column("simhash"), dtype=U64)
            sb = simhash_band_keys(sh, self.n_simhash_bands)
            # tag simhash keyspace so it never collides with minhash keys
            sb = combine64(sb.reshape(-1), np.uint64(0x51))
            empty = (mh[:, 0] == EMPTY_SIG)
            sbm = sb.reshape(n, self.n_simhash_bands)
            if empty.any():
                # empty docs: make simhash keys unique too
                from dedup_restore_ray.functions.hashing import mix64
                uniq = mix64(np.flatnonzero(empty).astype(np.uint64))
                sbm[empty] = combine64(
                    np.repeat(uniq, self.n_simhash_bands).reshape(-1, self.n_simhash_bands),
                    np.uint64(7))
            keys.append(sbm.reshape(-1))
            ids.append(np.repeat(np.arange(n), self.n_simhash_bands))
        if self.use_fingerprints:
            fps = batch.column("fingerprints").combine_chunks()
            fp_flat = np.asarray(fps.flatten(), dtype=U64)
            counts = np.diff(np.asarray(fps.offsets))
            keys.append(combine64(fp_flat, np.uint64(0xF1)))
            ids.append(np.repeat(np.arange(n), counts))
        if self.use_norm:
            nh = batch.column("norm_hash").combine_chunks()
            nh64 = np.frombuffer(b"".join(
                buf[:8] for buf in nh.to_pylist()), dtype=U64)
            keys.append(combine64(nh64, np.uint64(0xA7)))
            ids.append(np.arange(n))
        key_arr = np.concatenate(keys)
        id_idx = np.concatenate(ids)
        doc_ids = batch.column("doc_id").take(pa.array(id_idx))
        return pa.table({"bucket_key": pa.array(key_arr, pa.uint64()),
                         "doc_id": doc_ids})


def candidate_pairs(signatures: "ray.data.Dataset",
                    cfg: PipelineConfig | None = None,
                    use_simhash: bool = True,
                    use_fingerprints: bool = False,
                    use_norm: bool = False,
                    use_minhash: bool = True) -> "ray.data.Dataset":
    """signatures -> distinct candidate (u, v) pairs, u < v.

    Band expansion (map_batches) feeds the sort-based vectorized bucket
    pairing of stages/groups.py — one sort shuffle over the band rows,
    block-level pair kernels, residual pass for boundary groups, then a
    sort-based distinct on (u, v)."""
    cfg = cfg or PipelineConfig()
    from dedup_restore_ray.stages.groups import bucket_pairs
    bands = signatures.map_batches(
        BandExpand(cfg, use_simhash=use_simhash,
                   use_fingerprints=use_fingerprints, use_norm=use_norm,
                   use_minhash=use_minhash),
        batch_format="pyarrow")
    return bucket_pairs(bands, cfg.max_bucket_pairs, cfg.num_salts)
