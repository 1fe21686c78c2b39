"""LSH band keys (16 bands x 8 rows) from MinHash signature matrices.

The reference locates duplicates with a central fingerprint index
(reference: src/diskhash.c, src/memstore.c).  On Ray that index becomes
a *shuffle*: every doc emits one row per band keyed by the hash of that
band's 8 signature slots; a ``groupby(band_key)`` brings all docs that
collide in any band to one task (SURVEY §2.3 L2/L5 mapping).
"""

from __future__ import annotations

import numpy as np

from dedup_restore_ray.functions.hashing import U64, combine64, mix64
from dedup_restore_ray.functions.minhash import EMPTY_SIG


def compute_bucket_keys(cfg, sig: np.ndarray, simhash: np.ndarray | None,
                        fp_flat: np.ndarray | None,
                        fp_counts: np.ndarray | None,
                        norm64: np.ndarray | None
                        ) -> tuple[np.ndarray, np.ndarray]:
    """All candidate-source bucket keys per doc as one CSR list:
    minhash LSH band keys, SimHash band keys (tag 0x51), winnowed
    substring fingerprints (tag 0xF1), norm-hash rail key (tag 0xA7).
    Returns (flat uint64 keys, int64 offsets [n+1])."""
    from dedup_restore_ray.functions.minhash import EMPTY_SIG
    from dedup_restore_ray.functions.simhash import simhash_block_keys
    n = sig.shape[0]
    per_doc_parts: list[np.ndarray] = []
    counts = np.zeros(n, dtype=np.int64)
    cols: list[np.ndarray] = []   # fixed-width [n, k] sources
    bk = band_keys(sig, cfg.num_bands, cfg.rows_per_band)
    cols.append(bk)
    if simhash is not None:
        sb = simhash_block_keys(np.asarray(simhash, U64),
                                cfg.simhash_hamming_threshold)
        nsb = sb.shape[1]
        sb = combine64(sb.reshape(-1), np.uint64(0x51)).reshape(n, nsb)
        empty = (sig[:, 0] == EMPTY_SIG) if n else np.zeros(0, bool)
        if empty.any():
            uniq = mix64(np.flatnonzero(empty).astype(np.uint64))
            sb[empty] = combine64(
                np.repeat(uniq, nsb).reshape(-1, nsb), np.uint64(7))
        cols.append(sb)
    if norm64 is not None:
        cols.append(combine64(norm64, np.uint64(0xA7))[:, None])
    fixed = np.concatenate(cols, axis=1) if n else np.empty((0, 0), U64)
    kfix = fixed.shape[1]
    if fp_flat is None:
        flat = fixed.reshape(-1)
        offsets = np.arange(n + 1, dtype=np.int64) * kfix
        return flat, offsets
    fpk = combine64(np.asarray(fp_flat, U64), np.uint64(0xF1))
    counts = kfix + np.asarray(fp_counts, np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = np.empty(int(offsets[-1]), dtype=U64)
    # place fixed-width keys then fingerprints per doc (vectorized)
    fix_idx = (np.repeat(offsets[:-1], kfix)
               + np.tile(np.arange(kfix, dtype=np.int64), n))
    flat[fix_idx] = fixed.reshape(-1)
    fp_starts = offsets[:-1] + kfix
    fp_total = int(np.asarray(fp_counts, np.int64).sum())
    fp_idx = (np.repeat(fp_starts, fp_counts)
              + np.arange(fp_total, dtype=np.int64)
              - np.repeat(np.concatenate(
                  ([0], np.cumsum(fp_counts)[:-1])).astype(np.int64),
                  fp_counts))
    flat[fp_idx] = fpk
    return flat, offsets


def band_keys(sig: np.ndarray, num_bands: int, rows_per_band: int) -> np.ndarray:
    """[n_docs, num_bands] uint64 keys.  Key = mix(band_idx, 8 slots).

    Docs with EMPTY_SIG signatures (no shingles) get per-doc-unique
    sentinel keys so they never form LSH candidates (exact dedup still
    catches byte-identical empties via content hash).
    """
    n, p = sig.shape
    assert num_bands * rows_per_band == p
    out = np.empty((n, num_bands), dtype=U64)
    for bidx in range(num_bands):
        block = sig[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
        acc = np.full(n, np.uint64(bidx), dtype=U64)
        for r in range(rows_per_band):
            acc = combine64(acc, block[:, r])
        out[:, bidx] = acc
    # sentinel-ize empty docs: key unique per (doc, band), marked by high bit
    empty = (sig[:, 0] == EMPTY_SIG)
    if empty.any():
        idx = np.flatnonzero(empty)
        uniq = mix64(idx.astype(np.uint64)) | np.uint64(1) << np.uint64(63)
        for bidx in range(num_bands):
            out[idx, bidx] = combine64(uniq, np.uint64(bidx))
    return out
