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


def lsh_collision_prob(s: np.ndarray, num_bands: int,
                       rows_per_band: int) -> np.ndarray:
    """P(candidate | Jaccard s) for banded MinHash LSH:
    ``1 - (1 - s^r)^b`` — the S-curve every banding choice trades
    false positives against false negatives along."""
    s = np.asarray(s, dtype=np.float64)
    return 1.0 - (1.0 - s ** rows_per_band) ** num_bands


def optimal_bands(threshold: float, num_perm: int = 128,
                  fp_weight: float = 0.5, fn_weight: float = 0.5,
                  grid: int = 1000) -> tuple[int, int, float]:
    """Choose (num_bands, rows_per_band) for a target Jaccard
    threshold: among all factorizations b*r = num_perm, minimize the
    weighted error integral

        fp_weight * ∫₀ᵗ P(candidate|s) ds          (false positives)
      + fn_weight * ∫ₜ¹ (1 - P(candidate|s)) ds    (false negatives)

    — the standard MinHashLSH tuning rule (Leskovec-Rajaraman-Ullman
    ch.3; same objective as the datasketch library), evaluated by
    brute force over the divisor pairs with a fixed midpoint grid.
    Returns (num_bands, rows_per_band, error).  Deterministic: ties
    break toward more bands (higher recall)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    xs = (np.arange(grid, dtype=np.float64) + 0.5) / grid
    below = xs < threshold
    best = None
    for r in range(1, num_perm + 1):
        if num_perm % r:
            continue
        b = num_perm // r
        p = lsh_collision_prob(xs, b, r)
        fp = float(p[below].sum()) / grid
        fn = float((1.0 - p[~below]).sum()) / grid
        err = fp_weight * fp + fn_weight * fn
        if best is None or err < best[2] - 1e-15 or (
                abs(err - best[2]) <= 1e-15 and b > best[0]):
            best = (b, r, err)
    return best
