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
