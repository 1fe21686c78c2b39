"""MinHash signatures (128 permutations) over CSR shingle hashes.

Replaces the reference's exact fingerprint index lookup
(reference: src/dedup.c:105-175) with a *similarity*-preserving sketch:
P(minhash_i(A) == minhash_i(B)) = Jaccard(A, B).

Vectorization: the permutations are universal hashes
``h_i(x) = a_i * x + b_i (mod 2^64)`` applied to the flat shingle array
by broadcasting, then reduced per document with
``np.minimum.reduceat`` — zero Python loops over shingles or docs.
Permutations are processed in chunks to bound the [S, P] temporary.
"""

from __future__ import annotations

import numpy as np

from dedup_restore_ray.functions.hashing import U64

EMPTY_SIG = np.uint64(0xFFFFFFFFFFFFFFFF)  # signature slot for shingle-less docs


def make_permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficient vectors; a forced odd so the map
    x -> a*x+b is a bijection on Z_2^64."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    flat: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    perm_chunk: int = 32,
) -> np.ndarray:
    """[n_docs, num_perm] uint64 signature matrix from CSR shingles.

    Docs with zero shingles get EMPTY_SIG in every slot (they are never
    considered near-duplicates of anything by LSH; exact dedup handles
    empty docs via the content hash path).
    """
    n_docs = len(offsets) - 1
    num_perm = len(a)
    sig = np.full((n_docs, num_perm), EMPTY_SIG, dtype=U64)
    if len(flat) == 0:
        return sig
    starts = offsets[:-1]
    lengths = np.diff(offsets)
    nonempty = lengths > 0
    # reduceat segments must be non-empty; compact to non-empty docs.
    ne_starts_in_compact = None
    if not nonempty.all():
        keep_rows = np.repeat(nonempty, lengths)
        # flat already contains only rows of non-empty docs by construction,
        # but offsets of empty docs repeat — build compacted offsets:
        ne_lengths = lengths[nonempty]
        ne_starts_in_compact = np.concatenate(([0], np.cumsum(ne_lengths)[:-1]))
        flat_c = flat
        del keep_rows
    else:
        ne_lengths = lengths
        ne_starts_in_compact = starts
        flat_c = flat
    x = flat_c
    out_rows = np.flatnonzero(nonempty)
    for p0 in range(0, num_perm, perm_chunk):
        p1 = min(p0 + perm_chunk, num_perm)
        with np.errstate(over="ignore"):
            y = x[:, None] * a[None, p0:p1] + b[None, p0:p1]  # [S, pc]
        mins = np.minimum.reduceat(y, ne_starts_in_compact, axis=0)  # [n_ne, pc]
        sig[out_rows, p0:p1] = mins
    return sig


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing signature slots — unbiased Jaccard estimate."""
    return float(np.mean(sig_a == sig_b))
