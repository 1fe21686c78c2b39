"""Exact Jaccard over sorted-unique uint64 shingle-hash arrays.

The verification step (north_rule: 'candidate pairs are verified with
exact Jaccard') — plays the role of the reference's exact fingerprint
comparison on index hit (reference: src/dedup.c:135-146): LSH (like the
bloom filter, src/bloomfilter.c:96-191) may produce false positives;
this is the authoritative check.
"""

from __future__ import annotations

import numpy as np


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 arrays (64-bit hash
    collisions are the only approximation; P < 1e-9 at doc scale)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    inter = intersect_size_sorted(a, b)
    return inter / (la + lb - inter)


def intersect_size_sorted(a: np.ndarray, b: np.ndarray) -> int:
    """|A ∩ B| for sorted-unique arrays via merge (np.searchsorted)."""
    if len(a) > len(b):
        a, b = b, a
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = len(b) - 1
    return int(np.count_nonzero(b[idx] == a))


def jaccard_batch(flat: np.ndarray,
                  a_starts: np.ndarray, a_lens: np.ndarray,
                  b_starts: np.ndarray, b_lens: np.ndarray) -> np.ndarray:
    """Exact Jaccard for a whole BATCH of pairs at once — no per-pair
    Python loop.  Each pair i compares the sorted-unique slices
    ``flat[a_starts[i]:a_starts[i]+a_lens[i]]`` and
    ``flat[b_starts[i]:b_starts[i]+b_lens[i]]``.

    Method: gather both sides with one vectorized CSR expansion, tag
    every element with its pair index, lexsort by (pair, value); an
    element common to both sides of a pair appears exactly twice
    adjacently (sides are unique-valued), so intersection sizes fall
    out of one adjacent-equality bincount.  O(N log N) numpy for the
    whole batch.
    """
    n = len(a_starts)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    a_lens = np.asarray(a_lens, dtype=np.int64)
    b_lens = np.asarray(b_lens, dtype=np.int64)

    def expand(starts, lens):
        total = int(lens.sum())
        idx = np.arange(total, dtype=np.int64)
        idx += np.repeat(np.asarray(starts, np.int64)
                         - np.concatenate((np.zeros(1, np.int64),
                                           np.cumsum(lens[:-1]))), lens)
        return idx

    ia = expand(a_starts, a_lens)
    ib = expand(b_starts, b_lens)
    vals = np.concatenate((flat[ia], flat[ib]))
    pids = np.concatenate((np.repeat(np.arange(n, dtype=np.int64), a_lens),
                           np.repeat(np.arange(n, dtype=np.int64), b_lens)))
    order = np.lexsort((vals, pids))
    pv, vv = pids[order], vals[order]
    dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
    inter = np.bincount(pv[1:][dup], minlength=n).astype(np.int64)
    union = a_lens + b_lens - inter
    out = np.zeros(n, dtype=np.float64)
    both_empty = (a_lens == 0) & (b_lens == 0)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    out[both_empty] = 1.0
    return out


def ngram_jaccard(text_a: str, text_b: str, k: int, encoder) -> float:
    """Convenience: exact k-gram Jaccard of two raw texts using a
    ShingleEncoder (for tests / small oracles)."""
    flat, off = encoder.encode([text_a, text_b])
    return jaccard_sorted(flat[off[0]:off[1]], flat[off[1]:off[2]])
