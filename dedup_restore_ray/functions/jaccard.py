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


def ngram_jaccard(text_a: str, text_b: str, k: int, encoder) -> float:
    """Convenience: exact k-gram Jaccard of two raw texts using a
    ShingleEncoder (for tests / small oracles)."""
    flat, off = encoder.encode([text_a, text_b])
    return jaccard_sorted(flat[off[0]:off[1]], flat[off[1]:off[2]])
