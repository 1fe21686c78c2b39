"""Document fingerprinting: rolling-hash k-grams + winnowing.

Direct descendant of the reference's rolling Adler-32 window
(reference: src/adler32.c:27-45, consumed by the chunker
src/chunk.c:31-127): a base-P polynomial rolling hash over the
*normalized character stream*, winnowed (Schleimer et al., MOSS) so each
document keeps O(n / window) fingerprints while guaranteeing that any
shared substring of length >= kgram + window - 1 chars is detected in
both documents.

These fingerprints drive the scale path of the substring-dedup pass
(the suffix-array operator in functions/suffix.py is the per-partition
exact formulation; this one turns substring matching into a plain
groupby shuffle).
"""

from __future__ import annotations

import numpy as np

from dedup_restore_ray.functions.hashing import U64, mix64

_BASE = np.uint64(1000003)


def kgram_hashes(text: str, k: int) -> np.ndarray:
    """uint64 rolling hashes of every k-char window (vectorized: k
    shifted adds over the byte array — k C-loops, no Python per-char
    loop).  len(text) < k -> empty."""
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = len(data)
    if n < k:
        return np.empty(0, dtype=U64)
    m = n - k + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=U64)
        for j in range(k):
            acc = acc * _BASE + data[j : j + m]
    return mix64(acc)


def winnow(hashes: np.ndarray, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing: from every ``window`` consecutive k-gram hashes keep
    the minimum (rightmost on ties).  Returns (positions, fingerprints)
    deduplicated by position, sorted by position."""
    m = len(hashes)
    if m == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=U64)
    if m <= window:
        pos = np.array([int(np.flatnonzero(hashes == hashes.min())[-1])], dtype=np.int64)
        return pos, hashes[pos]
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)  # [m-w+1, w]
    # rightmost argmin: reverse, argmin, map back
    rev = sw[:, ::-1]
    am = window - 1 - rev.argmin(axis=1)
    pos = am + np.arange(len(sw), dtype=np.int64)
    sel = np.unique(pos)
    return sel, hashes[sel]


def winnowed_fingerprints(text: str, k: int, window: int) -> np.ndarray:
    """Sorted-unique winnowed fingerprint hashes for one document."""
    h = kgram_hashes(text, k)
    _, fp = winnow(h, window)
    return np.unique(fp)


def batch_winnowed_fingerprints(texts: list[str], k: int, window: int
                                ) -> list[np.ndarray]:
    """Winnowed fingerprints for a whole batch with ONE global rolling
    hash: the k shifted-add passes run over the concatenation of all
    texts (k numpy ops total instead of k per doc); windows straddling
    document boundaries are discarded by position masking.  Per doc only
    the winnow step (2 numpy calls) remains."""
    enc = [t.encode("utf-8", "surrogatepass") for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    if lens.sum() == 0:
        return [np.empty(0, dtype=U64) for _ in texts]
    data = np.frombuffer(b"".join(enc), dtype=np.uint8)
    n = len(data)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    if n < k:
        return [winnowed_fingerprints(t, k, window) for t in texts]
    m = n - k + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=U64)
        for j in range(k):
            acc = acc * _BASE + data[j : j + m]
    acc = mix64(acc)
    out = []
    for i in range(len(texts)):
        li = int(lens[i])
        if li < k:
            out.append(np.empty(0, dtype=U64))
            continue
        s = int(starts[i])
        h = acc[s : s + li - k + 1]
        _, fp = winnow(h, window)
        out.append(np.unique(fp))
    return out
