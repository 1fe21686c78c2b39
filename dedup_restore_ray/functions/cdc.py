"""Content-defined chunking: rolling Adler-32 boundary detection.

Faithful re-expression of the reference's chunker
(reference: src/chunk.c:31-127 `newly_chunk` + src/adler32.c:12-45):
slide a WIN_LEN-byte window over the payload; cut a chunk when
``(checksum & CHUNK_MASK) == CHUNK_MASK``, subject to MIN/MAX chunk
lengths (reference: include/config.h:53-56 — MIN 512 B, MAX 16 KiB,
mask 0x03FF ≈ 1 KiB expected, window 48 B).

Vectorized: the Adler-32 of every WIN_LEN window is computed with two
cumulative sums over the whole byte array (a(i) = Σ window bytes + WIN,
b(i) = Σ (WIN-j)·byte — both expressible with prefix sums), then the
min/max-length constraints are applied with a linear boundary scan over
the (sparse) candidate cut positions only.
"""

from __future__ import annotations

import numpy as np

WIN_LEN = 48
MIN_CHUNK = 512
MAX_CHUNK = 16384
CHUNK_MASK = 0x03FF
_ADLER_MOD = 65521


def rolling_adler32(data: np.ndarray, win: int = WIN_LEN) -> np.ndarray:
    """Adler-32 checksum of every ``win``-byte window (vectorized).

    Returns uint32 array of length len(data)-win+1; h[i] covers
    data[i:i+win].  Matches the incremental formulation of
    reference src/adler32.c (s1 = 1 + Σ bytes, s2 = Σ s1 steps), with
    the same modulus.
    """
    d = np.asarray(data, dtype=np.uint64)
    n = len(d)
    if n < win:
        return np.empty(0, dtype=np.uint32)
    zero = np.zeros(1, dtype=np.uint64)
    csum = np.concatenate((zero, np.cumsum(d)))             # Σ d[0:i]
    # s1(i) = 1 + Σ d[i:i+win]
    s1 = np.uint64(1) + (csum[win:] - csum[:-win])
    # s2(i) = win + Σ_{j} (win-j) * d[i+j]  (+ win from the leading 1s)
    wsum = np.concatenate((zero, np.cumsum(d * np.arange(1, n + 1,
                                                         dtype=np.uint64))))
    # Σ (win-j)·d[i+j] = (i+win)·Σ d[i:i+win] - Σ (k+1)·d[k] over window + Σ d
    # derive via: Σ_{k=i}^{i+win-1} (i+win-k)·d[k]
    #           = (i+win)·(csum[i+win]-csum[i]) - (wsum[i+win]-wsum[i]) + 0
    i = np.arange(len(s1), dtype=np.uint64)
    # Σ_{k=i}^{i+w-1} (w+i-k)·d[k] = (w+i+1)·Σd − Σ(k+1)·d[k]
    s2 = (np.uint64(win)
          + (i + np.uint64(win + 1)) * (csum[win:] - csum[:-win])
          - (wsum[win:] - wsum[:-win]))
    s1 %= _ADLER_MOD
    s2 %= _ADLER_MOD
    return ((s2 << np.uint64(16)) | s1).astype(np.uint32)


def chunk_boundaries(data: bytes, min_chunk: int = MIN_CHUNK,
                     max_chunk: int = MAX_CHUNK, mask: int = CHUNK_MASK,
                     win: int = WIN_LEN) -> np.ndarray:
    """End offsets of content-defined chunks covering ``data``.

    A cut happens at the end of the window whose checksum satisfies
    ``(h & mask) == mask`` (reference src/chunk.c:84-97), no closer
    than min_chunk to the previous cut and never beyond max_chunk.
    The final partial chunk always ends at len(data).
    """
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    arr = np.frombuffer(data, dtype=np.uint8)
    h = rolling_adler32(arr, win)
    # candidate cut positions: cut AFTER the window, i.e. at i+win
    cand = np.flatnonzero((h & np.uint32(mask)) == np.uint32(mask)) + win
    bounds = []
    prev = 0
    ci = 0
    m = len(cand)
    while prev < n:
        # next candidate >= prev + min_chunk
        ci = np.searchsorted(cand, prev + min_chunk)
        if ci < m and cand[ci] <= prev + max_chunk:
            cut = int(cand[ci])
        else:
            cut = min(prev + max_chunk, n)
        bounds.append(cut)
        prev = cut
    return np.asarray(bounds, dtype=np.int64)


def chunk_payload(data: bytes, **kw) -> list[bytes]:
    """Split bytes into content-defined chunks (concatenation-preserving)."""
    bounds = chunk_boundaries(data, **kw)
    out = []
    prev = 0
    for b in bounds:
        out.append(data[prev:b])
        prev = int(b)
    return out
