"""Content-defined chunking: rolling-checksum boundary detection.

Faithful re-expression of the reference's chunker
(reference: src/chunk.c:31-127 `newly_chunk` + src/adler32.c:12-45):
slide a WIN_LEN-byte window over the payload; cut a chunk when
``(checksum & CHUNK_MASK) == CHUNK_MASK``, subject to MIN/MAX chunk
lengths (reference: include/config.h:53-56 — MIN 512 B, MAX 16 KiB,
mask 0x03FF ≈ 1 KiB expected, window 48 B).

The reference checksum is NOT classic Adler-32: it is the rsync-style
variant (s1 = s2 = 0 initial state, CHAR_OFFSET 0, *signed*-char
bytes, implicit mod 2^16 — reference src/adler32.c:12-28,
include/adler32.h:11).  ``rolling_rsync32`` reproduces that formula
bit-exactly, so ``chunk_boundaries`` produces the reference's cut
positions.  (Sole divergence, documented: when a MAX-length cut
coincides with a mask hit the reference also emits a zero-length
chunk, src/chunk.c:93-112; boundary *positions* are identical.)
``rolling_adler32`` (classic zlib Adler-32) is kept as an alternative
hash for callers that want the standard checksum.

Vectorized: the checksum of every WIN_LEN window is computed with two
cumulative sums over the whole byte array (s1(i) = Σ window bytes,
s2(i) = Σ (WIN-j)·byte — both expressible with prefix sums), then the
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


def rolling_rsync32(data: np.ndarray, win: int = WIN_LEN) -> np.ndarray:
    """The reference's window checksum, bit-exact (src/adler32.c:12-28):
    s1 = Σ signed bytes, s2 = Σ running-s1 = Σ (win-j)·byte, both
    implicitly mod 2^16; result = (s1 & 0xffff) + (s2 << 16).

    Returns uint32 array of length len(data)-win+1; h[i] covers
    data[i:i+win].  Equals the reference's incremental
    adler32_rolling_checksum stream (src/adler32.c:34-45) because the
    rolling update is exact mod 2^16.
    """
    d = np.asarray(data, dtype=np.uint8).view(np.int8).astype(np.int64)
    n = len(d)
    if n < win:
        return np.empty(0, dtype=np.uint32)
    zero = np.zeros(1, dtype=np.int64)
    csum = np.concatenate((zero, np.cumsum(d)))             # Σ d[0:i]
    s1 = csum[win:] - csum[:-win]
    # s2(i) = Σ_{k=i}^{i+w-1} (i+w-k)·d[k]
    #       = (i+w+1)·Σ d[i:i+w] − Σ (k+1)·d[k] over the window
    wsum = np.concatenate((zero, np.cumsum(d * np.arange(1, n + 1,
                                                         dtype=np.int64))))
    i = np.arange(len(s1), dtype=np.int64)
    s2 = (i + win + 1) * s1 - (wsum[win:] - wsum[:-win])
    s1 &= 0xFFFF
    s2 &= 0xFFFF
    return ((s2 << 16) | s1).astype(np.uint32)


def rolling_adler32(data: np.ndarray, win: int = WIN_LEN) -> np.ndarray:
    """Classic (zlib) Adler-32 of every ``win``-byte window, vectorized
    — NOT the reference's formula (see module docstring); kept for
    callers wanting the standard checksum.

    Returns uint32 array of length len(data)-win+1; h[i] covers
    data[i:i+win].
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
    The final partial chunk always ends at len(data).  Uses the
    reference's rsync-style checksum (``rolling_rsync32``) so cut
    positions match the reference chunker bit-exactly.
    """
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    arr = np.frombuffer(data, dtype=np.uint8)
    h = rolling_rsync32(arr, win)
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
