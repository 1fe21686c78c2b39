"""Deterministic 64-bit hashing primitives (vectorized).

Plays the role of the reference's cheap string hashes
(bkdr/sax/sdbm, reference: src/memstore.c:37-55, src/bloomfilter.c:14-70)
and of the SHA-1 content fingerprint (reference: src/dedup.c:80-88,
src/sha1.c) — but vectorized with numpy where the value is consumed
numerically, and ``hashlib`` where a collision-resistant digest is the
point.
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants — public-domain finalizer (Steele et al.)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)

_SCRATCH: dict[str, np.ndarray] = {}


def scratch(name: str, size: int, dtype=U64) -> np.ndarray:
    """Process-local grow-only scratch buffer (UNINITIALIZED view of the
    first ``size`` elements).  Hot batch kernels that allocate full-size
    temporaries per call pay a first-touch page fault for every page on
    every call (numpy frees large buffers back to the OS) — on this
    host's documented 10-100x page-fault-bandwidth swings that is the
    multi-worker scaling limiter, not the arithmetic.  A named scratch
    buffer faults once per worker process and stays warm.

    Single-threaded use only (Ray actors/tasks run one batch at a time
    per process); a view is valid until the next request for the same
    name."""
    buf = _SCRATCH.get(name)
    dt = np.dtype(dtype)
    if buf is None or buf.size < size or buf.dtype != dt:
        cap = max(int(size), 1 << 14)
        if buf is not None and buf.dtype == dt:
            cap = max(cap, buf.size * 2)
        buf = np.empty(cap, dtype=dt)
        _SCRATCH[name] = buf
    return buf[:size]


def mix64(x: np.ndarray | int) -> np.ndarray:
    """splitmix64 finalizer: strong 64-bit avalanche mix, vectorized."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=U64) + _SM_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def mix64_inplace(z: np.ndarray, scratch: np.ndarray | None = None
                  ) -> np.ndarray:
    """splitmix64 finalizer applied IN PLACE to a uint64 array, with one
    reusable scratch buffer instead of mix64's four full-size
    temporaries.  Fresh-page faults on large numpy temporaries are the
    measured multi-worker scaling limiter on shared hosts — on the hot
    signature path every avoided allocation is ~8 bytes/char of text."""
    t = scratch[: len(z)] if scratch is not None and len(scratch) >= len(z) \
        else np.empty_like(z)
    with np.errstate(over="ignore"):
        z += _SM_GAMMA
        np.right_shift(z, np.uint64(30), out=t)
        z ^= t
        z *= _SM_M1
        np.right_shift(z, np.uint64(27), out=t)
        z ^= t
        z *= _SM_M2
        np.right_shift(z, np.uint64(31), out=t)
        z ^= t
    return z


def csr_sorted_unique(flat: np.ndarray, offsets: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment sorted-unique over a CSR layout with NO per-segment
    allocations: in-place slice sorts (flat is MUTATED), then one global
    shift-compare keep mask + cumsum for the new offsets.  Replaces a
    np.unique call per segment (2 allocations each) on hot signature
    paths."""
    n_seg = len(offsets) - 1
    if len(flat) == 0:
        return flat, np.zeros(n_seg + 1, dtype=np.int64)
    off_l = offsets.tolist()
    for j in range(n_seg):
        flat[off_l[j]:off_l[j + 1]].sort()
    # keep mask + rank cumsum from the scratch arena: two full-size
    # temporaries per call otherwise (the compacted flat[keep] result
    # is necessarily fresh — it is returned)
    keep = scratch("cu_keep", len(flat), dtype=bool)
    keep[0] = True
    np.not_equal(flat[1:], flat[:-1], out=keep[1:])
    keep[offsets[:-1][np.diff(offsets) > 0]] = True   # segment restarts
    csum = scratch("cu_csum", len(flat), dtype=np.int64)
    np.cumsum(keep, out=csum)
    out_offs = np.zeros(n_seg + 1, dtype=np.int64)
    nonempty = offsets[1:] > offsets[:-1]
    out_offs[1:][nonempty] = csum[offsets[1:][nonempty] - 1]
    np.maximum.accumulate(out_offs, out=out_offs)     # carry over empties
    return flat[keep], out_offs


def combine64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Order-sensitive combination of two 64-bit hash arrays."""
    with np.errstate(over="ignore"):
        return mix64(np.asarray(a, U64) * _SM_M1 + np.asarray(b, U64))


def arrow_row_hashes(col) -> np.ndarray:
    """uint64 hash per row of an Arrow (Chunked)Array with NO per-row
    Python.  Integers: splitmix64 (a bijection).  Strings/binary: one
    polynomial rolling hash over the flat byte buffer evaluated per
    row via the value offsets (the fingerprint.py prefix-sum trick),
    finalized with mix64 mixed with the row length."""
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return mix64(np.asarray(col).astype(U64))
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
            or pa.types.is_binary(col.type)
            or pa.types.is_large_binary(col.type)):
        raise TypeError(f"arrow_row_hashes: unsupported type {col.type}")
    if col.null_count:
        raise ValueError("arrow_row_hashes: nulls unsupported")
    n = len(col)
    if n == 0:
        return np.empty(0, U64)
    odt = (np.int64 if (pa.types.is_large_string(col.type)
                        or pa.types.is_large_binary(col.type))
           else np.int32)
    off = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset:col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    start, end = off[0], off[-1]
    d = data[start:end]
    off = off - start
    from dedup_restore_ray.functions.fingerprint import _BASE_INV, _pow_tables
    m = len(d)
    powP, powPinv = _pow_tables(m + 1)
    with np.errstate(over="ignore"):
        term = d.astype(U64)
        if m > 1:
            np.multiply(term[1:], powPinv[:m - 1], out=term[1:])
        S = np.empty(m + 1, dtype=U64)
        S[0] = 0
        np.cumsum(term, dtype=U64, out=S[1:])
        h = (S[off[1:]] - S[off[:-1]]) * powP[np.minimum(off[1:], m)]
        lengths = (off[1:] - off[:-1]).astype(U64)
        return mix64(h ^ mix64(lengths))


def hash_bytes_u64(data: bytes, seed: int = 0) -> int:
    """Scalar 64-bit hash of bytes via blake2b (deterministic, process-independent)."""
    h = hashlib.blake2b(data, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


class WordHasher:
    """word -> uint64, cached.  Build once per actor (reference pattern:
    index loaded once per worker, SURVEY §2.3); the cache amortizes the
    blake2b cost across repeated words within and across batches."""

    __slots__ = ("cache", "seed", "_max_cache")

    def __init__(self, seed: int = 0, max_cache: int = 1 << 20):
        self.cache: dict[str, int] = {}
        self.seed = seed
        self._max_cache = max_cache

    def hash_words(self, words: list[str],
                   out: np.ndarray | None = None) -> np.ndarray:
        """``out`` (e.g. a scratch-arena view) avoids a fresh full-size
        allocation per batch on the hot signature path."""
        cache = self.cache
        seed = self.seed
        if out is None:
            out = np.empty(len(words), dtype=U64)
        for i, w in enumerate(words):
            v = cache.get(w)
            if v is None:
                v = hash_bytes_u64(w.encode("utf-8", "surrogatepass"), seed)
                if len(cache) < self._max_cache:
                    cache[w] = v
            out[i] = v
        return out


class Md5WordHasher:
    """word -> uint64 via DuckDB's ``md5_number_lower`` convention
    (little-endian uint64 of md5 digest bytes 8..16, the same contract
    functions.sketch.kmv_hash proves bit-exact).  Drop-in for
    WordHasher on operators whose SQL oracle must RE-DERIVE the word
    hashes — blake2b is not SQL-expressible, md5 is."""

    __slots__ = ("cache", "_max_cache")

    def __init__(self, max_cache: int = 1 << 20):
        self.cache: dict[str, int] = {}
        self._max_cache = max_cache

    def hash_words(self, words: list[str],
                   out: np.ndarray | None = None) -> np.ndarray:
        cache = self.cache
        md5 = hashlib.md5
        if out is None:
            out = np.empty(len(words), dtype=U64)
        for i, w in enumerate(words):
            v = cache.get(w)
            if v is None:
                d = md5(w.encode("utf-8", "surrogatepass")).digest()
                v = int.from_bytes(d[8:16], "little")
                if len(cache) < self._max_cache:
                    cache[w] = v
            out[i] = v
        return out


def sha1_digest(data: bytes) -> bytes:
    """20-byte SHA-1 content fingerprint (reference: src/dedup.c:84 uses
    the first 17 bytes of SHA-1 as the chunk fingerprint)."""
    return hashlib.sha1(data).digest()


def content_hashes(texts) -> list[bytes]:
    """SHA-1 per text (hot path is the C sha1 in hashlib; the Python loop
    only dispatches).  Accepts str or pre-encoded utf-8 bytes."""
    return [hashlib.sha1(t if isinstance(t, bytes)
                         else t.encode("utf-8", "surrogatepass")).digest()
            if t is not None else b"\x00" * 20
            for t in texts]


def binary_csr(arr) -> tuple[np.ndarray, np.ndarray]:
    """(uint8 data view, absolute int64 offsets [n+1]) of an Arrow
    binary/string array — ZERO-COPY views into the Arrow buffers
    (doc i's bytes are data[offsets[i]:offsets[i+1]]).  Handles chunked
    arrays, sliced arrays (nonzero ``arr.offset``) and large types.
    Nulls read as empty spans (Arrow stores equal adjacent offsets)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    wide = pa.types.is_large_binary(t) or pa.types.is_large_string(t)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64 if wide else np.int32)
    offs = offs[arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    return data, offs


def content_hashes_arrow(arr) -> list[bytes]:
    """SHA-1 per element of an Arrow binary/string array, hashing
    memoryview slices of the Arrow data buffer directly — no per-doc
    Python bytes objects (the to_pylist() + content_hashes form copied
    the whole corpus through the Python heap every signature batch).
    Nulls -> b"\\x00"*20, matching content_hashes."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    data, offs = binary_csr(arr)
    mv = memoryview(data)
    o = offs.tolist()
    out = [hashlib.sha1(mv[o[i]:o[i + 1]]).digest()
           for i in range(len(o) - 1)]
    if arr.null_count:
        zero = b"\x00" * 20
        for i in np.flatnonzero(
                ~np.asarray(arr.is_valid(), dtype=bool)).tolist():
            out[i] = zero
    return out
