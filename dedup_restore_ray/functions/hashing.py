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


def mix64(x: np.ndarray | int) -> np.ndarray:
    """splitmix64 finalizer: strong 64-bit avalanche mix, vectorized."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=U64) + _SM_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def combine64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Order-sensitive combination of two 64-bit hash arrays."""
    with np.errstate(over="ignore"):
        return mix64(np.asarray(a, U64) * _SM_M1 + np.asarray(b, U64))


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

    def hash_words(self, words: list[str]) -> np.ndarray:
        cache = self.cache
        seed = self.seed
        out = np.empty(len(words), dtype=U64)
        for i, w in enumerate(words):
            v = cache.get(w)
            if v is None:
                v = hash_bytes_u64(w.encode("utf-8", "surrogatepass"), seed)
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
    only dispatches)."""
    return [hashlib.sha1(t.encode("utf-8", "surrogatepass")).digest()
            if t is not None else b"\x00" * 20
            for t in texts]
