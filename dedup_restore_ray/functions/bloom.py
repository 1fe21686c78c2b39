"""Bloom filter — optional per-actor dedup prefilter.

Re-expression of the reference's bloom filter (reference:
src/bloomfilter.c:96-191 — BF_LEN bits, two hash functions sax/sdbm,
``bloom_check`` before the exact index lookup, src/dedup.c:120-134).
On Ray the filter is NOT authoritative (exactness comes from the
groupby shuffle); it serves as an actor-local prefilter that lets a
streaming stage skip exact-index work for definitely-new keys, and its
false-positive counter reproduces the reference's ``BF_false`` metric
(optsmr.log:15).

Vectorized over uint64 key arrays; two derived hash functions via
splitmix64 remixes (the reference's sax/sdbm pair collapsed to two
independent 64-bit mixes).
"""

from __future__ import annotations

import numpy as np

from dedup_restore_ray.functions.hashing import U64, mix64


class BloomFilter:
    """Fixed-size bit-array bloom filter over uint64 keys."""

    def __init__(self, num_bits: int = 1 << 24, num_hashes: int = 2):
        assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of 2"
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.bits = np.zeros(num_bits // 8, dtype=np.uint8)
        self._mask = np.uint64(num_bits - 1)
        self._seeds = [np.uint64(0x9E3779B97F4A7C15 * (i + 1) & 0xFFFFFFFFFFFFFFFF)
                       for i in range(num_hashes)]

    def _positions(self, keys: np.ndarray) -> list[np.ndarray]:
        keys = np.asarray(keys, dtype=U64)
        with np.errstate(over="ignore"):
            return [(mix64(keys ^ s) & self._mask) for s in self._seeds]

    def add(self, keys: np.ndarray) -> None:
        for pos in self._positions(keys):
            np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def check(self, keys: np.ndarray) -> np.ndarray:
        """bool array: True = possibly present, False = definitely new."""
        out = np.ones(len(np.asarray(keys)), dtype=bool)
        for pos in self._positions(keys):
            byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
            bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            out &= bit.astype(bool)
        return out

    def fp_rate_estimate(self, n_added: int) -> float:
        """Theoretical false-positive rate after n_added inserts."""
        k, m = self.num_hashes, self.num_bits
        return float((1 - np.exp(-k * n_added / m)) ** k)
