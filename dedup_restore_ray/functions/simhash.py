"""64-bit SimHash sketches over CSR shingle hashes (vectorized).

Charikar's SimHash: each shingle hash votes +1/-1 on each of 64 bit
positions; the sketch keeps the sign of the per-position sum.  Hamming
distance between sketches tracks cosine similarity of the shingle sets.

Vectorized: bit-unpack the flat shingle array to [S, 64] votes, reduce
per doc with ``np.add.reduceat``.
"""

from __future__ import annotations

import numpy as np

from dedup_restore_ray.functions.hashing import U64, mix64

_BITS = np.arange(64, dtype=np.uint64)


def simhash_signatures(flat: np.ndarray, offsets: np.ndarray,
                       seg_shingles: int = 16384) -> np.ndarray:
    """[n_docs] uint64 SimHash values.  Empty docs -> 0.

    Cache-blocked like minhash_signatures: the [S, 64] uint8 bit matrix
    is built per doc-aligned segment (~1 MiB) via np.unpackbits, and
    per-doc vote sums come from one add.reduceat.  (unpackbits emits
    MSB-first within each byte — a fixed permutation of bit positions,
    which preserves Hamming distances and determinism.)"""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=U64)
    if len(flat) == 0:
        return out
    lengths = np.diff(offsets)
    ne_rows = np.flatnonzero(lengths > 0)
    if len(ne_rows) == 0:
        return out
    ne_lengths = lengths[ne_rows]
    ne_starts = np.concatenate(([0], np.cumsum(ne_lengths)[:-1]))
    # remix so simhash bits are independent of the minhash input bits;
    # the full-flat working copy lives in the process-local scratch
    # arena (a fresh copy per batch was this kernel's largest
    # allocation — 8 bytes/shingle of first-touch page faults)
    from dedup_restore_ray.functions.hashing import mix64_inplace, scratch
    x = scratch("sh_x", len(flat))
    np.copyto(x, flat, casting="unsafe")
    mix64_inplace(x)
    seg_doc_bounds = [0]
    acc = 0
    for i, l in enumerate(ne_lengths):
        acc += int(l)
        if acc >= seg_shingles:
            seg_doc_bounds.append(i + 1)
            acc = 0
    if seg_doc_bounds[-1] != len(ne_rows):
        seg_doc_bounds.append(len(ne_rows))
    for d0, d1 in zip(seg_doc_bounds[:-1], seg_doc_bounds[1:]):
        s0 = int(ne_starts[d0])
        s1 = int(ne_starts[d1 - 1] + ne_lengths[d1 - 1])
        seg = x[s0:s1]
        bits = np.unpackbits(seg.view(np.uint8).reshape(-1, 8), axis=1)  # [S,64] u8
        local_starts = (ne_starts[d0:d1] - s0).astype(np.int64)
        sums = np.add.reduceat(bits, local_starts, axis=0, dtype=np.int64)
        totals = ne_lengths[d0:d1, None]
        set_bits = (sums * 2 > totals)
        vals = (set_bits.astype(np.uint64) << _BITS[None, :]).sum(
            axis=1, dtype=np.uint64)
        out[ne_rows[d0:d1]] = vals
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR for uint64 arrays."""
    x = np.bitwise_xor(np.asarray(a, U64), np.asarray(b, U64))
    return popcount64(x)


def popcount64(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=U64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    # unpack via byte view — C-speed, no Python per-element loop
    byts = x.view(np.uint8).reshape(*x.shape, 8) if x.ndim else x.view(np.uint8)
    cnt = np.unpackbits(byts.reshape(-1, 8), axis=1).sum(axis=1).reshape(x.shape)
    return cnt.astype(np.int64)


def simhash_block_keys(simhash: np.ndarray, t: int = 3,
                       num_blocks: int = 6) -> np.ndarray:
    """[n, C(num_blocks, num_blocks-t)] uint64 candidate keys with the
    Hamming-ball guarantee AND a collision rate that scales to web
    corpora (Manku, Jain & Sarma, 'Detecting Near-Duplicates for Web
    Crawling', WWW'07): split the 64-bit sketch into ``num_blocks``
    blocks and key on every combination of ``num_blocks - t`` blocks.

    Pigeonhole: <= t flipped bits touch <= t blocks, so some
    (num_blocks - t)-subset of blocks is clean and that combination's
    key matches.  vs the naive (t+1)-band split (16-bit key content at
    t=3), each key here carries ~32 content bits, so RANDOM collisions
    fall from n^2/2^16 to n^2/2^32 per key — the naive form emitted
    7.4M pairs for 480k canonical docs (quadratic, measured); this one
    emits the true near-Hamming pairs plus noise that stays negligible
    into the 10^9-doc range.  For larger corpora raise num_blocks - t
    content width (e.g. num_blocks=5, t=2 -> ~38 bits).
    """
    from itertools import combinations

    sh = np.asarray(simhash, U64)
    n = len(sh)
    widths = [(64 // num_blocks) + (1 if i < 64 % num_blocks else 0)
              for i in range(num_blocks)]
    shifts = np.cumsum([0] + widths[:-1])
    bvals = np.empty((n, num_blocks), dtype=U64)
    for j in range(num_blocks):
        bvals[:, j] = (sh >> np.uint64(shifts[j])) \
            & np.uint64((1 << widths[j]) - 1)
    combos = list(combinations(range(num_blocks), num_blocks - t))
    out = np.empty((n, len(combos)), dtype=U64)
    with np.errstate(over="ignore"):
        for k, combo in enumerate(combos):
            content = np.zeros(n, dtype=U64)
            for j in combo:
                content = (content << np.uint64(widths[j])) | bvals[:, j]
            # mix with the combo index so different combinations never
            # collide in one groupby key space
            out[:, k] = mix64(content
                              + np.uint64(k) * np.uint64(0x9E3779B97F4A7C15))
    return out


def simhash_band_keys(simhash: np.ndarray, num_bands: int = 4) -> np.ndarray:
    """[n, num_bands] uint64 band keys for Hamming-ball candidate
    generation: two 64-bit sketches within Hamming distance
    ``num_bands - 1`` share at least one identical band (pigeonhole).
    Band value is mixed with the band index so different bands never
    collide in a single groupby key space."""
    sh = np.asarray(simhash, U64)
    width = 64 // num_bands
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(sh), num_bands), dtype=U64)
    for bidx in range(num_bands):
        band = (sh >> np.uint64(bidx * width)) & mask
        with np.errstate(over="ignore"):
            out[:, bidx] = mix64(band + np.uint64(bidx) * np.uint64(0x9E3779B97F4A7C15))
    return out
