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
    perm_chunk: int = 16,
    seg_shingles: int = 16384,
    use_scratch: bool = False,
) -> np.ndarray:
    """[n_docs, num_perm] uint64 signature matrix from CSR shingles.

    Docs with zero shingles get EMPTY_SIG in every slot (they are never
    considered near-duplicates of anything by LSH; exact dedup handles
    empty docs via the content hash path).

    Cache-blocked: work proceeds over doc-aligned segments of ~
    ``seg_shingles`` shingles x ``perm_chunk`` permutations so the
    [S, P] temporary stays ~2 MiB (LLC-resident).  Large temporaries
    make the kernel memory-bandwidth-bound and destroy multi-worker
    scaling on shared hosts.  The permuted-hash temporary always comes
    from the process-local scratch arena (faults once per worker).

    ``use_scratch=True`` additionally sources the RESULT matrix from
    the arena — a VIEW valid only until the next use_scratch call;
    for callers that fold the matrix into bucket keys and discard it
    (the flagship), the ~1 KiB/doc result was the stage's largest
    remaining fresh-page allocation.
    """
    from dedup_restore_ray.functions.hashing import scratch

    n_docs = len(offsets) - 1
    num_perm = len(a)
    if use_scratch:
        sig = scratch("mh_sig", n_docs * num_perm).reshape(n_docs, num_perm)
        sig.fill(EMPTY_SIG)
    else:
        sig = np.full((n_docs, num_perm), EMPTY_SIG, dtype=U64)
    if len(flat) == 0:
        return sig
    lengths = np.diff(offsets)
    nonempty = lengths > 0
    ne_rows = np.flatnonzero(nonempty)
    if len(ne_rows) == 0:
        return sig
    ne_lengths = lengths[ne_rows]
    ne_starts = np.concatenate(([0], np.cumsum(ne_lengths)[:-1]))
    # doc-aligned segment boundaries (in compacted doc index space)
    seg_doc_bounds = [0]
    acc = 0
    for i, l in enumerate(ne_lengths):
        acc += int(l)
        if acc >= seg_shingles:
            seg_doc_bounds.append(i + 1)
            acc = 0
    if seg_doc_bounds[-1] != len(ne_rows):
        seg_doc_bounds.append(len(ne_rows))
    with np.errstate(over="ignore"):
        for d0, d1 in zip(seg_doc_bounds[:-1], seg_doc_bounds[1:]):
            s0 = int(ne_starts[d0])
            s1 = int(ne_starts[d1 - 1] + ne_lengths[d1 - 1])
            x = flat[s0:s1]
            local_starts = (ne_starts[d0:d1] - s0).astype(np.int64)
            rows = ne_rows[d0:d1]
            for p0 in range(0, num_perm, perm_chunk):
                p1 = min(p0 + perm_chunk, num_perm)
                # ~2 MiB: above the malloc mmap threshold, so a fresh
                # array would mmap+fault+munmap every iteration.
                # PERM-MAJOR [P, S] layout: the reduceat then reduces
                # along contiguous memory (measured 3.7x faster than
                # the doc-major [S, P] column-strided form).
                y = scratch("mh_y", (p1 - p0) * len(x)) \
                    .reshape(p1 - p0, len(x))
                np.multiply(a[p0:p1, None], x[None, :], out=y)
                np.add(y, b[p0:p1, None], out=y)
                mins = np.minimum.reduceat(y, local_starts, axis=1)
                sig[rows, p0:p1] = mins.T
    return sig


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing signature slots — unbiased Jaccard estimate."""
    return float(np.mean(sig_a == sig_b))


def oph_signatures(
    flat: np.ndarray,
    offsets: np.ndarray,
    num_perm: int = 128,
    use_scratch: bool = False,
) -> np.ndarray:
    """One-Permutation Hashing MinHash with rotation densification —
    the [n_docs, num_perm] signature in ONE pass over the shingle
    stream instead of ``num_perm`` permuted passes (Li, Owen & Zhang,
    NIPS 2012; densification per Shrivastava & Li, ICML 2014: an empty
    bin borrows the value of the nearest non-empty bin to its right,
    circularly).  Same LSH banding / estimator contract as
    ``minhash_signatures`` (P(slot match) ~= Jaccard) at ~1/num_perm
    of the hashing traffic — the scale path for the signature stage's
    measured memory-bandwidth ceiling.

    Exploits the CSR contract: per-doc shingles are SORTED unique, so
    ``bin = shingle >> (64 - log2 num_perm)`` is non-decreasing within
    a doc and (doc, bin) runs are contiguous in the flat stream — bin
    minima come from ONE ``np.minimum.reduceat`` over run starts, no
    [S, P] temporary at all.  Bin values are ``mix64(shingle)`` so the
    value order is independent of the bin-selecting top bits.

    NOT interchangeable with minhash_signatures output (different slot
    values) — choose per pipeline via ``PipelineConfig.minhash_mode``.
    """
    from dedup_restore_ray.functions.hashing import mix64, scratch

    if num_perm & (num_perm - 1):
        raise ValueError(f"num_perm must be a power of two, got {num_perm}")
    shift = np.uint64(64 - int(num_perm).bit_length() + 1)
    n_docs = len(offsets) - 1
    if use_scratch:
        sig = scratch("oph_sig", n_docs * num_perm).reshape(n_docs, num_perm)
        sig.fill(EMPTY_SIG)
    else:
        sig = np.full((n_docs, num_perm), EMPTY_SIG, dtype=U64)
    if len(flat) == 0 or n_docs == 0:
        return sig
    lengths = np.diff(offsets)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    bins = (flat >> shift).astype(np.int64)
    key = doc_idx * num_perm + bins            # non-decreasing
    run_start = np.ones(len(key), dtype=bool)
    run_start[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(run_start)
    vals = mix64(flat)
    mins = np.minimum.reduceat(vals, starts)
    sig.reshape(-1)[key[starts]] = mins

    # rotation densification: rows with >= 1 empty and >= 1 filled bin
    empty = sig == EMPTY_SIG
    n_empty = empty.sum(axis=1)
    rows = np.flatnonzero((n_empty > 0) & (n_empty < num_perm))
    if len(rows):
        sub = sig[rows]
        cols = np.arange(num_perm, dtype=np.int64)
        ne = np.where(sub != EMPTY_SIG, cols, np.int64(num_perm * 2))
        # nearest non-empty at-or-right of j: suffix minimum
        nxt = np.minimum.accumulate(ne[:, ::-1], axis=1)[:, ::-1]
        wrapped = np.where(nxt < num_perm * 2, nxt,
                           nxt[:, :1])  # col 0 suffix-min = first overall
        sig[rows] = np.take_along_axis(sub, wrapped, axis=1)
    return sig
