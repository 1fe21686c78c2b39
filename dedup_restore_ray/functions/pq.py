"""Product quantization (PQ) for compressed similarity scan.

Jegou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split the d-dim vector into ``m`` subspaces, k-means
each subspace to ``ksub`` centroids, store each vector as m uint8
codes.  Asymmetric distance computation (ADC) scores a query against
codes via one [m, ksub] lookup table of query-subvector inner
products — no decompression.

Scale role: at 64-dim float32 a vector is 256 B; its PQ code (m=8) is
8 B.  A corpus scan over codes touches 32x less memory, and the exact
vectors are read only for the short-listed candidates (re-rank), which
restores exact top-k quality when the shortlist is generous.  All
kernels are batch-vectorized numpy; training is deterministic
(seeded), so results are reproducible across runs and layouts.
"""

from __future__ import annotations

import numpy as np


def _kmeans_l2(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic Lloyd k-means under Euclidean distance.
    Empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    n = len(x)
    idx = rng.choice(n, size=min(k, n), replace=False)
    cent = x[np.sort(idx)].astype(np.float64).copy()
    for _ in range(iters):
        # argmin ||x - c||^2 = argmax (x.c - ||c||^2/2)
        scores = x @ cent.T - 0.5 * np.einsum("kd,kd->k", cent, cent)
        assign = np.argmax(scores, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=len(cent)).astype(np.float64)
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cent.astype(np.float32)


def pq_train(x: np.ndarray, m: int = 8, ksub: int = 256,
             iters: int = 15, seed: int = 42) -> np.ndarray:
    """[n, d] training sample -> [m, ksub, d//m] codebooks.
    d must be divisible by m."""
    x = np.asarray(x, dtype=np.float32)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if ksub > 256:
        raise ValueError(f"ksub={ksub} > 256: codes are uint8")
    ds = d // m
    ksub = min(ksub, n)
    books = np.empty((m, ksub, ds), dtype=np.float32)
    for j in range(m):
        books[j] = _kmeans_l2(x[:, j * ds:(j + 1) * ds], ksub,
                              iters, seed + j)
    return books


def pq_encode(x: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """[n, d] vectors -> [n, m] uint8 codes (nearest centroid per
    subspace, Euclidean)."""
    x = np.asarray(x, dtype=np.float32)
    m, ksub, ds = codebooks.shape
    if ksub > 256:
        raise ValueError(f"ksub={ksub} > 256: codes are uint8")
    codes = np.empty((len(x), m), dtype=np.uint8)
    for j in range(m):
        sub = x[:, j * ds:(j + 1) * ds]
        cb = codebooks[j]
        scores = sub @ cb.T - 0.5 * np.einsum("kd,kd->k", cb, cb)
        codes[:, j] = np.argmax(scores, axis=1).astype(np.uint8)
    return codes


def pq_decode(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """[n, m] codes -> [n, d] reconstructed vectors."""
    m, ksub, ds = codebooks.shape
    return np.concatenate(
        [codebooks[j][codes[:, j]] for j in range(m)],
        axis=1)


def pq_adc_scores(queries: np.ndarray, codes: np.ndarray,
                  codebooks: np.ndarray) -> np.ndarray:
    """Inner-product ADC: [nq, d] queries x [n, m] codes ->
    [nq, n] approximate dot-product scores.  One einsum builds the
    [nq, m, ksub] LUT; the scan is m fancy-indexed adds (no float
    decompression of the corpus)."""
    queries = np.asarray(queries, dtype=np.float32)
    m, ksub, ds = codebooks.shape
    nq = len(queries)
    luts = np.einsum("qjd,jkd->qjk",
                     queries.reshape(nq, m, ds), codebooks)
    scores = np.zeros((nq, len(codes)), dtype=np.float32)
    for j in range(m):
        scores += luts[:, j, codes[:, j]]
    return scores
