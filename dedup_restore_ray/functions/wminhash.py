"""Weighted MinHash via Improved Consistent Weighted Sampling.

ICWS (Ioffe, ICDM 2010 "Improved Consistent Weighted Sampling") draws,
per permutation, a (token, level) sample whose collision probability
between two weighted multisets equals their WEIGHTED Jaccard
J_w = sum_t min(a_t, b_t) / sum_t max(a_t, b_t) — the multiplicity-
aware similarity the binary-set MinHash rail cannot express (a doc
repeating one boilerplate line 50 times looks very different under
J_w than under set Jaccard).

Per permutation k and token t with weight S > 0 (all randomness is a
DETERMINISTIC function of (token_hash, k), so signatures are
reproducible across workers and runs):

    r    ~ Gamma(2, 1)  = -ln(u1 * u2)
    c    ~ Gamma(2, 1)  = -ln(u3 * u4)
    beta ~ Uniform(0,1)

    t_k  = floor(ln S / r + beta)
    ln y = r * (t_k - beta)
    ln a = ln c - ln y - r

and the sample is (token, t_k) of the ln-a argmin over the doc's
tokens.  Two docs collide on permutation k iff they pick the same
token at the same discretized level — probability J_w exactly.

Vectorized: one pass per permutation over the batch's token CSR
(uniforms from splitmix64 mixes, argmin via minimum.reduceat + a
first-equal-index reduceat), no per-doc Python.

Reference semantics context: the reference engine dedups exact chunks
(src/dedup.c); weighted near-dup is part of the LLM-curation operator
set layered on top (SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np

from dedup_restore_ray.functions.hashing import U64, combine64, mix64

_INV53 = 1.0 / (1 << 53)


def _uniform(h: np.ndarray) -> np.ndarray:
    """uint64 hash -> open-interval (0,1) double (53-bit mantissa)."""
    return ((np.asarray(h, U64) >> np.uint64(11)).astype(np.float64)
            + 0.5) * _INV53


def icws_signatures(tokens: np.ndarray, weights: np.ndarray,
                    doc_offsets: np.ndarray, n_perm: int = 128,
                    seed: int = 42) -> np.ndarray:
    """[n_docs, n_perm] uint64 ICWS sample keys.

    tokens: uint64 token hashes, docs concatenated (CSR flat array);
    weights: positive int64/float64 weights aligned with tokens;
    doc_offsets: int64 [n_docs + 1] CSR offsets.  Empty docs get the
    EMPTY_SIG convention of all-zero rows (zero collides with nothing
    because real samples are splitmix-mixed).
    """
    tokens = np.asarray(tokens, dtype=U64)
    w = np.asarray(weights, dtype=np.float64)
    off = np.asarray(doc_offsets, dtype=np.int64)
    n_docs = len(off) - 1
    out = np.zeros((n_docs, n_perm), dtype=U64)
    n = len(tokens)
    if n == 0 or n_docs == 0:
        return out
    if (w <= 0).any():
        raise ValueError("icws: weights must be positive")
    starts = off[:-1]
    sizes = off[1:] - off[:-1]
    nonempty = sizes > 0
    ln_s = np.log(w)
    idx = np.arange(n, dtype=np.int64)
    base = mix64(tokens ^ mix64(np.uint64(seed)))
    for k in range(n_perm):
        salt = np.uint64(2 * k + 1)
        h1 = combine64(base, salt)
        h2 = mix64(h1)
        h3 = mix64(h2)
        u1, u2 = _uniform(h1), _uniform(mix64(h1 ^ salt))
        u3, u4 = _uniform(h2), _uniform(mix64(h2 ^ salt))
        beta = _uniform(h3)
        r = -np.log(u1 * u2)
        ln_c = np.log(-np.log(u3 * u4))
        t_k = np.floor(ln_s / r + beta)
        ln_a = ln_c - r * (t_k - beta) - r
        m = np.minimum.reduceat(ln_a, starts[nonempty])
        eq = ln_a == np.repeat(m, sizes[nonempty])
        first = np.minimum.reduceat(np.where(eq, idx, n),
                                    starts[nonempty])
        key = combine64(tokens[first],
                        t_k[first].astype(np.int64).view(U64))
        out[nonempty, k] = key
    return out


def weighted_jaccard_legs(ta: np.ndarray, ca: np.ndarray,
                          tb: np.ndarray, cb: np.ndarray
                          ) -> tuple[int, int]:
    """Exact weighted-Jaccard integer legs (sum-min, sum-max) of two
    SORTED (token, count) runs — sorted-merge via searchsorted, the
    pattern functions/jaccard.py measured fastest on this host."""
    if len(ta) == 0 or len(tb) == 0:
        return 0, int(ca.sum()) + int(cb.sum())
    i = np.minimum(np.searchsorted(ta, tb), len(ta) - 1)
    match = ta[i] == tb
    num = int(np.minimum(ca[i[match]], cb[match]).sum())
    # sum(max) over the union = total_a + total_b - sum(min) over the
    # intersection (shared t: max = a + b - min; unshared: own weight)
    den = int(ca.sum()) + int(cb.sum()) - num
    return num, den
