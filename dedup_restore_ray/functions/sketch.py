"""Distinct-count sketches (KMV / bottom-k).

KMV (k-minimum-values) estimates the number of distinct elements from
the k smallest hash values: with the k-th smallest normalized hash
h_(k) in (0,1), est = (k-1) / h_(k); when fewer than k distinct
values exist the sketch IS the exact distinct set.  Deterministic
given the hash function, which makes it oracle-checkable bit-for-bit:
the hash here is DuckDB's ``md5_number_lower`` (little-endian uint64
of md5-digest bytes 8..16), so the same estimate is expressible in
SQL (see queries.py `distinct_users_kmv`).

Scale shape: each block contributes at most k candidate hashes after
an in-block distinct (a per-batch combiner, reference L3 write-cache
analogue); the global merge handles <= k * n_blocks tiny rows.
"""

from __future__ import annotations

import hashlib

import numpy as np

KMV_HASH_DENOM = float(2 ** 64)


def kmv_hash(values) -> np.ndarray:
    """uint64 hashes matching DuckDB md5_number_lower(CAST(v AS
    VARCHAR)): little-endian uint64 of md5 bytes 8..16 of str(v)."""
    md5 = hashlib.md5
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = md5(str(v).encode("utf-8")).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return out


def kmv_block_candidates(values, k: int) -> np.ndarray:
    """k smallest DISTINCT hashes of a block's values (sorted)."""
    hv = np.unique(kmv_hash(values))          # unique() sorts
    return hv[:k]


def kmv_estimate(candidates: np.ndarray, k: int) -> float:
    """Merge candidate arrays (concatenated) -> distinct-count
    estimate.  Exact when fewer than k distinct hashes exist."""
    hv = np.unique(np.asarray(candidates, dtype=np.uint64))
    if len(hv) < k:
        return float(len(hv))
    kth = float(hv[k - 1])
    return (k - 1) / (kth / KMV_HASH_DENOM)


def sample_quantile_candidates(ids, values, k: int):
    """Per-block candidates for the bottom-k row-sample quantile
    sketch: the k rows with the smallest (kmv_hash(id), id).  The
    hash order defines a deterministic uniform row sample, so the
    sketch is mergeable (bottom-k of a concat of bottom-ks == global
    bottom-k) and DuckDB-reproducible (same md5 rank)."""
    ids = np.asarray(ids)
    hv = kmv_hash(ids.tolist())
    order = np.lexsort((ids, hv))[:k]
    return hv[order], ids[order], np.asarray(values)[order]


def sample_quantile_estimate(hv, ids, values, k: int,
                             qs) -> tuple[list[float], int]:
    """Merge concatenated candidates into the global bottom-k sample
    and return ``quantile_cont``-interpolated quantiles over it (the
    same weighted form as stages/groups.grouped_quantile — bit-exact
    vs DuckDB on the identical sample).  Rank error vs the exact
    corpus quantile is O(1/sqrt(k)) whp — the 100-TB path: per-block
    state is k rows, the driver merges k rows per block, no value
    sort of the corpus."""
    hv = np.asarray(hv, dtype=np.uint64)
    ids = np.asarray(ids)
    order = np.lexsort((ids, hv))[:k]
    v = np.sort(np.asarray(values, dtype=np.float64)[order])
    n = len(v)
    out = []
    for q in qs:
        rn = (n - 1) * float(q)
        frn, crn = int(np.floor(rn)), int(np.ceil(rn))
        out.append(float(v[frn]) if frn == crn
                   else float(v[frn] * (crn - rn) + v[crn] * (rn - frn)))
    return out, n
