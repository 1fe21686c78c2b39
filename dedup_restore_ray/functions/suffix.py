"""Per-partition generalized suffix array for exact long-substring dedup.

The north_rule's 'suffix-array substring pass': detects pairs of
documents sharing an exact run of >= min_len characters — the web-text
analogue of the reference's content-defined-chunk exact dedup
(reference: src/chunk.c + src/dedup.c find byte-identical chunks; here
the 'chunk' is any sufficiently long shared character run).

Implementation: prefix-doubling suffix array (O(n log^2 n), fully
numpy-vectorized via np.lexsort), over the concatenation of the
partition's normalized texts separated by per-doc unique sentinels
(>= 0x110000, outside Unicode).  Two suffixes from different docs that
are adjacent in SA order and share a prefix >= min_len witness a
cross-doc match; chaining adjacent witnesses within an SA run yields
edges that connect every doc sharing the run (enough for clustering —
SURVEY §7.1 step 6).

Partitioning assumption (documented per task instructions): matches
*across* partitions are found by the winnowing-fingerprint shuffle path
(functions/fingerprint.py + stages/substring.py), which is global; this
operator is the exact in-partition formulation and the two agree on any
pair sharing >= kgram + window - 1 chars.
"""

from __future__ import annotations

import numpy as np

_SENTINEL_BASE = 0x110000  # beyond max Unicode codepoint


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an int sequence via prefix doubling + lexsort."""
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # initial ranks: dense rank of first character
    _, rank = np.unique(codes, return_inverse=True)
    rank = rank.astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        if n > 1:
            changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank_in_order = np.cumsum(changed)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank_in_order
        sa = order
        if rank[sa[-1]] == n - 1:  # all ranks distinct
            break
        k *= 2
    return sa.astype(np.int64)


def _encode_concat(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate texts with unique sentinels.  Returns (codes:int64,
    doc_of:int64) where doc_of[p] is the doc index at position p (-1 on
    sentinels)."""
    parts = []
    docs = []
    for i, t in enumerate(texts):
        cp = np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        parts.append(cp)
        docs.append(np.full(len(cp), i, dtype=np.int64))
        parts.append(np.array([_SENTINEL_BASE + i], dtype=np.int64))
        docs.append(np.array([-1], dtype=np.int64))
    codes = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    doc_of = np.concatenate(docs) if docs else np.empty(0, dtype=np.int64)
    return codes, doc_of


def substring_pairs(texts: list[str], min_len: int, chunk: int = 65536) -> set[tuple[int, int]]:
    """{(i, j) i<j} doc-index pairs sharing an exact >= min_len-char run.

    Complete over cliques: suffixes sharing a >= min_len prefix form a
    maximal CONSECUTIVE run in the suffix array, so each such run is a
    clique of docs and every in-run doc pair is emitted — adjacent-only
    pairing would drop (A, C) whenever B's suffixes always sit between
    A's and C's (e.g. three exact copies of the same passage).
    """
    from itertools import combinations

    codes, doc_of = _encode_concat(texts)
    n = len(codes)
    if n == 0:
        return set()
    sa = suffix_array(codes)
    # pad so window compares never read past the end; padding values are
    # position-dependent negatives → two different positions can never
    # compare equal inside the padding.
    pad = -np.arange(1, min_len + 1, dtype=np.int64)
    ext = np.concatenate([codes, pad])
    d = doc_of[sa]
    prev_pos = sa[:-1]
    next_pos = sa[1:]
    # adjacent LCP >= min_len, for ALL adjacent suffix pairs (cheap
    # 4-char prefilter, full window compare on survivors only)
    m = n - 1
    ok_adj = np.zeros(m, dtype=bool)
    pre = min(4, min_len)
    offs_pre = np.arange(pre, dtype=np.int64)
    cand_mask = np.zeros(m, dtype=bool)
    pchunk = max(chunk * 16, 1)
    for c0 in range(0, m, pchunk):
        pp = prev_pos[c0 : c0 + pchunk]
        nn = next_pos[c0 : c0 + pchunk]
        cand_mask[c0 : c0 + pchunk] = (
            ext[pp[:, None] + offs_pre[None, :]]
            == ext[nn[:, None] + offs_pre[None, :]]).all(axis=1)
    idx = np.flatnonzero(cand_mask)
    offs = np.arange(min_len, dtype=np.int64)
    for c0 in range(0, len(idx), chunk):
        sel = idx[c0 : c0 + chunk]
        wa = ext[prev_pos[sel][:, None] + offs[None, :]]
        wb = ext[next_pos[sel][:, None] + offs[None, :]]
        ok_adj[sel[(wa == wb).all(axis=1)]] = True
    pairs: set[tuple[int, int]] = set()
    if not ok_adj.any():
        return pairs
    # maximal runs of ok_adj → suffix groups [s, e+1]; all doc pairs
    # within a group share the (>= min_len) group prefix
    edges = np.diff(ok_adj.astype(np.int8))
    starts = np.flatnonzero(edges == 1) + 1
    ends = np.flatnonzero(edges == -1) + 1
    if ok_adj[0]:
        starts = np.concatenate(([0], starts))
    if ok_adj[-1]:
        ends = np.concatenate((ends, [m]))
    for s, e in zip(starts, ends):
        group_docs = np.unique(d[s : e + 1])
        group_docs = group_docs[group_docs >= 0]
        for a, b in combinations(group_docs.tolist(), 2):
            pairs.add((a, b))
    return pairs
