"""Levenshtein (unit-cost edit) distance, numpy-vectorized DP.

The edit-distance near-dup rail: candidate pairs come from PREFIX
BLOCKING (documents sharing their first N characters — the classic
record-linkage blocking key, one 16-byte hash sort at scale), and each
candidate pair is verified with the exact distance.  The DP's row
recurrence is fully vectorized: substitutions/deletions are two
shifted array mins, and the sequential insertion chain collapses via
the ``minimum.accumulate`` over (cur - j) — no per-cell Python.

Matches SQL ``levenshtein()`` (DuckDB) exactly, which is what makes
the pair set oracle-checkable.
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Exact unit-cost edit distance, O(len(a)*len(b)) cells but only
    O(len(a)) vectorized numpy ops."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    av = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    m = len(bv)
    j = np.arange(1, m + 1, dtype=np.int64)
    prev = np.arange(m + 1, dtype=np.int64)
    for i, ca in enumerate(av, start=1):
        sub = prev[:-1] + (bv != ca)           # diagonal (substitution)
        dele = prev[1:] + 1                    # from above (deletion)
        cur = np.minimum(sub, dele)
        # insertion chain cur[j] = min(cur[j], cur[j-1]+1) for the
        # whole row at once: t_j = cur_j - j is non-increasing under
        # the relaxation, so minimum.accumulate closes the chain
        head = np.concatenate((np.array([i], dtype=np.int64), cur))
        t = np.minimum.accumulate(head - np.arange(m + 1))
        prev = t + np.arange(m + 1)
    return int(prev[-1])
