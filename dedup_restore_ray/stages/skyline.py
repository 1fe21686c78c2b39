"""Distributed 2-D skyline (Pareto frontier) operator.

A row survives iff no other row DOMINATES it: dominator >= on the
maximized column and <= on the minimized column, with at least one
strict inequality.  Ties (identical value pairs) never dominate each
other, so duplicate optimal points are all kept — matching the SQL
``NOT EXISTS (dominating row)`` semantics exactly.

Distribution: the skyline is a *bounded-idempotent* reduction —
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` (dominance is
transitive, and any dominator eliminated locally is itself dominated
by a local survivor).  So: one vectorized local-skyline kernel per
block, then the same kernel once over the union of block skylines.
For n random points the 2-D skyline has expected size O(log n), so
the final pass is tiny; the kernel itself is O(n log n) numpy (one
lexsort + grouped prefix-max), no Python per row.

Scale contract: the FINAL candidate set (union of per-block skylines)
is assumed to fit one block — true for any real distribution (it is
at most blocks x per-block skyline size).  A pathological total
anti-chain (every row on the frontier) degrades to the full data in
one block; callers wanting that case should pre-partition by the
minimized column's range and concatenate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from dedup_restore_ray.stages.groups import flatten_blocks


def _skyline_mask(maxv: np.ndarray, minv: np.ndarray) -> np.ndarray:
    """bool mask of Pareto-optimal rows (maximize maxv, minimize
    minv).  Vectorized sweep: sort by (minv asc, maxv desc); within an
    equal-minv group only rows tying the group max of maxv survive the
    group; across groups a row survives iff its maxv strictly exceeds
    the running max over all strictly-smaller-minv groups."""
    n = len(maxv)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-maxv, minv))
    ms, mx = minv[order], maxv[order]
    group_start = np.ones(n, dtype=bool)
    group_start[1:] = ms[1:] != ms[:-1]
    starts = np.flatnonzero(group_start)
    gmax = mx[starts]                      # maxv desc within group
    run = np.maximum.accumulate(gmax)
    prev = np.concatenate(([np.iinfo(np.int64).min], run[:-1]))
    kept_group = gmax > prev
    gid = np.cumsum(group_start) - 1
    kept_sorted = kept_group[gid] & (mx == gmax[gid])
    mask = np.zeros(n, dtype=bool)
    mask[order] = kept_sorted
    return mask


def skyline_2d(ds: "ray.data.Dataset", max_col: str,
               min_col: str) -> "ray.data.Dataset":
    """Pareto frontier of ``ds`` maximizing ``max_col`` and minimizing
    ``min_col`` (both int64-comparable, non-null).  All columns ride
    through; duplicate frontier points are kept."""

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        mask = _skyline_mask(
            np.asarray(b.column(max_col), dtype=np.int64),
            np.asarray(b.column(min_col), dtype=np.int64))
        return b.filter(pa.array(mask))

    cands = ds.map_batches(local, batch_format="pyarrow",
                           batch_size=None)
    return flatten_blocks(cands, width=1).map_batches(
        local, batch_format="pyarrow", batch_size=None)
