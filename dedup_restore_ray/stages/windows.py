"""Sliding / streaming time-window aggregates.

The reference streams records through a bounded look-ahead window
(src/look_ahead.c:310-443) — the batch analogue for a training-data
pipeline is the per-key sliding time window: for every event, an
aggregate over the same key's events inside the trailing interval
``(ts - window, ts]``.  SQL equivalent: ``... OVER (PARTITION BY key
ORDER BY ts RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``.

Ray-Data formulation: ONE sort on (key, ts) + a per-block numpy
kernel; key groups split across block boundaries take the residual
groupby path, exactly like every sort-based stage here
(stages/groups.py).  The kernel is fully vectorized: each key group's
timestamps are offset by ``seg_id * BIG`` (BIG > ts-range + window) so
a single global ``np.searchsorted`` resolves every row's window start
without crossing group boundaries — no per-group Python.

Tie semantics match SQL RANGE frames: rows with EQUAL ts are peers and
are all inside each other's frame (the window is closed on both ends
after including peers), so results are deterministic under ties.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedup_restore_ray.stages.groups import group_bounds, sorted_split


def _ts_int64(col: pa.ChunkedArray, window_seconds: int
              ) -> tuple[np.ndarray, int]:
    """(int64 timestamps, window in the same unit)."""
    t = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    typ = t.type
    per_sec = 1
    if pa.types.is_timestamp(typ):
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[typ.unit]
    ts = np.asarray(pc.cast(t, pa.int64()))
    return ts, window_seconds * per_sec


def sliding_window_count(ds: "ray.data.Dataset", key_col: str,
                         ts_col: str, window_seconds: int,
                         out_col: str = "window_count",
                         carry_cols: list[str] | None = None
                         ) -> "ray.data.Dataset":
    """Per-row trailing-window count: for each row, the number of rows
    with the same ``key_col`` and ``ts`` within ``window_seconds``
    before (inclusive, peers included — SQL RANGE frame semantics).

    Output: carry_cols (default: key, ts) + ``out_col``.
    """
    carry = carry_cols or [key_col, ts_col]

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(c, b.schema.field(c).type) for c in carry]
        out_schema = pa.schema(fields + [(out_col, pa.int64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        ts, w = _ts_int64(b.column(ts_col), window_seconds)
        ts = ts - ts.min()
        big = np.int64(ts.max() + w + 2)
        seg = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        adj = ts + seg * big
        lo = np.searchsorted(adj, adj - w, side="left")
        hi = np.searchsorted(adj, adj, side="right")  # peers included
        cols = {c: b.column(c) for c in carry}
        cols[out_col] = pa.array((hi - lo).astype(np.int64))
        return pa.table(cols)

    interior, edge = sorted_split(ds, [key_col, ts_col], [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(key_col, "ascending"), (ts_col, "ascending")])),
                batch_format="pyarrow")))


def sliding_window_sum(ds: "ray.data.Dataset", key_col: str,
                       ts_col: str, value_col: str, window_seconds: int,
                       out_col: str = "window_sum",
                       carry_cols: list[str] | None = None
                       ) -> "ray.data.Dataset":
    """Trailing-window SUM of ``value_col`` per key (RANGE frame
    semantics, peers included): prefix-sum per block + the same
    offset-searchsorted window bounds as sliding_window_count."""
    carry = carry_cols or [key_col, ts_col]

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(c, b.schema.field(c).type) for c in carry]
        out_schema = pa.schema(fields + [(out_col, pa.float64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        ts, w = _ts_int64(b.column(ts_col), window_seconds)
        ts = ts - ts.min()
        big = np.int64(ts.max() + w + 2)
        seg = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        adj = ts + seg * big
        lo = np.searchsorted(adj, adj - w, side="left")
        hi = np.searchsorted(adj, adj, side="right")
        vals = np.asarray(pc.cast(b.column(value_col).combine_chunks(),
                                  pa.float64()))
        csum = np.zeros(n + 1, np.float64)
        np.cumsum(vals, out=csum[1:])
        cols = {c: b.column(c) for c in carry}
        cols[out_col] = pa.array(csum[hi] - csum[lo])
        return pa.table(cols)

    interior, edge = sorted_split(ds, [key_col, ts_col], [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(key_col, "ascending"), (ts_col, "ascending")])),
                batch_format="pyarrow")))
