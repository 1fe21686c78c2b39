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

from dedup_restore_ray.stages.groups import (group_bounds,
                                             presort_coalesce,
                                             sorted_split)


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


def lag_lead(ds: "ray.data.Dataset", key_col: str,
             order_cols: list[str], value_col: str,
             lag_col: str = "lag_value", lead_col: str = "lead_value",
             carry_cols: list[str] | None = None) -> "ray.data.Dataset":
    """Per-key LAG/LEAD window navigation (``lag(value) OVER
    (PARTITION BY key ORDER BY ...)``) — an operator Ray Data has no
    window form for.  One sort on (key, order_cols...) + a per-block
    shift: interior blocks hold whole key groups, so the previous/next
    row is simply the adjacent row, with group-first rows nulled for
    lag and group-last rows nulled for lead (one boolean mask each —
    no per-group Python).  Block-edge groups take the residual pass
    with the same kernel, as in every sort stage here.

    ``order_cols`` should end in a unique tiebreak column so the
    result is deterministic under order-key ties (the same requirement
    SQL window frames have).

    Output: carry_cols (default: key + order_cols) + lag_col +
    lead_col; boundary rows carry null."""
    carry = carry_cols or [key_col, *order_cols]
    sort_keys = [key_col, *order_cols]

    def kernel(b: pa.Table) -> pa.Table:
        vtype = b.schema.field(value_col).type
        fields = [(c, b.schema.field(c).type) for c in carry]
        out_schema = pa.schema(fields + [(lag_col, vtype),
                                         (lead_col, vtype)])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        vals = b.column(value_col).combine_chunks()
        idx = np.arange(n, dtype=np.int64)
        is_first = np.zeros(n, dtype=bool)
        is_first[starts] = True
        is_last = np.zeros(n, dtype=bool)
        is_last[ends - 1] = True
        lagv = pc.if_else(pa.array(is_first), pa.scalar(None, vtype),
                          vals.take(pa.array(np.maximum(idx - 1, 0))))
        leadv = pc.if_else(pa.array(is_last), pa.scalar(None, vtype),
                           vals.take(pa.array(np.minimum(idx + 1, n - 1))))
        cols = {c: b.column(c) for c in carry}
        cols[lag_col] = lagv
        cols[lead_col] = leadv
        return pa.table(cols)

    interior, edge = sorted_split(ds, sort_keys, [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(c, "ascending") for c in sort_keys])),
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


def rows_frame_sum(ds: "ray.data.Dataset", key_col: str,
                   order_cols: list[str], value_col: str, k: int,
                   out_col: str = "rows_sum",
                   carry_cols: list[str] | None = None
                   ) -> "ray.data.Dataset":
    """Per-key moving SUM over the last ``k`` rows (``sum(v) OVER
    (PARTITION BY key ORDER BY ... ROWS BETWEEN k-1 PRECEDING AND
    CURRENT ROW)``) — the row-count frame, distinct from the
    time-interval RANGE frame of ``sliding_window_sum``.  One sort on
    (key, order_cols...) + a per-block kernel: block-wide int64 prefix
    sum, each row's frame start is ``max(group_start, i - k + 1)`` (two
    vectorized ops).  ``order_cols`` must end in a unique tiebreak
    (ROWS frames are order-sensitive); ``value_col`` must be
    integer-typed for bit-exact SQL parity."""
    carry = carry_cols or [key_col, *order_cols]
    sort_keys = [key_col, *order_cols]

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(c, b.schema.field(c).type) for c in carry]
        out_schema = pa.schema(fields + [(out_col, pa.int64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        sizes = ends - starts
        vals = np.asarray(b.column(value_col), dtype=np.int64)
        cs = np.zeros(n + 1, np.int64)
        np.cumsum(vals, out=cs[1:])
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(np.repeat(starts, sizes), idx - (k - 1))
        cols = {c: b.column(c) for c in carry}
        cols[out_col] = pa.array(cs[idx + 1] - cs[lo], pa.int64())
        return pa.table(cols)

    interior, edge = sorted_split(ds, sort_keys, [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(c, "ascending") for c in sort_keys])),
                batch_format="pyarrow")))


def path_ngrams(ds: "ray.data.Dataset", key_col: str,
                order_cols: list[str], value_col: str, n: int = 3,
                out_col: str = "path", sep: str = ">",
                carry_key: bool = False) -> "ray.data.Dataset":
    """Consecutive n-grams of ``value_col`` along each key's ordered
    stream (path/funnel mining: 'view>click>purchase').  One sort on
    (key, order_cols...); inside a block every position whose n-gram
    stays within its own group emits one joined string
    (``pc.binary_join_element_wise`` over n shifted takes — no per-row
    Python).  Block-split keys take the residual pass.  Downstream a
    ``grouped_aggregate`` count gives path frequencies; only the gram
    strings (and optionally the key) shuffle out of this stage."""
    sort_keys = [key_col, *order_cols]

    def kernel(b: pa.Table) -> pa.Table:
        fields = ([(key_col, b.schema.field(key_col).type)]
                  if carry_key else [])
        out_schema = pa.schema(fields + [(out_col, pa.string())])
        nrows = b.num_rows
        if nrows == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        sizes = ends - starts
        vals = b.column(value_col).combine_chunks()
        idx = np.arange(nrows, dtype=np.int64)
        sel = idx[idx + n <= np.repeat(ends, sizes)]
        if len(sel) == 0:
            return out_schema.empty_table()
        parts = [vals.take(pa.array(sel + j)) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, sep)
        cols = {}
        if carry_key:
            cols[key_col] = b.column(key_col).take(pa.array(sel))
        cols[out_col] = grams
        return pa.table(cols)

    interior, edge = sorted_split(ds, sort_keys, [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(c, "ascending") for c in sort_keys])),
                batch_format="pyarrow")))


def partition_totals(ds: "ray.data.Dataset", keys: list[str],
                     value_col: str, sum_col: str = "part_sum",
                     count_col: str = "part_n",
                     carry_cols: list[str] | None = None
                     ) -> "ray.data.Dataset":
    """Attach each row's whole-partition SUM + COUNT (``sum(v) OVER
    (PARTITION BY keys)`` — the unbounded partition frame).  The
    correlated-subquery shape (compare a row against its own group's
    aggregate, TPC-H Q17) collapses into ONE sort + a reduceat kernel
    + np.repeat back onto the rows — no separate aggregate + scatter
    round trip.  ``value_col`` must be integer-typed for bit-exact SQL
    parity."""
    if carry_cols is None:
        schema = ds.schema()        # None for an EMPTY dataset
        carry = (list(schema.names) if schema is not None
                 else [*keys, value_col])
    else:
        carry = carry_cols

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(c, b.schema.field(c).type) for c in carry]
        out_schema = pa.schema(fields + [(sum_col, pa.int64()),
                                         (count_col, pa.int64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, keys)
        sizes = ends - starts
        vals = np.asarray(b.column(value_col), dtype=np.int64)
        cs = np.zeros(n + 1, np.int64)
        np.cumsum(vals, out=cs[1:])
        cols = {c: b.column(c) for c in carry}
        cols[sum_col] = pa.array(np.repeat(cs[ends] - cs[starts], sizes))
        cols[count_col] = pa.array(np.repeat(sizes.astype(np.int64),
                                             sizes))
        return pa.table(cols)

    interior, edge = sorted_split(ds, keys)
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(keys).map_groups(
                lambda g: kernel(g.sort_by(
                    [(c, "ascending") for c in keys])),
                batch_format="pyarrow")))


def interval_count_join(ds: "ray.data.Dataset", key_col: str,
                        ts_col: str, probe_col: str, build_col: str,
                        window_seconds: int,
                        out_col: str = "n_in_window",
                        carry_cols: list[str] | None = None
                        ) -> "ray.data.Dataset":
    """Stream-stream interval join (count form): for every PROBE row,
    the number of BUILD rows of the same key whose timestamp falls in
    the inclusive trailing window ``[ts - window, ts]`` — the
    stream-stream bounded join, distinct from asof (nearest single
    row) and sliding_window_* (same-stream self-aggregate).

    ``probe_col`` / ``build_col`` are precomputed int8/bool marker
    columns (a row may be both, e.g. self-joins across event types).
    Both streams co-locate through ONE (key, ts) sort; inside a block
    the build side's timestamps (offset per group so windows never
    cross keys — the sliding_window trick) answer every probe row with
    two ``np.searchsorted`` calls.  Block-split keys take the residual
    pass."""
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
        probe = np.asarray(b.column(probe_col)).astype(bool)
        build = np.asarray(b.column(build_col)).astype(bool)
        if not probe.any():
            return out_schema.empty_table()
        b_adj = adj[build]
        p_adj = adj[probe]
        cnt = (np.searchsorted(b_adj, p_adj, side="right")
               - np.searchsorted(b_adj, p_adj - w, side="left"))
        sel = pa.array(np.flatnonzero(probe))
        cols = {c: b.column(c).take(sel) for c in carry}
        cols[out_col] = pa.array(cnt.astype(np.int64), pa.int64())
        return pa.table(cols)

    interior, edge = sorted_split(ds, [key_col, ts_col], [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(key_col, "ascending"), (ts_col, "ascending")])),
                batch_format="pyarrow")))


def gaps_islands(ds: "ray.data.Dataset", key_col: str, seq_col: str,
                 islands_col: str = "n_islands",
                 longest_col: str = "longest_run"
                 ) -> "ray.data.Dataset":
    """Per-key gaps-and-islands: count maximal runs of CONSECUTIVE
    ``seq_col`` values (int64, assumed distinct per key — pre-distinct
    the input) and the longest run's length.  The SQL classic
    (``seq - row_number()`` island ids + two aggregates) collapses to
    one sort + a per-block kernel: island starts are group starts or
    rows where ``seq != prev_seq + 1``; run lengths come from one diff
    over start indices; per-group counts/maxima via reduceat (runs
    can't span groups, so block-local reduction is exact).  Block-split
    keys take the residual pass."""

    def kernel(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            (key_col, b.schema.field(key_col).type),
            (islands_col, pa.int64()), (longest_col, pa.int64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        seq = np.asarray(b.column(seq_col), dtype=np.int64)
        new_isl = np.ones(n, dtype=bool)
        new_isl[1:] = seq[1:] != seq[:-1] + 1
        new_isl[starts] = True
        s_idx = np.flatnonzero(new_isl)
        run_len = np.diff(np.append(s_idx, n))
        # first run of each group: runs are ordered by group
        first_run = np.searchsorted(s_idx, starts, side="left")
        n_isl = np.add.reduceat(new_isl.astype(np.int64), starts)
        longest = np.maximum.reduceat(run_len, first_run)
        return pa.table({
            key_col: b.column(key_col).take(pa.array(starts)),
            islands_col: pa.array(n_isl, pa.int64()),
            longest_col: pa.array(longest, pa.int64())})

    interior, edge = sorted_split(ds, [key_col, seq_col], [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(key_col, "ascending"), (seq_col, "ascending")])),
                batch_format="pyarrow")))


def rank_windows(ds: "ray.data.Dataset", key_col: str,
                 value_col: str, tiebreak_col: str, n_tiles: int = 4,
                 rank_col: str = "rnk", dense_col: str = "drnk",
                 tile_col: str = "tile",
                 carry_cols: list[str] | None = None
                 ) -> "ray.data.Dataset":
    """Per-key RANK / DENSE_RANK / NTILE — SQL::

        rank()       OVER (PARTITION BY key ORDER BY value)
        dense_rank() OVER (PARTITION BY key ORDER BY value)
        ntile(n)     OVER (PARTITION BY key ORDER BY value, tiebreak)

    One sort on (key, value, tiebreak) + a per-block kernel: ranks
    come from run starts of equal values (``maximum.accumulate`` over
    run-start indices — no per-group Python), dense ranks from a
    cumulative new-value count re-based at group starts, and ntile
    from the SQL bucket rule (first ``size % n`` buckets get one extra
    row).  rank/dense_rank are functions of the value alone so they
    are deterministic under value ties; ntile requires the unique
    ``tiebreak_col`` for determinism (SQL's own requirement).
    Block-split keys take the residual pass with the same kernel."""
    carry = carry_cols or [key_col, tiebreak_col]
    sort_keys = [key_col, value_col, tiebreak_col]

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(c, b.schema.field(c).type) for c in carry]
        out_schema = pa.schema(fields + [(rank_col, pa.int64()),
                                         (dense_col, pa.int64()),
                                         (tile_col, pa.int64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        sizes = ends - starts
        idx = np.arange(n, dtype=np.int64)
        gstart = np.repeat(starts, sizes)
        rn = idx - gstart                       # 0-based row number
        vals = b.column(value_col).combine_chunks()
        new_val = np.ones(n, dtype=bool)
        if n > 1:
            # null-safe: two NULLs are ordering PEERS (same rank), a
            # NULL next to a non-null is a new value — matches SQL
            # rank()/dense_rank() semantics over nullable columns.
            a, bb = vals.slice(1), vals.slice(0, n - 1)
            neq = pc.not_equal(a, bb).fill_null(False)
            null_flip = pc.xor(pc.is_null(a), pc.is_null(bb))
            new_val[1:] = np.asarray(neq) | np.asarray(null_flip)
        new_val[starts] = True
        run_start = np.maximum.accumulate(np.where(new_val, idx, -1))
        rnk = run_start - gstart + 1
        csum = np.cumsum(new_val)
        drnk = csum - np.repeat(csum[starts], sizes) + 1
        size = np.repeat(sizes, sizes)
        base, rem = size // n_tiles, size % n_tiles
        cut = rem * (base + 1)                  # rows in the fat tiles
        in_fat = rn < cut
        # base can be 0 (group smaller than n_tiles): every tile has
        # one row and all rows are "fat", so the slim branch divisor
        # never sees base == 0 on selected rows.
        tile = np.where(in_fat, rn // np.maximum(base + 1, 1),
                        rem + (rn - cut) // np.maximum(base, 1)) + 1
        cols = {c: b.column(c) for c in carry}
        cols[rank_col] = pa.array(rnk, pa.int64())
        cols[dense_col] = pa.array(drnk, pa.int64())
        cols[tile_col] = pa.array(tile.astype(np.int64), pa.int64())
        return pa.table(cols)

    interior, edge = sorted_split(ds, sort_keys, [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(c, "ascending") for c in sort_keys])),
                batch_format="pyarrow")))


def global_rank(ds: "ray.data.Dataset", order_cols: list[str],
                rank_col: str = "rn", n_tiles: int | None = None,
                tile_col: str = "tile",
                carry_cols: list[str] | None = None
                ) -> "ray.data.Dataset":
    """GLOBAL ``row_number() OVER (ORDER BY ...)`` (no partition) —
    the window Ray Data cannot express, and the per-key machinery
    degenerates on (a constant key routes the WHOLE dataset through
    one residual task).  After the sort is materialized, one light
    pass collects each block's (first-row key, row count) — n_blocks
    tiny rows on the driver — cumulative counts in key order give
    every block its global offset, and the rank kernel finds its own
    offset by its block's first row.  ``order_cols`` must end in a
    unique tiebreak so block first-keys are distinct (SQL's own
    determinism requirement).  With ``n_tiles``, also emits the SQL
    NTILE bucket (first ``total % n`` buckets one row larger)."""
    carry = carry_cols or list(order_cols)
    srt = presort_coalesce(ds).sort(order_cols).materialize()

    def head(b: pa.Table) -> pa.Table:
        t = b.select(order_cols)
        if b.num_rows == 0:
            return t.slice(0, 0).append_column(
                "__cnt", pa.array([], pa.int64()))
        return t.slice(0, 1).append_column(
            "__cnt", pa.array([b.num_rows], pa.int64()))

    heads = [(tuple(r[c] for c in order_cols), r["__cnt"])
             for r in srt.map_batches(head, batch_format="pyarrow",
                                      batch_size=None).take_all()]
    for key, _ in heads:
        if any(v is None or v != v for v in key):
            raise ValueError(
                "global_rank order_cols must be non-null, non-NaN: "
                f"block head {key!r} — NULL/NaN break the Python-side "
                "block-offset ordering (and violate the unique-tiebreak "
                "contract)")
    heads.sort(key=lambda h: h[0])
    total_n = sum(c for _, c in heads)
    offsets, acc = {}, 0
    for key, cnt in heads:
        offsets[key] = acc
        acc += cnt
    import ray as _ray
    off_ref = _ray.put(offsets)

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(c, b.schema.field(c).type) for c in carry]
        out_fields = fields + [(rank_col, pa.int64())]
        if n_tiles:
            out_fields.append((tile_col, pa.int64()))
        out_schema = pa.schema(out_fields)
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        omap = _ray.get(off_ref)
        first = tuple(b.column(c)[0].as_py() for c in order_cols)
        off = omap[first]
        rn = off + np.arange(n, dtype=np.int64)    # 0-based
        cols = {c: b.column(c) for c in carry}
        cols[rank_col] = pa.array(rn + 1, pa.int64())
        if n_tiles:
            base, rem = total_n // n_tiles, total_n % n_tiles
            cut = rem * (base + 1)
            tile = np.where(rn < cut, rn // max(base + 1, 1),
                            rem + (rn - cut) // max(base, 1)) + 1
            cols[tile_col] = pa.array(tile.astype(np.int64), pa.int64())
        return pa.table(cols)

    return srt.map_batches(kernel, batch_format="pyarrow",
                           batch_size=None)


def global_running_sum(ds: "ray.data.Dataset", order_cols: list[str],
                       value_col: str, out_col: str = "running_sum",
                       exclusive: bool = True,
                       carry_cols: list[str] | None = None
                       ) -> "ray.data.Dataset":
    """GLOBAL cumulative sum (no partition) — ``sum(v) OVER (ORDER BY
    ... ROWS UNBOUNDED PRECEDING [AND 1 PRECEDING])``.  Same design as
    ``global_rank``: the sorted run is materialized once, a light head
    pass reduces each block to (first-row key, block int64 sum) —
    n_blocks tiny rows on the driver — cumulative block sums in key
    order give every block its global offset, and the kernel adds its
    block-local cumsum.  ``order_cols`` must end in a unique non-null
    tiebreak; ``value_col`` must be integer-typed (int64 exactness is
    the oracle contract; float addition order is engine-dependent)."""
    carry = carry_cols or [*order_cols, value_col]
    srt = presort_coalesce(ds).sort(order_cols).materialize()

    def head(b: pa.Table) -> pa.Table:
        t = b.select(order_cols)
        if b.num_rows == 0:
            return t.slice(0, 0).append_column(
                "__sum", pa.array([], pa.int64()))
        s = int(np.asarray(b.column(value_col), dtype=np.int64).sum())
        return t.slice(0, 1).append_column(
            "__sum", pa.array([s], pa.int64()))

    heads = [(tuple(r[c] for c in order_cols), r["__sum"])
             for r in srt.map_batches(head, batch_format="pyarrow",
                                      batch_size=None).take_all()]
    for key, _ in heads:
        if any(v is None or v != v for v in key):
            raise ValueError(
                "global_running_sum order_cols must be non-null, "
                f"non-NaN: block head {key!r}")
    heads.sort(key=lambda h: h[0])
    offsets, acc = {}, 0
    for key, s in heads:
        offsets[key] = acc
        acc += s
    import ray as _ray
    off_ref = _ray.put(offsets)

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(c, b.schema.field(c).type) for c in carry]
        out_schema = pa.schema(fields + [(out_col, pa.int64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        omap = _ray.get(off_ref)
        first = tuple(b.column(c)[0].as_py() for c in order_cols)
        off = omap[first]
        v = np.asarray(b.column(value_col), dtype=np.int64)
        cs = np.cumsum(v)
        run = off + (cs - v if exclusive else cs)
        cols = {c: b.column(c) for c in carry}
        cols[out_col] = pa.array(run, pa.int64())
        return pa.table(cols)

    return srt.map_batches(kernel, batch_format="pyarrow",
                           batch_size=None)


def running_totals(ds: "ray.data.Dataset", key_col: str,
                   order_cols: list[str], value_col: str,
                   sum_col: str = "running_sum",
                   count_col: str = "running_n",
                   carry_cols: list[str] | None = None
                   ) -> "ray.data.Dataset":
    """Per-key running (cumulative) sum + row number — the
    UNBOUNDED-PRECEDING window frame (``sum(v) OVER (PARTITION BY key
    ORDER BY ...)``).  One sort on (key, order_cols...); interior
    blocks compute a block-wide cumsum re-based at each group start
    (two vectorized ops, no per-group Python); block-split keys take
    the residual pass with the same kernel.

    ``order_cols`` must end in a unique tiebreak so RANGE and ROWS
    frames coincide (SQL's determinism requirement).  ``value_col``
    should be integer-typed for bit-exact parity with SQL engines
    whose window aggregates use segment trees (float addition order
    differs); the int64 cumsum here is exact."""
    carry = carry_cols or [key_col, *order_cols]
    sort_keys = [key_col, *order_cols]

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(c, b.schema.field(c).type) for c in carry]
        out_schema = pa.schema(fields + [(sum_col, pa.int64()),
                                         (count_col, pa.int64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        sizes = ends - starts
        vals = np.asarray(b.column(value_col), dtype=np.int64)
        cs = np.cumsum(vals)
        base = np.repeat(cs[starts] - vals[starts], sizes)
        idx = np.arange(n, dtype=np.int64)
        row_n = idx - np.repeat(starts, sizes) + 1
        cols = {c: b.column(c) for c in carry}
        cols[sum_col] = pa.array(cs - base, pa.int64())
        cols[count_col] = pa.array(row_n, pa.int64())
        return pa.table(cols)

    interior, edge = sorted_split(ds, sort_keys, [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(c, "ascending") for c in sort_keys])),
                batch_format="pyarrow")))


def funnel_depths(ds: "ray.data.Dataset", key_col: str, ts_col: str,
                  type_col: str, steps: list[str],
                  out_col: str = "depth") -> "ray.data.Dataset":
    """Ordered multi-step funnel (the MATCH_RECOGNIZE / funnel-
    analytics shape): per key, the number of ``steps`` completed in
    strict timestamp order, where step s counts only if it occurs
    STRICTLY AFTER the earliest qualifying occurrence of step s-1
    (the chained correlated-min-subquery SQL formulation).  Depth is
    a prefix count: a missing step ends the funnel.

    One sort on (key) + a per-block kernel that runs one masked
    ``np.minimum.reduceat`` per step — order-independent within a key
    group, so interior blocks need no secondary ts sort and the
    residual pass reuses the identical kernel.  Per-group state is
    O(len(steps)); nothing but (key, depth) leaves the pass.

    Output: one row per key — (key_col, out_col int64).
    """
    _INF = np.int64(1) << np.int64(62)

    def kernel(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([(key_col, b.schema.field(key_col).type),
                                (out_col, pa.int64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        counts = ends - starts
        ts, _ = _ts_int64(b.column(ts_col), 0)
        et = b.column(type_col).combine_chunks()
        depth = np.zeros(len(starts), dtype=np.int64)
        prev = np.full(len(starts), -_INF, dtype=np.int64)
        for step in steps:
            mask = np.asarray(pc.fill_null(pc.equal(et, step), False))
            v = np.where(mask & (ts > np.repeat(prev, counts)), ts, _INF)
            cur = np.minimum.reduceat(v, starts)
            depth += (cur < _INF)
            prev = cur
        return pa.table({key_col: b.column(key_col).take(
                             pa.array(starts, pa.int64())),
                         out_col: pa.array(depth)})

    interior, edge = sorted_split(ds, [key_col], [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                kernel, batch_format="pyarrow")))


def grouped_ordered_concat(ds: "ray.data.Dataset", key_col: str,
                           order_cols: list[str], value_col: str,
                           sep: str = "",
                           out_col: str = "agg") -> "ray.data.Dataset":
    """Ordered string aggregation per key (``string_agg(value, sep
    ORDER BY ...) GROUP BY key``) — the order-sensitive aggregate Ray
    Data has no form for.  One sort on (key, order_cols...); each
    interior block turns its group bounds into ListArray offsets and
    runs ONE ``pc.binary_join`` kernel over the whole block (no
    per-group Python); block-edge groups take the residual pass with
    the identical kernel.  ``order_cols`` must end in a unique
    tiebreak (SQL's determinism requirement).  Null values are not
    supported (pre-filter; SQL string_agg skips nulls)."""
    sort_keys = [key_col, *order_cols]

    def kernel(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([(key_col, b.schema.field(key_col).type),
                                (out_col, pa.string())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        offsets = np.concatenate([starts, ends[-1:]]).astype(np.int32)
        vals = b.column(value_col).combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets), vals)
        joined = pc.binary_join(lists, sep)
        return pa.table({key_col: b.column(key_col).take(
                             pa.array(starts, pa.int64())),
                         out_col: joined})

    def residual(g: pa.Table) -> pa.Table:
        return kernel(g.sort_by([(c, "ascending") for c in sort_keys]))

    interior, edge = sorted_split(ds, sort_keys, [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                residual, batch_format="pyarrow")))
