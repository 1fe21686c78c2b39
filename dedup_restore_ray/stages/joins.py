"""Distributed key joins on the sort-scatter machinery.

Public wrappers over the co-sort kernels of stages/cluster.py (which
avoid ``Dataset.join`` — it rejects list payloads and fails on
union-produced block layouts) for the relational shapes the query
layer needs: semi join, anti join, left lookup with default.  All are
one sort shuffle of (refs ∪ keys); NO driver-side key-set
materialization (the big side never streams to the driver).

Reference analogue: the fingerprint-index lookup (src/dedup.c:120-146)
— a key-partitioned rendezvous of references with their single store
row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedup_restore_ray.stages.cluster import (_anti_by_key, _pa_schema,
                                              _scatter_lookup,
                                              scatter_lookup_split)


def semi_join(refs: "ray.data.Dataset", keys: "ray.data.Dataset",
              key_col: str) -> "ray.data.Dataset":
    """Rows of ``refs`` whose key appears in ``keys`` (IN-subquery
    shape).  ``keys`` need not be distinct."""
    out_cols = list(_pa_schema(refs).names)

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({key_col: b.column(key_col),
                         "__hit": pa.array(np.ones(b.num_rows, np.int8))})

    hit = _scatter_lookup(refs, keys.map_batches(tag, batch_format="pyarrow"),
                          key_col=key_col, payload_col="__hit",
                          out_cols=out_cols)
    return hit.drop_columns(["__hit"])


def anti_join(refs: "ray.data.Dataset", keys: "ray.data.Dataset",
              key_col: str) -> "ray.data.Dataset":
    """Rows of ``refs`` whose key does NOT appear in ``keys``
    (NOT-IN shape)."""
    return _anti_by_key(refs, keys.select_columns([key_col]), key_col)


def tag_asof_rows(b: pa.Table, key_col: str, ts_col: str,
                  payload_col: str, out_cols: list[str],
                  side: str, left_schema: pa.Schema | None = None,
                  payload_type: pa.DataType | None = None) -> pa.Table:
    """Build the tagged row layout ``asof_join_tagged`` consumes from
    one side's batch.  ``side`` is "left" or "right".  A fused caller
    (one scan feeding both sides) concatenates the two tables.

    The ``__tb`` tie-break column folds MAX-payload semantics into the
    sort itself: right rows carry the payload as float64 (nulls ->
    -inf, so any non-null shadows them), left rows 0.0 — so among
    right rows sharing (key, ts) the LARGEST payload sorts last and
    wins the segmented cummax, and the right side needs NO
    pre-aggregation shuffle.
    """
    if side == "right":
        payload = b.column(payload_col).combine_chunks()
        tb = np.asarray(pc.coalesce(
            pc.cast(payload, pa.float64()),
            pa.scalar(-np.inf, pa.float64())))
        cols = {key_col: b.column(key_col),
                ts_col: b.column(ts_col),
                "__slot": pa.array(np.full(b.num_rows, -1, np.int8)),
                "__tb": pa.array(tb),
                payload_col: payload}
        for c in out_cols:
            if c in (key_col, ts_col):
                continue
            cols[c] = (b.column(c) if c in b.schema.names
                       else pa.nulls(b.num_rows, left_schema.field(c).type))
    else:
        cols = {key_col: b.column(key_col),
                ts_col: b.column(ts_col),
                "__slot": pa.array(np.ones(b.num_rows, np.int8)),
                "__tb": pa.array(np.zeros(b.num_rows, np.float64)),
                payload_col: pa.nulls(b.num_rows, payload_type)}
        for c in out_cols:
            if c in (key_col, ts_col):
                continue
            cols[c] = b.column(c)
    return pa.table(cols)


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key_col: str, ts_col: str, payload_col: str,
              out_cols: list[str] | None = None) -> "ray.data.Dataset":
    """Backward-inclusive distributed as-of join (an operator Ray Data
    lacks): every ``left`` row gets ``payload_col`` from the LATEST
    ``right`` row with the same key and ``right.ts <= left.ts``; rows
    with no prior right row get null (left-outer semantics — DuckDB's
    ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``).

    One sort shuffle of (left ∪ right) on (key, ts, slot, tb) — right
    rows (slot -1) sort before left rows at equal ts, making the match
    inclusive, and the ``__tb`` tie-break makes several right rows at
    one (key, ts) resolve to the MAX payload with no pre-aggregation
    pass (see ``tag_asof_rows``).  Callers that derive both sides from
    ONE scan should tag batches themselves and call
    ``asof_join_tagged`` directly — one read, one map, one shuffle.

    Partitioning assumption: the sort range-partitions by (key, ts),
    so a single key's history lands in O(1) partitions; extremely hot
    keys serialize within their partition (acceptable: the kernel is
    O(rows) numpy, not Python).
    """
    left_schema = _pa_schema(left)
    out_cols = out_cols or [c for c in left_schema.names]
    payload_type = _pa_schema(right).field(payload_col).type

    def right_rows(b: pa.Table) -> pa.Table:
        return tag_asof_rows(b, key_col, ts_col, payload_col, out_cols,
                             "right", left_schema=left_schema)

    def left_rows(b: pa.Table) -> pa.Table:
        return tag_asof_rows(b, key_col, ts_col, payload_col, out_cols,
                             "left", payload_type=payload_type)

    rows = (right.map_batches(right_rows, batch_format="pyarrow")
            .union(left.map_batches(left_rows, batch_format="pyarrow")))
    return asof_join_tagged(rows, key_col=key_col, ts_col=ts_col,
                            payload_col=payload_col, out_cols=out_cols,
                            payload_type=payload_type)


def asof_join_tagged(rows: "ray.data.Dataset", key_col: str, ts_col: str,
                     payload_col: str, out_cols: list[str],
                     payload_type: pa.DataType) -> "ray.data.Dataset":
    """Core of the as-of join over pre-tagged rows (``tag_asof_rows``
    layout).  Per sorted block, the match is a SEGMENTED CUMMAX, all
    numpy: index each right row by ``seg*(n+1)+i``, max-accumulate,
    and a match from an earlier key segment falls below the current
    segment's base, so it reads as null — no per-group Python.  Key
    groups split across block boundaries take the residual groupby
    path (same kernel), as in every sort-scatter stage here.
    """
    from dedup_restore_ray.stages.groups import group_bounds, sorted_split

    emit_cols = list(dict.fromkeys([*out_cols, payload_col]))

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(c, payload_type if c == payload_col
                   else b.schema.field(c).type) for c in emit_cols]
        out_schema = pa.schema(fields)
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, [key_col])
        slot = np.asarray(b.column("__slot").combine_chunks())
        idx = np.arange(n, dtype=np.int64)
        seg = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        base = seg * np.int64(n + 1)
        v = np.where(slot == -1, base + idx, np.int64(-1))
        acc = np.maximum.accumulate(v)
        valid = acc >= base          # match belongs to THIS key segment
        match = np.where(valid, acc - base, 0)
        lrows = np.flatnonzero(slot == 1)
        if len(lrows) == 0:
            return out_schema.empty_table()
        matched = valid[lrows]
        payload = b.column(payload_col).combine_chunks().take(
            pa.array(match[lrows]))
        import pyarrow.compute as pc
        payload = pc.if_else(pa.array(matched), payload,
                             pa.scalar(None, payload_type))
        take = pa.array(lrows)
        cols = {}
        for c in emit_cols:
            cols[c] = payload if c == payload_col else b.column(c).take(take)
        return pa.table(cols)

    interior, edge = sorted_split(rows, [key_col, ts_col, "__slot", "__tb"],
                                  [key_col])
    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                lambda g: kernel(g.sort_by(
                    [(key_col, "ascending"), (ts_col, "ascending"),
                     ("__slot", "ascending"), ("__tb", "ascending")])),
                batch_format="pyarrow")))


def band_join_pairs(ds: "ray.data.Dataset", id_col: str, value_col: str,
                    eps: float) -> "ray.data.Dataset":
    """Numeric band (range) self-join: all pairs (u, v), u < v, with
    ``|value_u - value_v| <= eps`` — the 1-D analogue of the
    embedding near-dup pair generator, and an operator Ray Data has
    no native form for.

    Distributed strategy: every row lands in buckets ``floor(v/eps)``
    and ``floor(v/eps)+1``, so any qualifying pair shares at least one
    bucket; ONE sort on (bucket, value) then a per-block sliding
    window over each bucket's sorted run emits candidates in
    O(output) (offset-searchsorted gives each row its window end —
    no per-bucket Python).  Boundary decisions are made by an EXACT
    ``|a-b| <= eps`` re-filter on the original values (the windowed
    search uses a small slack), so results are bit-compatible with
    the SQL formulation.  Pairs found in both shared buckets are
    folded by one distinct.

    Partitioning assumption: value-uniform data spreads buckets
    evenly; a massive tie-cluster at one value serializes its bucket
    (O(k^2) pairs there is inherent to the JOIN SEMANTICS, not the
    algorithm).
    """
    from dedup_restore_ray.stages.groups import (distinct_rows,
                                                 group_bounds,
                                                 sorted_split, _ramp)

    id_type = _pa_schema(ds).field(id_col).type

    def bucketize(b: pa.Table) -> pa.Table:
        vals = np.asarray(pc.cast(
            b.column(value_col).combine_chunks(), pa.float64()))
        bk = np.floor(vals / eps).astype(np.int64)
        ids = b.column(id_col).combine_chunks()
        two_ids = pa.concat_arrays([ids, ids])
        return pa.table({
            "bucket": pa.array(np.concatenate((bk, bk + 1))),
            "val": pa.array(np.concatenate((vals, vals))),
            id_col: two_ids,
        })

    rows = ds.map_batches(bucketize, batch_format="pyarrow")

    def pair_block(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("u", id_type), ("v", id_type)])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        starts, ends = group_bounds(b, ["bucket"])
        vals = np.asarray(b.column("val").combine_chunks())
        sizes = ends - starts
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        big = float(vals.max() - vals.min()) + 2.0 * eps + 1.0
        adj = vals + seg * big
        slack = eps * (1.0 + 1e-9) + 1e-12
        hi = np.searchsorted(adj, adj + slack, side="right")
        idx = np.arange(n, dtype=np.int64)
        cnt = hi - idx - 1
        if int(cnt.sum()) == 0:
            return out_schema.empty_table()
        ui = np.repeat(idx, cnt)
        vi = np.repeat(idx + 1, cnt) + _ramp(cnt)
        keep = np.abs(vals[ui] - vals[vi]) <= eps   # exact boundary
        ui, vi = ui[keep], vi[keep]
        ids = b.column(id_col).combine_chunks()
        u = ids.take(pa.array(ui))
        v = ids.take(pa.array(vi))
        # normalize u < v; drop accidental self-pairs (same id twice
        # only happens for duplicate (id) rows in the input)
        lo = pc.min_element_wise(u, v)
        hi_ = pc.max_element_wise(u, v)
        tbl = pa.table({"u": lo, "v": hi_})
        return tbl.filter(pc.not_equal(lo, hi_))

    interior, edge = sorted_split(rows, ["bucket", "val"], ["bucket"])
    pairs = (interior.map_batches(pair_block, batch_format="pyarrow",
                                  batch_size=None)
             .union(edge.groupby("bucket").map_groups(
                 lambda g: pair_block(g.sort_by(
                     [("bucket", "ascending"), ("val", "ascending")])),
                 batch_format="pyarrow")))
    return distinct_rows(pairs, ["u", "v"])


def left_lookup(refs: "ray.data.Dataset", store: "ray.data.Dataset",
                key_col: str, payload_col: str,
                default) -> "ray.data.Dataset":
    """Left join of ``refs`` against single-row-per-key ``store``:
    matched rows get the payload, unmatched rows get ``default``.
    One sort-scatter pass; hit and miss kernels share the sorted run
    (scatter_lookup_split)."""
    out_cols = list(_pa_schema(refs).names)
    payload_type = _pa_schema(store).field(payload_col).type
    hit, miss = scatter_lookup_split(refs, store, key_col=key_col,
                                     payload_col=payload_col,
                                     out_cols=out_cols)
    miss = miss.map_batches(
        lambda b: b.append_column(
            payload_col, pa.array([default] * b.num_rows, payload_type)),
        batch_format="pyarrow")
    return hit.union(miss)


def full_outer_lookup(left: "ray.data.Dataset", right: "ray.data.Dataset",
                      key_col: str, left_payload: str, right_payload: str,
                      shared_cols: list[str], left_default,
                      right_default) -> "ray.data.Dataset":
    """Full outer join of two single-row-per-key tables.  Each side
    carries ``shared_cols`` (describing the key, e.g. the unpacked
    composite columns) + ``key_col`` + its own payload column; output
    = shared_cols + both payloads, with defaults on the absent side.

    Two sort passes over the (already aggregated, small-side) inputs:
    one scatter_lookup_split delivers matched + left-only in a single
    sorted run; one anti pass yields right-only rows.  Prefer this
    over ``Dataset.join`` for the usual reasons (list payloads,
    union-produced block layouts — see CLAUDE.md)."""
    ltype = _pa_schema(left).field(left_payload).type
    rtype = _pa_schema(right).field(right_payload).type
    hit, miss = scatter_lookup_split(
        left, right, key_col, right_payload,
        out_cols=[*shared_cols, left_payload])

    out_names = [*shared_cols, left_payload, right_payload]

    def fill_right(b: pa.Table) -> pa.Table:
        rp = pa.array([right_default] * b.num_rows, rtype)
        return pa.table({**{c: b.column(c) for c in shared_cols},
                         left_payload: b.column(left_payload),
                         right_payload: rp})

    def order_hit(b: pa.Table) -> pa.Table:
        return pa.table({c: b.column(c) for c in out_names})

    right_only = anti_join(right, left.select_columns([key_col]), key_col)

    def fill_left(b: pa.Table) -> pa.Table:
        lp = pa.array([left_default] * b.num_rows, ltype)
        return pa.table({**{c: b.column(c) for c in shared_cols},
                         left_payload: lp,
                         right_payload: b.column(right_payload)})

    return (hit.map_batches(order_hit, batch_format="pyarrow")
            .union(miss.map_batches(fill_right, batch_format="pyarrow"))
            .union(right_only.map_batches(fill_left,
                                          batch_format="pyarrow")))


def bloom_semi_join(refs: "ray.data.Dataset", keys: "ray.data.Dataset",
                    key_col: str, num_bits: int = 1 << 24
                    ) -> "ray.data.Dataset":
    """Bloom-prefiltered semi join — the broadcast-bloom-join trick
    that makes selective semi joins cheap at shuffle scale: the keys
    side reduces to per-block bloom bitmaps, the driver ORs them
    STREAMING (it holds exactly one m/8-byte bitmap at a time — never
    a key set), the merged bitmap broadcasts once via ``ray.put``, and
    a vectorized membership check drops definitely-miss refs BEFORE
    the semi join's sort shuffle.  False positives only cost shuffle
    volume (the exact semi join still runs on the survivors); false
    negatives cannot occur — the result is exactly
    ``semi_join(refs, keys, key_col)``.

    Reference analogue: ``bloom_check`` gating the exact index lookup
    (src/bloomfilter.c:96-191, src/dedup.c:120-134) — here gating a
    shuffle instead of a disk probe.

    num_bits: bitmap size, power of 2.  The default 2 MiB bitmap keeps
    ~1.7M keys under ~1% FP with the 2-hash scheme; size it to the
    KEYS side, not the refs side."""
    import ray

    from dedup_restore_ray.functions.bloom import BloomFilter
    from dedup_restore_ray.stages.verify import _id_hashes

    def block_bloom(b: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits=num_bits)
        if b.num_rows:
            bf.add(_id_hashes(b.column(key_col)))
        return pa.table({"bits": pa.array([bf.bits.tobytes()],
                                          pa.binary())})

    merged = np.zeros(num_bits // 8, dtype=np.uint8)
    for blk in (keys.select_columns([key_col])
                .map_batches(block_bloom, batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow")):
        for buf in blk.column("bits").to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint8)
    bits_ref = ray.put(merged)

    def prefilter(b: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits=num_bits)
        bf.bits = ray.get(bits_ref)    # zero-copy shared-memory view
        keep = bf.check(_id_hashes(b.column(key_col)))
        return b.filter(pa.array(keep))

    survivors = refs.map_batches(prefilter, batch_format="pyarrow")
    return semi_join(survivors, keys, key_col)


def snapshot_diff(old: "ray.data.Dataset", new: "ray.data.Dataset",
                  key_col: str, hash_col: str) -> "ray.data.Dataset":
    """Change-data-capture between two snapshots of a keyed table:
    emits (key, change) with change in {'added', 'removed',
    'changed'}; unchanged keys are dropped.  Each side projects to
    (key, content-hash) rows, one full_outer_lookup rendezvous (two
    sort passes over the 2-column projections — the payload columns
    never shuffle), and a vectorized classifier.  The hash column is
    the engine's own content hash — only EQUALITY is compared, so any
    collision-resistant digest gives parity with a SQL md5 oracle."""

    def side(ds: "ray.data.Dataset", out: str) -> "ray.data.Dataset":
        return ds.map_batches(
            lambda b: pa.table({key_col: b.column(key_col),
                                out: b.column(hash_col)}),
            batch_format="pyarrow")

    j = full_outer_lookup(side(old, "old_h"), side(new, "new_h"),
                          key_col, left_payload="old_h",
                          right_payload="new_h", shared_cols=[key_col],
                          left_default=None, right_default=None)

    def classify(b: pa.Table) -> pa.Table:
        oh, nh = b.column("old_h"), b.column("new_h")
        o_null = np.asarray(pc.is_null(oh))
        n_null = np.asarray(pc.is_null(nh))
        eq = np.asarray(pc.equal(oh, nh).combine_chunks()
                        .fill_null(False))
        change = np.select([n_null, o_null, ~eq],
                           ["removed", "added", "changed"],
                           default="")
        keep = change != ""
        return pa.table({key_col: b.column(key_col).filter(pa.array(keep)),
                         "change": pa.array(change[keep].tolist(),
                                            pa.string())})

    return j.map_batches(classify, batch_format="pyarrow")
