"""Sort-based vectorized group processing.

``Dataset.groupby(...).map_groups(fn)`` invokes Python once per group —
untenable for the LSH bucket stage (one group per band hash, ~20 per
doc).  This module replaces it with the classic sort-merge formulation:

  1. ``ds.sort(keys)`` (one shuffle — the same data movement a groupby
     would do, but with Ray's vectorized range-partition sort),
  2. one ``map_batches`` per *block* applying a vectorized kernel over
     all groups in the block at once (group boundaries found with one
     numpy diff, per-group work done with reduceat / triu_indices),
  3. groups touching a block edge (the block's first and last key) are
     routed to a tiny *residual* pass — a conventional groupby over a
     few rows per block — so groups split across blocks are still
     processed whole.  Both paths call the same per-group emitters, so
     the result is independent of block boundaries.

Measured ~50x faster than map_groups at 100k groups / 200k rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def flatten_blocks(ds: "ray.data.Dataset",
                   width: int | None = None) -> "ray.data.Dataset":
    """Coalesce a deep union DAG / many tiny blocks into ``width``
    materialized blocks BEFORE feeding a sort.  Ray's sort planner
    estimates memory from block counts and stalls on the accumulated
    tiny blocks that union-of-map_groups outputs produce (observed:
    '13GB driver memory' scheduling stall for a 10-row dataset) —
    see CLAUDE.md.  Width scales with the cluster so this never
    serializes a large job."""
    if width is None:
        try:
            width = max(8, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            width = 8
        # shrink for tiny datasets: cpu-count blocks of a few KB each
        # only buy scheduling overhead (size-gated, like
        # presort_coalesce — a real corpus keeps the cpu width)
        m = ds.materialize()
        size = m.size_bytes() or 0
        width = min(width, max(1, -(-size // (1 << 20))))
        return m.repartition(width).materialize()
    return ds.repartition(width).materialize()


def adjacent_equal(tbl: pa.Table, cols: list[str]) -> np.ndarray:
    """bool[n-1]: row i+1 equals row i on all cols (sorted input)."""
    n = tbl.num_rows
    acc = np.ones(max(n - 1, 0), dtype=bool)
    for c in cols:
        col = tbl.column(c).combine_chunks()
        eq = pc.equal(col.slice(1), col.slice(0, n - 1))
        acc &= np.asarray(eq.combine_chunks().fill_null(False)
                          if isinstance(eq, pa.ChunkedArray) else eq)
    return acc


def edge_key_mask(tbl: pa.Table, cols: list[str]) -> np.ndarray:
    """bool[n]: row belongs to the block's first or last key tuple."""
    n = tbl.num_rows
    first = np.ones(n, dtype=bool)
    last = np.ones(n, dtype=bool)
    for c in cols:
        col = tbl.column(c).combine_chunks()
        first &= np.asarray(pc.equal(col, col[0]))
        last &= np.asarray(pc.equal(col, col[n - 1]))
    return first | last


def presort_coalesce(ds: "ray.data.Dataset",
                     target_block_bytes: int = 32 << 20
                     ) -> "ray.data.Dataset":
    """Materialize and, when fragmented, coalesce a dataset about to be
    SORTED.  Ray's range-partition sort costs ~quadratically in block
    count for small blocks (B sample tasks + B map + B reduce with B^2
    partition fetches — measured on this host: a 5k-row sort over 64
    blocks 1.7s, over 32 blocks 0.21s), and reads/unions at small data
    sizes hand it 64-128 tiny blocks.  Coalesce width is scale-gated:
    ``max(cluster CPUs, bytes/target_block_bytes)`` — at real data
    sizes the byte term exceeds the block count and NO repartition
    happens, so a 100-TB sort is never squeezed into cpu-count
    blocks."""
    m = ds.materialize()
    nb = m.num_blocks()
    try:
        cpus = max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        cpus = 8
    size = m.size_bytes() or 0
    width = max(cpus, -(-size // target_block_bytes))
    # tiny-data floor: don't hand the sort cpu-count near-empty blocks
    # (a 140 KB table in 32 blocks pays ~1s of pure scheduling); at
    # >= ~1 MB/cpu of data the min() is inert and width stays cpu/size
    # driven, so large corpora are never squeezed.
    width = min(width, max(1, -(-size // (1 << 20))))
    if nb > width:
        return m.repartition(width).materialize()
    return m


def sorted_split(ds: "ray.data.Dataset", sort_keys: list[str],
                 group_keys: list[str] | None = None
                 ) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Sort by sort_keys; return (interior, edge) datasets where
    ``edge`` holds the rows of each block's first/last *group key*
    (groups possibly split across blocks) and ``interior`` the rest
    (groups guaranteed whole).  The sorted dataset is materialized once
    so both passes see identical block boundaries.  Input is coalesced
    via ``presort_coalesce`` (fragmented tiny-block inputs cross Ray's
    sort overhead cliff; no-op at real data sizes)."""
    group_keys = group_keys or sort_keys
    srt = presort_coalesce(ds).sort(sort_keys).materialize()

    def interior(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.filter(pa.array(~edge_key_mask(b, group_keys)))

    def edge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.filter(pa.array(edge_key_mask(b, group_keys)))

    return (srt.map_batches(interior, batch_format="pyarrow", batch_size=None),
            srt.map_batches(edge, batch_format="pyarrow", batch_size=None))


def group_bounds(tbl: pa.Table, cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of contiguous key groups in a sorted batch."""
    n = tbl.num_rows
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero(~adjacent_equal(tbl, cols)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return starts, ends


# ----------------------------------------------------------------------
# Pair generation (LSH buckets, fingerprint buckets)
# ----------------------------------------------------------------------

def group_pair_indices(start: int, end: int, max_all: int, num_salts: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Edge index pairs for one bucket whose members (sorted-unique,
    ascending) occupy [start, end).

    - size <= max_all: all C(n,2) pairs (exact within-bucket);
    - size  > max_all (hot bucket, north_rule skew handling): salted
      star+chain — members are striped into ``num_salts`` classes
      (member i -> class i % num_salts); each class forms a stride
      chain (i, i+num_salts), and the global minimum fans out to every
      class head.  O(n) edges keeping the bucket connected.
    """
    sz = end - start
    if sz < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if sz <= max_all:
        iu, iv = np.triu_indices(sz, k=1)
        return start + iu, start + iv
    k = min(num_salts, sz)
    idx = np.arange(start, end, dtype=np.int64)
    chain_u, chain_v = idx[:-k], idx[k:]
    star_u = np.full(k - 1, start, dtype=np.int64)
    star_v = idx[1:k]
    return (np.concatenate([chain_u, star_u]),
            np.concatenate([chain_v, star_v]))


def _batch_bucket_pairs(b: pa.Table, key_col: str, id_col: str,
                        max_all: int, num_salts: int) -> pa.Table:
    """Vectorized per-block pair emission over all buckets at once.
    Input sorted by [key_col, id_col]."""
    id_type = b.schema.field(id_col).type
    empty = pa.table({"u": pa.array([], id_type), "v": pa.array([], id_type)})
    n = b.num_rows
    if n == 0:
        return empty
    # drop duplicate (key, doc) rows (same doc hit the bucket via
    # several bands) — adjacent after the sort
    if n > 1:
        dup = adjacent_equal(b, [key_col, id_col])
        b = b.filter(pa.array(np.concatenate(([True], ~dup))))
        n = b.num_rows
    starts, ends = group_bounds(b, [key_col])
    sizes = ends - starts
    us, vs = [], []
    # vectorize by size class: all groups of size s emit the same triu
    # index pattern, broadcast over that class's start offsets — the
    # Python loop runs once per DISTINCT size (<= max_all), not per
    # group.
    for s in np.unique(sizes):
        s = int(s)
        if s < 2:
            continue
        class_starts = starts[sizes == s]
        if s <= max_all:
            iu, iv = np.triu_indices(s, k=1)
            us.append((class_starts[:, None] + iu[None, :]).reshape(-1))
            vs.append((class_starts[:, None] + iv[None, :]).reshape(-1))
        else:
            for st in class_starts:   # hot buckets are rare
                iu, iv = group_pair_indices(int(st), int(st) + s,
                                            max_all, num_salts)
                us.append(iu)
                vs.append(iv)
    if not us:
        return empty
    docs = b.column(id_col)
    ui = pa.array(np.concatenate(us))
    vi = pa.array(np.concatenate(vs))
    # members ascend within a group -> u < v by construction
    # (A/B'd round 4: a within-block pair-level pre-distinct — lexsort
    # per block before the distinct shuffle — cut the distinct's input
    # 39M -> 6M rows on the planted corpus but cost the same wall time
    # it saved on both 1- and 4-CPU legs; host variance exceeded the
    # effect both ways, so the simple emission stands.)
    return pa.table({"u": docs.take(ui), "v": docs.take(vi)})


def _residual_bucket_pairs(group: pa.Table, id_col: str, max_all: int,
                           num_salts: int) -> pa.Table:
    """Whole-group pair emission (arrow-native) — same emitter as the
    interior kernel, so results don't depend on block boundaries."""
    id_type = group.schema.field(id_col).type
    col = group.column(id_col).combine_chunks()
    if pa.types.is_integer(id_type):
        members = np.unique(np.asarray(col))
        iu, iv = group_pair_indices(0, len(members), max_all, num_salts)
        return pa.table({"u": pa.array(members[iu], id_type),
                         "v": pa.array(members[iv], id_type)})
    members = np.unique(np.array(col.to_pylist(), dtype=object))
    iu, iv = group_pair_indices(0, len(members), max_all, num_salts)
    return pa.table({"u": pa.array(list(members[iu]), id_type),
                     "v": pa.array(list(members[iv]), id_type)})


def residual_singleblock(edge: "ray.data.Dataset",
                         sort_keys: list[str],
                         block_kernel) -> "ray.data.Dataset":
    """Run a sorted-block kernel over ALL residual (boundary) rows of
    a ``sorted_split`` as ONE locally-sorted block.

    The edge dataset holds only each block's first/last group — a tiny
    fraction of the rows — yet ``edge.groupby(k).map_groups(...)``
    pays a FULL Ray sort plan (sample, partition, shuffle barriers):
    measured 2-4 s of fixed wall per residual pass at 1M docs,
    identical on the 1- and 4-CPU scaling legs — a pure Amdahl term of
    the pair chain.  Coalescing to one block and sorting locally makes
    every group whole, so the INTERIOR kernel is the correct emitter
    (the shared-emitter discipline: results stay independent of block
    layout) at ~0.5 s fixed.  Edge mass stays bounded — it shrinks
    with block size and pair emission per group is already capped —
    and 16-byte rows keep even a multi-million-row residual block in
    the tens of MB.

    The coalesce rides map_batches' own cross-block bundling (a huge
    batch_size makes the bundler accumulate every edge block into ONE
    batch/task) — measured ~2x cheaper than a repartition(1) operator,
    which pays its own split/reduce barrier."""
    sb = [(k, "ascending") for k in sort_keys]
    return edge.map_batches(
        lambda g: block_kernel(g.sort_by(sb)),
        batch_format="pyarrow", batch_size=1 << 31)


def bucket_pairs(rows: "ray.data.Dataset", max_all: int, num_salts: int,
                 key_col: str = "bucket_key", id_col: str = "doc_id"
                 ) -> "ray.data.Dataset":
    """(bucket_key, doc_id) rows -> candidate (u, v) pairs, u < v,
    distinct.  One sort shuffle + vectorized block kernels; the
    boundary groups ride ONE coalesced locally-sorted block through
    the same kernel (residual_singleblock) instead of a second Ray
    sort."""
    interior, edge = sorted_split(rows, [key_col, id_col], [key_col])

    def interior_pairs(b: pa.Table) -> pa.Table:
        return _batch_bucket_pairs(b, key_col, id_col, max_all, num_salts)

    pairs = interior.map_batches(interior_pairs, batch_format="pyarrow",
                                 batch_size=None)
    res = residual_singleblock(edge, [key_col, id_col], interior_pairs)
    return distinct_pairs(pairs.union(res))


def distinct_pairs(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct over (u, v) pair rows, keyed by a 128-bit pair hash:
    the raw pair stream out of the bucket kernels carries ~10x
    duplicate mass (every shared fingerprint re-emits the same pair),
    and any formulation that sorts or gathers the id columns — strings
    for url-keyed corpora — was the measured 4-CPU scaling limiter of
    the candidate chain (a full-block string ``take`` in the combiner
    alone cost 105s of a 147s distinct at 500k docs).  Instead:

      1. per-batch COMBINER: two independent uint64 pair hashes
         (arrow_row_hashes over u and v with different mixers), an
         argsort over ONE of them, and a positional keep mask mapped
         back to input order — the only touch on the string columns is
         a single sequential ``filter``; the shuffle then moves the
         ~distinct mass, not the raw mass;
      2. ONE global sort on the two u64 hashes — the id columns ride
         as PAYLOAD, never as sort keys;
      3. adjacent-equal dedup on (ph, ph2).  Equality of the 128-bit
         pair hash IS pair identity, the same convention the engine
         uses for SHA-1 content hashes (reference: 17-byte SHA-1
         prefix as chunk identity, src/dedup.c:84); at 2^-128 the
         collision odds are far below memory-error rates.
    """
    from dedup_restore_ray.functions.hashing import arrow_row_hashes, mix64

    def prehash(b: pa.Table) -> pa.Table:
        n = b.num_rows
        out_schema = pa.schema([("ph", pa.uint64()), ("ph2", pa.uint64()),
                                ("u", b.schema.field("u").type),
                                ("v", b.schema.field("v").type)])
        if n == 0:
            return out_schema.empty_table()
        with np.errstate(over="ignore"):
            hu = arrow_row_hashes(b.column("u"))
            hv = arrow_row_hashes(b.column("v"))
            ph = hu * np.uint64(0xBF58476D1CE4E5B9) + hv
            ph2 = mix64(hv * np.uint64(0x94D049BB133111EB) + hu)
        order = np.argsort(ph, kind="stable")
        phs = ph[order]
        keep_s = np.empty(n, dtype=bool)
        keep_s[0] = True
        np.not_equal(phs[1:], phs[:-1], out=keep_s[1:])
        if not keep_s.all():
            # same-ph neighbors: keep unless ph2 also equal
            cand = np.flatnonzero(~keep_s)
            keep_s[cand[ph2[order[cand]] != ph2[order[cand - 1]]]] = True
        mask = np.zeros(n, dtype=bool)
        mask[order[keep_s]] = True
        t = b.select(["u", "v"]).filter(pa.array(mask))
        return pa.table({"ph": pa.array(ph[mask], pa.uint64()),
                         "ph2": pa.array(ph2[mask], pa.uint64()),
                         "u": t.column("u"), "v": t.column("v")})

    # batch_size=None: whole blocks — the combiner's dedup rate and the
    # vectorized hash both collapse at the 1024-row default batch size
    pre = ds.map_batches(prehash, batch_format="pyarrow", batch_size=None)
    interior, edge = sorted_split(pre, ["ph", "ph2"], ["ph"])

    def dedup(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n < 2:
            return b.select(["u", "v"])
        dup = adjacent_equal(b, ["ph", "ph2"])
        return b.filter(pa.array(np.concatenate(([True], ~dup)))
                        ).select(["u", "v"])

    return (interior.map_batches(dedup, batch_format="pyarrow",
                                 batch_size=None)
            .union(residual_singleblock(edge, ["ph", "ph2"], dedup)))


def distinct_rows(ds: "ray.data.Dataset", keys: list[str]
                  ) -> "ray.data.Dataset":
    """Distinct over key columns via the same sort + block-kernel +
    residual pattern (replaces groupby(keys).map_groups(head(1)))."""
    interior, edge = sorted_split(ds.select_columns(keys), keys)

    def dedup(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n < 2:
            return b
        dup = adjacent_equal(b, keys)
        return b.filter(pa.array(np.concatenate(([True], ~dup))))

    def res_head(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return (interior.map_batches(dedup, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(keys).map_groups(res_head,
                                                 batch_format="pyarrow")))


# ----------------------------------------------------------------------
# Grouped aggregation (sum / count / min / max via reduceat)
# ----------------------------------------------------------------------

_AGG_UFUNC = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def grouped_aggregate(ds: "ray.data.Dataset", keys: list[str],
                      aggs: dict[str, tuple[str, str]],
                      count_alias: str | None = None) -> "ray.data.Dataset":
    """Sum/min/max aggregates per key group: one sort + per-block
    ``ufunc.reduceat`` (replaces ``groupby().aggregate(...)`` whose
    fixed overhead dominates on many-group workloads).

    aggs: {out_col: (in_col, "sum"|"min"|"max")}; count_alias adds a
    per-group row count.  Interior blocks hold only whole groups and
    block-edge groups are reassembled whole by the residual pass, so
    each key appears exactly once in the output — no second reduce.
    """
    interior, edge = sorted_split(ds, keys)

    def block_agg(b: pa.Table) -> pa.Table:
        fields = [(k, b.schema.field(k).type) for k in keys]
        n = b.num_rows
        if n == 0:
            cols = {k: pa.array([], t) for k, t in fields}
            for out_col, (in_col, _) in aggs.items():
                cols[out_col] = pa.array([], b.schema.field(in_col).type)
            if count_alias:
                cols[count_alias] = pa.array([], pa.int64())
            return pa.table(cols)
        starts, ends = group_bounds(b, keys)
        cols = {k: b.column(k).take(pa.array(starts)) for k in keys}
        for out_col, (in_col, how) in aggs.items():
            vals = np.asarray(b.column(in_col))
            cols[out_col] = pa.array(_AGG_UFUNC[how].reduceat(vals, starts))
        if count_alias:
            cols[count_alias] = pa.array((ends - starts).astype(np.int64))
        return pa.table(cols)

    def residual_agg(g: pa.Table) -> pa.Table:
        return block_agg(g.sort_by([(k, "ascending") for k in keys]))

    # Skew guard: when every aggregated input is integer-typed the
    # edge stream is pre-reduced per block BEFORE the residual groupby
    # (edge blocks come from the sorted run, so rows are already
    # key-contiguous and block_agg applies directly).  A hot key
    # spanning B blocks then ships B one-row partials to its residual
    # task instead of its full row set — the hot-key residual is
    # O(blocks), not O(rows).  sum/min/max/count over integers merge
    # exactly (no float addition-order dependence, which is why the
    # float path keeps the row-level residual).
    schema = ds.schema()   # None for an empty/schemaless dataset
    types = (dict(zip(schema.names, schema.types))
             if schema is not None else {})
    int_ok = schema is not None and all(
        in_col in types and pa.types.is_integer(types[in_col])
        for in_col, _ in aggs.values())

    def merge_partials(g: pa.Table) -> pa.Table:
        cols = {k: g.column(k).slice(0, 1) for k in keys}
        for out_col, (_in, how) in aggs.items():
            v = np.asarray(g.column(out_col))
            cols[out_col] = pa.array([_AGG_UFUNC[how].reduce(v)])
        if count_alias:
            cols[count_alias] = pa.array(
                [int(np.asarray(g.column(count_alias)).sum())],
                pa.int64())
        return pa.table(cols)

    if int_ok:
        residual = (edge.map_batches(block_agg, batch_format="pyarrow",
                                     batch_size=None)
                    .groupby(keys).map_groups(merge_partials,
                                              batch_format="pyarrow"))
    else:
        residual = edge.groupby(keys).map_groups(
            residual_agg, batch_format="pyarrow")

    return (interior.map_batches(block_agg, batch_format="pyarrow",
                                 batch_size=None)
            .union(residual))


def grouped_count_distinct(ds: "ray.data.Dataset", keys: list[str],
                           value_col: str, out_col: str = "n_distinct",
                           count_alias: str | None = None
                           ) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT value) per key group, at many-group scale:
    one sort on (keys..., value) + a per-block run-start count
    (``add.reduceat`` over new-(key, value) flags — no per-group
    Python, no per-group hash sets).  The residual pass reassembles
    block-split keys with the same kernel, so each key appears exactly
    once.  ``count_alias`` adds the plain per-group row count from the
    same pass."""
    sort_keys = [*keys, value_col]
    interior, edge = sorted_split(ds.select_columns(sort_keys),
                                  sort_keys, keys)

    def kernel(b: pa.Table) -> pa.Table:
        fields = [(k, b.schema.field(k).type) for k in keys]
        extra = [(out_col, pa.int64())] + (
            [(count_alias, pa.int64())] if count_alias else [])
        n = b.num_rows
        if n == 0:
            return pa.schema(fields + extra).empty_table()
        starts, ends = group_bounds(b, keys)
        new_pair = np.ones(n, dtype=np.int64)
        if n > 1:
            new_pair[1:] = ~adjacent_equal(b, sort_keys)
        cols = {k: b.column(k).take(pa.array(starts)) for k in keys}
        cols[out_col] = pa.array(np.add.reduceat(new_pair, starts))
        if count_alias:
            cols[count_alias] = pa.array((ends - starts).astype(np.int64))
        return pa.table(cols)

    return (interior.map_batches(kernel, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(keys).map_groups(
                lambda g: kernel(g.sort_by(
                    [(c, "ascending") for c in sort_keys])),
                batch_format="pyarrow")))


def grouped_quantile(ds: "ray.data.Dataset", keys: list[str],
                     value_col: str, qs: list[float],
                     out_cols: list[str],
                     count_alias: str | None = None) -> "ray.data.Dataset":
    """Exact continuous quantiles per key group (the
    ``quantile_cont`` / ``percentile_cont`` window shape Ray Data has
    no aggregate for) — one sort on (keys..., value) + a per-block
    vectorized kernel: with group bounds in hand, EVERY group's
    quantile is two gathers and a fused multiply-add over the block
    (no per-group Python).  Interpolation is DuckDB's weighted form
    ``v[floor]*(ceil-rn) + v[ceil]*(rn-floor)`` with the
    integer-index special case — verified bit-exact against
    ``quantile_cont`` over randomized inputs.  Null values are not
    supported (pre-filter them; SQL aggregates skip nulls).

    Scale note: per-group state is O(1); the only data movement is the
    one range-partition sort, and the output is one row per group —
    the same shuffle discipline as grouped_aggregate."""
    assert len(qs) == len(out_cols)
    interior, edge = sorted_split(ds, keys + [value_col], keys)

    def block_quantiles(b: pa.Table) -> pa.Table:
        fields = [(k, b.schema.field(k).type) for k in keys]
        if b.num_rows == 0:
            cols = {k: pa.array([], t) for k, t in fields}
            for out in out_cols:
                cols[out] = pa.array([], pa.float64())
            if count_alias:
                cols[count_alias] = pa.array([], pa.int64())
            return pa.table(cols)
        starts, ends = group_bounds(b, keys)
        sizes = ends - starts
        v = np.asarray(pc.cast(b.column(value_col).combine_chunks(),
                               pa.float64()))
        cols = {k: b.column(k).take(pa.array(starts)) for k in keys}
        for q, out in zip(qs, out_cols):
            rn = (sizes - 1).astype(np.float64) * q
            frn = np.floor(rn).astype(np.int64)
            crn = np.ceil(rn).astype(np.int64)
            lo = v[starts + frn]
            hi = v[starts + crn]
            res = np.where(frn == crn, lo,
                           lo * (crn - rn) + hi * (rn - frn))
            cols[out] = pa.array(res)
        if count_alias:
            cols[count_alias] = pa.array(sizes.astype(np.int64))
        return pa.table(cols)

    def residual_quantiles(g: pa.Table) -> pa.Table:
        return block_quantiles(g.sort_by(
            [(k, "ascending") for k in keys + [value_col]]))

    return (interior.map_batches(block_quantiles, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(keys).map_groups(
                residual_quantiles, batch_format="pyarrow")))


def grouped_weighted_median(ds: "ray.data.Dataset", keys: list[str],
                            value_col: str, weight_col: str,
                            tiebreak_col: str,
                            out_col: str = "wmedian",
                            total_alias: str | None = None
                            ) -> "ray.data.Dataset":
    """Lower weighted median per key group: the smallest ``value``
    whose cumulative weight (rows ordered by value, tiebreak) reaches
    half the group's total weight — ``min(v) FILTER (WHERE 2*cumw >=
    totw)`` in window-SQL form.  Weights must be non-negative
    integers; the comparison ``2*cumw >= totw`` is then int64-exact on
    both sides (no float midpoint).

    One sort on (keys..., value, tiebreak) + a per-block kernel that
    computes cumulative AND total weight in a single cumsum, then
    selects each group's first qualifying row with one ``add.reduceat``
    (cumulative weight is monotone within a group, so the first
    qualifying index is ``end - count_qualifying``) — no per-group
    Python.  Null values/weights are not supported (pre-filter)."""
    sort_cols = keys + [value_col, tiebreak_col]
    interior, edge = sorted_split(ds, sort_cols, keys)

    def block_wmedian(b: pa.Table) -> pa.Table:
        fields = [(k, b.schema.field(k).type) for k in keys]
        if b.num_rows == 0:
            cols = {k: pa.array([], t) for k, t in fields}
            cols[out_col] = pa.array([], b.schema.field(value_col).type)
            if total_alias:
                cols[total_alias] = pa.array([], pa.int64())
            return pa.table(cols)
        starts, ends = group_bounds(b, keys)
        w = np.asarray(b.column(weight_col), dtype=np.int64)
        cs = np.zeros(len(w) + 1, np.int64)
        np.cumsum(w, out=cs[1:])
        tot = cs[ends] - cs[starts]
        # within-group cumulative weight, rebased per group
        cum = cs[1:] - np.repeat(cs[starts], ends - starts)
        qual = (2 * cum) >= np.repeat(tot, ends - starts)
        n_qual = np.add.reduceat(qual, starts)
        # all-zero-weight group: every row qualifies -> first row (the
        # min value), matching the SQL FILTER form
        pick = ends - n_qual
        cols = {k: b.column(k).take(pa.array(starts)) for k in keys}
        cols[out_col] = b.column(value_col).take(pa.array(pick))
        if total_alias:
            cols[total_alias] = pa.array(tot)
        return pa.table(cols)

    def residual_wmedian(g: pa.Table) -> pa.Table:
        return block_wmedian(g.sort_by(
            [(c, "ascending") for c in sort_cols]))

    return (interior.map_batches(block_wmedian, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(keys).map_groups(
                residual_wmedian, batch_format="pyarrow")))


def grouped_topk(ds: "ray.data.Dataset", keys: list[str],
                 order_by: list[tuple[str, bool]], k: int
                 ) -> "ray.data.Dataset":
    """Top-k rows per key group (the window-function
    ``row_number() <= k`` shape) — one multi-key sort + vectorized
    per-block head-of-group selection + residual pass.

    order_by: [(col, descending)] — include a unique tiebreak column
    so boundary-of-k selection is deterministic (matches SQL
    row_number with the same ORDER BY)."""
    sort_spec = [(c, "ascending") for c in keys] + [
        (c, "descending" if desc else "ascending") for c, desc in order_by]
    srt = presort_coalesce(ds).sort(
        [c for c, _ in sort_spec],
        descending=[d == "descending" for _, d in sort_spec]).materialize()

    def interior(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.filter(pa.array(~edge_key_mask(b, keys)))

    def edge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.filter(pa.array(edge_key_mask(b, keys)))

    def head_k(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b
        starts, ends = group_bounds(b, keys)
        sizes = ends - starts
        take_n = np.minimum(sizes, k)
        idx = np.repeat(starts, take_n) + _ramp(take_n)
        return b.take(pa.array(idx))

    def residual_head(g: pa.Table) -> pa.Table:
        return head_k(g.sort_by(sort_spec))

    return (srt.map_batches(interior, batch_format="pyarrow",
                            batch_size=None)
            .map_batches(head_k, batch_format="pyarrow", batch_size=None)
            .union(srt.map_batches(edge, batch_format="pyarrow",
                                   batch_size=None)
                   .groupby(keys).map_groups(residual_head,
                                             batch_format="pyarrow")))


def _ramp(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for a counts vector (vectorized)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(np.concatenate(([0], np.cumsum(counts[:-1]))), counts)
    return out


# ----------------------------------------------------------------------
# First-wins canonical marking (exact dedup)
# ----------------------------------------------------------------------

def _batch_mark_canonical(b: pa.Table, key_col: str, id_col: str) -> pa.Table:
    """Sorted by [key_col, id_col]: each group's first row is canonical."""
    n = b.num_rows
    if n == 0:
        return (b.append_column("canonical_id", b.column(id_col))
                 .append_column("is_dup", pa.array([], pa.bool_())))
    starts, ends = group_bounds(b, [key_col])
    sizes = ends - starts
    canon_idx = np.repeat(starts, sizes)
    canonical = b.column(id_col).take(pa.array(canon_idx))
    is_dup = np.arange(n, dtype=np.int64) != canon_idx
    return (b.append_column("canonical_id", canonical)
             .append_column("is_dup", pa.array(is_dup)))


def mark_canonical(ds: "ray.data.Dataset", key_col: str,
                   id_col: str = "doc_id") -> "ray.data.Dataset":
    """Append (canonical_id, is_dup): canonical = min(id) per key group
    — the reference's first-occurrence-wins fingerprint-index semantics
    (src/dedup.c:135-173) as one sort shuffle + vectorized marking."""
    interior, edge = sorted_split(ds, [key_col, id_col], [key_col])

    def interior_mark(b: pa.Table) -> pa.Table:
        return _batch_mark_canonical(b, key_col, id_col)

    def residual_mark(g: pa.Table) -> pa.Table:
        # arrow-native so list<uint64> payload columns round-trip
        canon = pc.min(g.column(id_col))
        canon_arr = pa.array([canon.as_py()] * g.num_rows,
                             g.schema.field(id_col).type)
        is_dup = pc.not_equal(g.column(id_col), canon)
        return (g.append_column("canonical_id", canon_arr)
                 .append_column("is_dup", is_dup))

    return (interior.map_batches(interior_mark, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                residual_mark, batch_format="pyarrow")))
