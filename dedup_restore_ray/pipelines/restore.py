"""Restore / reconstruction: duplicate-aware storage -> full corpus.

The reference's restore engine reads a recipe (ordered chunk refs),
groups refs by container so each container is read once, and scatters
bytes into ordered assembly buffers (reference: src/look_ahead.c:710-840,
R1-R3 in SURVEY §2.5).  The Ray formulation:

  recipe   = assignments (doc_id -> canonical_id)      [one row per doc]
  container= canonical text store (canonical_id -> text)
  restore  = join recipe x store on canonical_id, reorder by doc_id

The join IS the 'group by container, read once' optimization: hash
partitioning brings every reference to a canonical together with its
single stored copy, so each stored row is fetched once per partition —
the exact analogue of the look-ahead window's container grouping.

Strategies:
  - broadcast: canonical store shipped once via ray.put (small store);
  - sort: the sort-scatter machinery of stages/groups.py (store rows
    and reference rows co-sorted on canonical_id) — fully distributed.

Invariant (the reference's restored-bytes check,
src/look_ahead.c:204-215): restored text is byte-identical to the
original for every doc (verified in tests via content hashes).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from dedup_restore_ray.stages.groups import group_bounds, sorted_split


def canonical_store(docs: "ray.data.Dataset", assignments: "ray.data.Dataset",
                    id_col: str = "doc_id", text_col: str = "text",
                    broadcast_limit: int | None = None
                    ) -> "ray.data.Dataset":
    """The deduplicated store: text of canonical docs only (the
    'containers' — unique content, stored once).

    Scale-gated on the canonical count (cfg.broadcast_limit default):

    - small store: canonical membership is broadcast as a packed
      sorted uint64 id-hash array (zero-copy from the object store; a
      Python set would fully unpickle in every task) and tested with
      one vectorized searchsorted per batch — same pattern as the
      canonical filter in pipelines/dedup.py;
    - beyond the gate: NO driver-side pack (at 10^9 canonicals the
      packed array is 8 GB driver-resident) — a sort-scatter semi
      join (stages/cluster._scatter_lookup) keeps exactly the docs
      whose id appears among the non-dup assignment rows, fully
      distributed."""
    import pyarrow.compute as pc

    if broadcast_limit is None:
        from dedup_restore_ray.config import PipelineConfig
        broadcast_limit = PipelineConfig().broadcast_limit

    def count_canon(b: pa.Table) -> pa.Table:
        dup = pc.sum(pc.cast(b.column("is_dup"), pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([b.num_rows - dup], pa.int64())})

    n_canon = assignments.map_batches(
        count_canon, batch_format="pyarrow").sum("n") or 0

    if n_canon > broadcast_limit:
        return _canonical_store_scatter(docs, assignments, id_col,
                                        text_col)

    from dedup_restore_ray.stages.verify import _id_hashes
    canon_parts = []
    for b in assignments.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
        keep = pc.invert(b.column("is_dup").combine_chunks())
        canon_parts.append(_id_hashes(b.filter(keep).column("doc_id")))
    canon_hashes = (np.sort(np.concatenate(canon_parts)) if canon_parts
                    else np.empty(0, np.uint64))
    ref = ray.put(canon_hashes)

    def filt(batch: pa.Table) -> pa.Table:
        ch = ray.get(ref)
        ih = _id_hashes(batch.column(id_col))
        pos = np.searchsorted(ch, ih)
        pos[pos == len(ch)] = max(len(ch) - 1, 0)
        mask = (ch[pos] == ih) if len(ch) else np.zeros(len(ih), bool)
        out = batch.filter(pa.array(mask)).select([id_col, text_col])
        return out.rename_columns(["canonical_id", "stored_text"])

    return docs.map_batches(filt, batch_format="pyarrow")


def _canonical_store_scatter(docs: "ray.data.Dataset",
                             assignments: "ray.data.Dataset",
                             id_col: str, text_col: str
                             ) -> "ray.data.Dataset":
    """Distributed canonical-store derivation: semi join of docs
    against the non-dup assignment keys via ONE sort-scatter — no
    driver-resident id pack, no iter_batches on the driver."""
    from dedup_restore_ray.stages.cluster import _scatter_lookup

    def canon_keys(b: pa.Table) -> pa.Table:
        keep = pc.invert(b.column("is_dup").combine_chunks())
        sel = b.filter(keep)
        return pa.table({
            id_col: sel.column("doc_id"),
            "__m": pa.array(np.zeros(sel.num_rows, np.int8), pa.int8())})

    keys = assignments.map_batches(canon_keys, batch_format="pyarrow")
    hits = _scatter_lookup(docs.select_columns([id_col, text_col]),
                           keys, key_col=id_col, payload_col="__m",
                           out_cols=[id_col, text_col])

    def finish(b: pa.Table) -> pa.Table:
        return (b.select([id_col, text_col])
                .rename_columns(["canonical_id", "stored_text"]))

    return hits.map_batches(finish, batch_format="pyarrow")


def windowed_restore(assignments: "ray.data.Dataset",
                     store: "ray.data.Dataset",
                     window_size: int = 1024,
                     order_cols: tuple = ("doc_id",)) -> dict:
    """Look-ahead-window restore (reference R1-R3/R5:
    src/look_ahead.c:710-840): stream the recipe in windows of
    ``window_size`` ordered refs; per window, group refs by canonical
    so each stored row ('container') is fetched ONCE per window, then
    scatter texts back into recipe order.

    Returns the reference's restore-efficiency counters
    (src/optsmr.c:319-324): total_container_read (stored-row fetches,
    the quantity the whole LAW/FAA apparatus minimizes — it shrinks as
    window_size grows), restored_rows, restored_bytes, plus a content
    hash of the restored stream for byte-identity checks.

    On Ray the window is the unit of driver-side batching; the
    per-window gather itself is a broadcast lookup against the store
    (small side).  This operator exists for parity with the
    reference's windowed restore (R5-R12) — the one-shot
    ``restore_corpus`` is the production path, where the groupby makes
    every container read exactly once for the WHOLE job (the
    window_size -> infinity limit).
    """
    import hashlib
    texts: dict = {}
    for b in store.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for c, t in zip(b.column("canonical_id").to_pylist(),
                        b.column("stored_text").to_pylist()):
            texts[c] = t
    total_container_read = 0
    restored_rows = 0
    restored_bytes = 0
    digest = hashlib.sha1()
    merkle = hashlib.sha1()
    ordered = assignments.sort(list(order_cols))
    for win in ordered.iter_batches(batch_size=window_size,
                                    batch_format="pyarrow"):
        win_digest = hashlib.sha1()
        refs = win.column("canonical_id").to_pylist()
        # group refs by container: one fetch per distinct canonical.
        # A canonical missing from the store is a store/recipe
        # inconsistency — fail loudly (the reference's restore depends
        # hard on container reads succeeding, src/look_ahead.c:374-443)
        window_cache = {}
        for c in refs:
            if c not in window_cache:
                if c not in texts:
                    raise KeyError(
                        f"canonical_id {c!r} referenced by recipe is "
                        f"absent from the store (windowed_restore)")
                window_cache[c] = texts[c]
                total_container_read += 1
        for c in refs:
            t = window_cache[c]
            restored_rows += 1
            restored_bytes += len(t)
            digest.update(t.encode())
            digest.update(b"\x00")
            win_digest.update(t.encode())
            win_digest.update(b"\x00")
        merkle.update(win_digest.hexdigest().encode())
    return {
        "total_container_read": total_container_read,
        "restored_rows": restored_rows,
        "restored_bytes": restored_bytes,
        "window_size": window_size,
        "restored_sha1": digest.hexdigest(),
        # per-window digest chain — comparable across the driver and
        # distributed formulations (same windows -> same merkle)
        "restored_merkle": merkle.hexdigest(),
    }


def _window_ids(srt: "ray.data.Dataset", order_cols: tuple,
                window_size: int) -> "ray.data.Dataset":
    """Append ``window_id = global_rank // window_size`` to a SORTED,
    MATERIALIZED dataset — distributed and exact, with only
    O(num_blocks) driver state.

    Two block-aligned passes over the same materialized blocks: pass 1
    collects each block's (first order-key, row count); because the
    sort's range partitioning makes block first-keys ascend with block
    position (and the leading order column is unique per row), sorting
    those first-keys on the driver recovers the block order and a
    cumulative sum gives each block's global offset.  Pass 2 broadcasts
    the tiny {first_key: offset} map and stamps ranks per block."""
    import ray as _ray

    def block_meta(b: pa.Table) -> pa.Table:
        cols = {"key": pa.array(
            ["\x1f".join(str(b.column(c)[0].as_py()) for c in order_cols)]
            if b.num_rows else [], pa.string()),
            "n": pa.array([b.num_rows] if b.num_rows else [], pa.int64())}
        for i, c in enumerate(order_cols):
            cols[f"k{i}"] = b.column(c).slice(0, 1 if b.num_rows else 0)
        return pa.table(cols)

    metas = srt.map_batches(block_meta, batch_format="pyarrow",
                            batch_size=None).take_all()
    # the dataset is globally sorted, so ordering blocks by their
    # first-row ORDER-COLUMN VALUES (not the string form) recovers
    # block order; cumulative sum gives each block's global offset
    metas.sort(key=lambda m: tuple(m[f"k{i}"]
                                   for i in range(len(order_cols))))
    offsets = {}
    acc = 0
    for m in metas:
        offsets[m["key"]] = acc
        acc += m["n"]
    off_ref = _ray.put(offsets)

    def stamp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("window_id", pa.array([], pa.int64()))
        omap = _ray.get(off_ref)
        key = "\x1f".join(str(b.column(c)[0].as_py()) for c in order_cols)
        start = omap[key]
        wid = (start + np.arange(b.num_rows, dtype=np.int64)) // window_size
        return b.append_column("window_id", pa.array(wid))

    return srt.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def windowed_restore_distributed(assignments: "ray.data.Dataset",
                                 store: "ray.data.Dataset",
                                 window_size: int = 1024,
                                 order_cols: tuple = ("doc_id",)) -> dict:
    """The reference's windowed restore (R5-R12, src/look_ahead.c:
    310-840) lifted fully off the driver: NO driver-resident store
    dict, no per-ref Python loop.

    - windows = contiguous ``window_size`` runs of the recipe in
      (order_cols) order, assigned distributively (``_window_ids``);
    - texts are gathered by ONE sort-scatter against the store
      (stages/cluster._scatter_lookup) — the per-window grouped gather
      of construct_restore_table/restore_from_table;
    - ALL counters come out of the single per-window digest pass:
      ``total_container_read`` = sum over windows of distinct
      canonicals in the window (identically the distinct
      (window_id, canonical_id) count — each stored row fetched once
      per window it appears in), plus restored_rows / restored_bytes —
      no extra shuffle or count barrier per counter;
    - byte-identity: ``restored_merkle`` = sha1 over per-window
      ordered digests (windows digested distributively, combined on
      the driver in window order) — parity-tested against the driver
      version's identical merkle.

    Raises on canonicals missing from the store (store/recipe
    inconsistency), like every restore path here.
    """
    import hashlib

    from dedup_restore_ray.stages.cluster import _scatter_lookup
    from dedup_restore_ray.stages.groups import presort_coalesce

    refs = presort_coalesce(assignments.select_columns(
        [*order_cols, "canonical_id"])).sort(list(order_cols)).materialize()
    n_refs = refs.count()
    if n_refs == 0:
        return {"total_container_read": 0, "restored_rows": 0,
                "restored_bytes": 0, "window_size": window_size,
                "restored_merkle": hashlib.sha1(b"").hexdigest()}
    refs_w = _window_ids(refs, order_cols, window_size)

    gathered = _scatter_lookup(
        refs_w, store, key_col="canonical_id", payload_col="stored_text",
        out_cols=["window_id", "canonical_id", *order_cols])

    # per-window ordered digests + counters in ONE pass (few windows
    # per block; the inner loop is C-speed sha1 over the window's texts)
    def digest_block(b: pa.Table) -> pa.Table:
        empty = pa.table({"window_id": pa.array([], pa.int64()),
                          "digest": pa.array([], pa.string()),
                          "n_rows": pa.array([], pa.int64()),
                          "n_bytes": pa.array([], pa.int64()),
                          "n_containers": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        starts, ends = group_bounds(b, ["window_id"])
        texts = b.column("stored_text").to_pylist()
        canon = b.column("canonical_id")
        wids, digs, nrows, nbytes, ncont = [], [], [], [], []
        for s, e in zip(starts, ends):
            h = hashlib.sha1()
            wb = 0
            for t in texts[s:e]:
                t = t or ""
                wb += len(t)   # characters, matching the driver
                h.update(t.encode())   # version's len(t) counter
                h.update(b"\x00")
            wids.append(b.column("window_id")[int(s)].as_py())
            digs.append(h.hexdigest())
            nrows.append(int(e - s))
            nbytes.append(wb)
            ncont.append(len(pc.unique(canon.slice(int(s), int(e - s)))))
        return pa.table({"window_id": pa.array(wids, pa.int64()),
                         "digest": pa.array(digs, pa.string()),
                         "n_rows": pa.array(nrows, pa.int64()),
                         "n_bytes": pa.array(nbytes, pa.int64()),
                         "n_containers": pa.array(ncont, pa.int64())})

    interior, edge = sorted_split(gathered,
                                  ["window_id", *order_cols],
                                  ["window_id"])
    dig_rows = (interior.map_batches(digest_block, batch_format="pyarrow",
                                     batch_size=None)
                .union(edge.groupby("window_id").map_groups(
                    lambda g: digest_block(g.sort_by(
                        [("window_id", "ascending")]
                        + [(c, "ascending") for c in order_cols])),
                    batch_format="pyarrow"))).take_all()
    restored_rows = sum(r["n_rows"] for r in dig_rows)
    if restored_rows != n_refs:
        raise KeyError(
            f"{n_refs - restored_rows} recipe refs point at canonicals "
            f"absent from the store (windowed_restore_distributed)")
    merkle = hashlib.sha1()
    for r in sorted(dig_rows, key=lambda r: r["window_id"]):
        merkle.update(r["digest"].encode())
    return {
        "total_container_read": int(sum(r["n_containers"]
                                        for r in dig_rows)),
        "restored_rows": int(restored_rows),
        "restored_bytes": int(sum(r["n_bytes"] for r in dig_rows)),
        "window_size": window_size,
        "restored_merkle": merkle.hexdigest(),
    }


class CachedWindowGather:
    """Actor for the container-cache restore variants (reference
    R8-R11, src/look_ahead.c:460-701): an LRU of stored rows persists
    ACROSS windows, so a canonical reused in a later window costs no
    new container read while cached.

    Deployed as ``map_batches(CachedWindowGather, concurrency=1)``
    over window-ordered refs for reference-faithful (single-stream)
    counters; with concurrency > 1 each actor models one restore
    stream and the counters sum across streams (scheduling-dependent,
    like any multi-worker cache)."""

    def __init__(self, cache_size: int):
        import collections
        self.cache: "collections.OrderedDict" = collections.OrderedDict()
        self.cache_size = cache_size
        self.container_read = 0
        self.cache_hit = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedup_restore_ray.stages.verify import _id_hashes
        ch = _id_hashes(batch.column("canonical_id"))
        for h in ch.tolist():
            if h in self.cache:
                self.cache_hit += 1
                self.cache.move_to_end(h)
            else:
                self.container_read += 1
                self.cache[h] = True
                if len(self.cache) > self.cache_size:
                    self.cache.popitem(last=False)
        return pa.table({
            "container_read": pa.array([self.container_read], pa.int64()),
            "cache_hit": pa.array([self.cache_hit], pa.int64())})


def windowed_restore_cached(assignments: "ray.data.Dataset",
                            store: "ray.data.Dataset",
                            cache_size: int = 30,
                            order_cols: tuple = ("doc_id",)) -> dict:
    """Container-cache counters for the windowed restore (reference
    R8-R11): stream the recipe in order through an actor-held LRU of
    ``cache_size`` stored rows; a read is counted only on cache miss.
    cache_size -> infinity reproduces the one-shot restore (every
    container read exactly once); cache_size = 0 degenerates to one
    read per ref (regular_assemble, src/look_ahead.c:149-179).

    SERIAL BY CONTRACT (``concurrency=1``): an LRU's hit sequence is
    only defined over one ordered stream, so this is a counters model
    for reference parity, not a restore path — production restores go
    through ``windowed_restore_distributed``, which computes the same
    counter totals distributively."""
    from dedup_restore_ray.stages.groups import presort_coalesce
    refs = presort_coalesce(assignments.select_columns(
        [*order_cols, "canonical_id"])).sort(list(order_cols))
    rows = refs.map_batches(
        CachedWindowGather, batch_format="pyarrow",
        concurrency=1,
        fn_constructor_args=(cache_size,)).take_all()
    # the actor's counters are cumulative; the last row has the totals
    return {
        "total_container_read": max((r["container_read"] for r in rows),
                                    default=0),
        "cache_hit": max((r["cache_hit"] for r in rows), default=0),
        "cache_size": cache_size,
    }


class ChunkCachedWindowGather:
    """Chunk-cache counters with the e/p split (reference R9/R11,
    src/chunk_cache.c:131-527 + src/look_ahead.c:310-443
    ``restore_assemble_buf_write``): the LRU is divided by a separation
    pointer (``s_ptr``) into **e-chunks** — known future reuse inside
    the current look-ahead window, kept at the MRU head — and
    **p-chunks** — no known reuse, parked in a probationary region that
    evictions drain FIRST (only when the p region is empty does the e
    region lose its LRU tail).  The future-reuse predicate is the
    reference's ``chunk_used_again_in_window`` (src/look_ahead.c:83-99):
    does the same chunk appear again among the window's remaining refs?

    ``pcache_size`` (the p-region population, src/chunk_cache.c:510-519)
    is the adaptivity signal the reference's controller reads
    (``current_pcache``, src/look_ahead.c:1204, src/trace_work.c:430):
    a large p cache means the window carries little known reuse and the
    look-ahead window should grow.

    Granularity note: this engine stores one text per canonical, so
    chunk == container here and the reference's 'prefetch sibling
    chunks of the read container' step has no analogue; the read path
    inserts the fetched row at the MRU head as an e-chunk, exactly as
    ``add_2_chunk_cache_head`` does (src/chunk_cache.c:131-183).

    Deployed as ``map_batches(..., batch_size=window_size,
    concurrency=1)`` over window-ordered refs, so each batch IS one
    look-ahead window — single-stream, reference-faithful counters
    (same contract as CachedWindowGather above)."""

    def __init__(self, cache_size: int):
        import collections
        # insertion end (last=True) = MRU side of each region; the
        # p region's insertion end models 'just after s_ptr'
        self.e: "collections.OrderedDict" = collections.OrderedDict()
        self.p: "collections.OrderedDict" = collections.OrderedDict()
        self.cache_size = cache_size
        self.container_read = 0
        self.cache_hit = 0
        self.pcache_max = 0

    def _evict(self) -> None:
        while len(self.e) + len(self.p) > self.cache_size:
            if self.p:                      # drain probationary first
                self.p.popitem(last=False)
            elif self.e:                    # s_ptr at tail: e loses LRU
                self.e.popitem(last=False)
            else:
                break

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedup_restore_ray.stages.verify import _id_hashes
        ch = _id_hashes(batch.column("canonical_id"))
        # chunk_used_again_in_window: position i has a LATER occurrence
        # of the same canonical within this window (consumed refs leave
        # the look-ahead table, so only later refs count)
        used_again = np.zeros(len(ch), bool)
        if len(ch) > 1:
            order = np.argsort(ch, kind="stable")
            sch = ch[order]
            used_again[order[:-1][sch[:-1] == sch[1:]]] = True
        for h, ua in zip(ch.tolist(), used_again.tolist()):
            if h in self.e or h in self.p:
                self.cache_hit += 1
                # move_2_chunk_cache_head / move_2_..._after_s_prt:
                # promote to e on known reuse, demote to p otherwise
                self.e.pop(h, None)
                self.p.pop(h, None)
                (self.e if ua else self.p)[h] = True
            else:
                self.container_read += 1     # cache_miss + container read
                self.e[h] = True             # read path -> MRU head, e
                self._evict()
        self.pcache_max = max(self.pcache_max, len(self.p))
        return pa.table({
            "container_read": pa.array([self.container_read], pa.int64()),
            "cache_hit": pa.array([self.cache_hit], pa.int64()),
            "e_num": pa.array([len(self.e)], pa.int64()),
            "p_num": pa.array([len(self.p)], pa.int64()),
            "p_max": pa.array([self.pcache_max], pa.int64())})


def windowed_restore_chunkcache(assignments: "ray.data.Dataset",
                                store: "ray.data.Dataset",
                                cache_size: int = 30,
                                window_size: int = 1024,
                                order_cols: tuple = ("doc_id",)) -> dict:
    """Windowed restore through the e/p-split chunk cache (reference
    R9/R11): refs stream in look-ahead windows of ``window_size``
    through an actor-held LRU whose probationary region is evicted
    first and whose e region holds rows with known in-window reuse.

    Limits (tested): cache_size=0 degenerates to one read per ref
    (``regular_assemble``, src/look_ahead.c:149-179); cache_size >=
    #canonicals reads each stored row exactly once (the one-shot
    restore).  Returns the reference's counter family
    (src/optsmr.c:319-324) plus the e/p occupancy signal."""
    from dedup_restore_ray.stages.groups import presort_coalesce
    refs = presort_coalesce(assignments.select_columns(
        [*order_cols, "canonical_id"])).sort(list(order_cols))
    rows = refs.map_batches(
        ChunkCachedWindowGather, batch_format="pyarrow",
        batch_size=window_size, concurrency=1,
        fn_constructor_args=(cache_size,)).take_all()
    reads = max((r["container_read"] for r in rows), default=0)
    hits = max((r["cache_hit"] for r in rows), default=0)
    last = max(rows, key=lambda r: r["container_read"] + r["cache_hit"],
               default=None)
    return {
        "total_container_read": reads,
        "cache_hit": hits,
        "cache_miss": reads,
        "ecache_size": last["e_num"] if last else 0,
        "pcache_size": last["p_num"] if last else 0,
        "pcache_max": max((r["p_max"] for r in rows), default=0),
        "cache_size": cache_size,
        "window_size": window_size,
    }


def windowed_restore_faa(assignments: "ray.data.Dataset",
                         store: "ray.data.Dataset",
                         window_size: int = 1024,
                         faa_windows: int = 8,
                         order_cols: tuple = ("doc_id",)) -> dict:
    """FAA multi-window scatter (reference R13, 'forward assembly
    area', src/adaptive_faa.c:266-462): keep ``faa_windows`` assembly
    buffers in flight and fill EVERY in-flight window's slots from one
    container read, so a canonical shared by several of those windows
    is fetched once per FAA group instead of once per window.

    Ray formulation: identical single sort-scatter + per-window digest
    kernel as ``windowed_restore_distributed``, with the container-read
    counter keyed on ``faa_group = window_id // faa_windows`` — the
    distinct (faa_group, canonical) count IS 'one read fills all
    in-flight windows'.  Byte-identity is unchanged: per-window digests
    (and so ``restored_merkle``) are invariant in ``faa_windows``,
    while ``total_container_read`` shrinks monotonically toward the
    one-shot limit (global distinct canonicals) as it grows.

    faa_windows=1 reproduces ``windowed_restore_distributed`` exactly.
    """
    import hashlib

    from dedup_restore_ray.stages.cluster import _scatter_lookup
    from dedup_restore_ray.stages.groups import presort_coalesce

    if faa_windows < 1:
        raise ValueError("faa_windows must be >= 1")
    refs = presort_coalesce(assignments.select_columns(
        [*order_cols, "canonical_id"])).sort(list(order_cols)).materialize()
    n_refs = refs.count()
    if n_refs == 0:
        return {"total_container_read": 0, "restored_rows": 0,
                "restored_bytes": 0, "window_size": window_size,
                "faa_windows": faa_windows,
                "restored_merkle": hashlib.sha1(b"").hexdigest()}
    refs_w = _window_ids(refs, order_cols, window_size)

    gathered = _scatter_lookup(
        refs_w, store, key_col="canonical_id", payload_col="stored_text",
        out_cols=["window_id", "canonical_id", *order_cols])

    faa = int(faa_windows)

    # per-window digest/rows/bytes + per-FAA-group distinct-canonical
    # counts in ONE pass (same kernel shape as digest_block above; the
    # group key for container reads is window_id // faa)
    def digest_block(b: pa.Table) -> pa.Table:
        empty = pa.table({"window_id": pa.array([], pa.int64()),
                          "digest": pa.array([], pa.string()),
                          "n_rows": pa.array([], pa.int64()),
                          "n_bytes": pa.array([], pa.int64()),
                          "n_containers": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        wid_np = np.asarray(b.column("window_id").combine_chunks())
        gid = wid_np // faa
        b = b.append_column("__faa_group", pa.array(gid, pa.int64()))
        starts, ends = group_bounds(b, ["window_id"])
        g_starts, g_ends = group_bounds(b, ["__faa_group"])
        texts = b.column("stored_text").to_pylist()
        canon = b.column("canonical_id")
        wids, digs, nrows, nbytes = [], [], [], []
        for s, e in zip(starts, ends):
            h = hashlib.sha1()
            wb = 0
            for t in texts[s:e]:
                t = t or ""
                wb += len(t)
                h.update(t.encode())
                h.update(b"\x00")
            wids.append(int(wid_np[int(s)]))
            digs.append(h.hexdigest())
            nrows.append(int(e - s))
            nbytes.append(wb)
        # container reads: distinct canonicals per FAA group — emitted
        # on the group's FIRST window row so totals sum once per group
        ncont = [0] * len(wids)
        wpos = 0
        for s, e in zip(g_starts, g_ends):
            while wpos < len(starts) and starts[wpos] < s:
                wpos += 1
            ncont[wpos] = len(pc.unique(canon.slice(int(s), int(e - s))))
        return pa.table({"window_id": pa.array(wids, pa.int64()),
                         "digest": pa.array(digs, pa.string()),
                         "n_rows": pa.array(nrows, pa.int64()),
                         "n_bytes": pa.array(nbytes, pa.int64()),
                         "n_containers": pa.array(ncont, pa.int64())})

    # FAA groups are the residual-pass unit: a group split across
    # blocks must be digested whole (same contract as sorted_split's
    # window_id split above, one level coarser)
    def with_group(b: pa.Table) -> pa.Table:
        wid_np = np.asarray(b.column("window_id").combine_chunks())
        return b.append_column("__g", pa.array(wid_np // faa, pa.int64()))

    grouped = gathered.map_batches(with_group, batch_format="pyarrow")
    interior, edge = sorted_split(grouped, ["__g", *order_cols], ["__g"])
    dig_rows = (interior.map_batches(digest_block, batch_format="pyarrow",
                                     batch_size=None)
                .union(edge.groupby("__g").map_groups(
                    lambda g: digest_block(g.sort_by(
                        [("__g", "ascending")]
                        + [(c, "ascending") for c in order_cols])),
                    batch_format="pyarrow"))).take_all()
    restored_rows = sum(r["n_rows"] for r in dig_rows)
    if restored_rows != n_refs:
        raise KeyError(
            f"{n_refs - restored_rows} recipe refs point at canonicals "
            f"absent from the store (windowed_restore_faa)")
    merkle = hashlib.sha1()
    for r in sorted(dig_rows, key=lambda r: r["window_id"]):
        merkle.update(r["digest"].encode())
    return {
        "total_container_read": int(sum(r["n_containers"]
                                        for r in dig_rows)),
        "restored_rows": int(restored_rows),
        "restored_bytes": int(sum(r["n_bytes"] for r in dig_rows)),
        "window_size": window_size,
        "faa_windows": faa_windows,
        "restored_merkle": merkle.hexdigest(),
    }


@dataclass
class AdaptiveState:
    """Controller state for the adaptive FAA/LAW re-split (reference
    R14, ``adaptive_faa_adjust`` src/adaptive_faa.c:158-263 + the
    re-split loop src/trace_work.c:744-830).  The invariant the
    reference maintains: ``faa + cache == mem`` — a FIXED memory
    budget of assembly-buffer slots is re-divided between in-flight
    FAA windows and chunk-cache capacity every step
    (``cache_change = 1 - faa_change``, src/trace_work.c:787-790);
    the look-ahead window length (``law``, in windows) moves
    independently inside [2*mem, 20*mem] (src/adaptive_faa.c:166-168).
    Thresholds are the reference's constants, parameterized where its
    values encode its 4 KiB-chunk scale (``p_threshold`` is its
    ``p_num < 512`` gate, src/adaptive_faa.c:259-262)."""
    mem: int                  # fixed budget: faa + cache (windows)
    faa: int                  # in-flight FAA windows
    law: int                  # look-ahead window length, in windows
    p_threshold: int = 512    # min pcache to justify extending law
    effective_faa: int = 0    # consecutive low-read windows
    effective_cache: int = 0  # consecutive high-read windows

    @property
    def cache(self) -> int:
        return self.mem - self.faa

    @property
    def faa_low(self) -> int:
        return 2

    @property
    def faa_high(self) -> int:
        return max(2, 5 * self.mem // 8)

    @property
    def law_low(self) -> int:
        return 2 * self.mem

    @property
    def law_high(self) -> int:
        return 20 * self.mem


def adaptive_adjust(st: AdaptiveState, reads_w: int, pcache_w: int) -> None:
    """One controller step after consuming a window (reference
    ``adaptive_faa_adjust``): container reads above the reference's
    effectiveness bar (>2 per window, src/adaptive_faa.c:169) mark the
    FAA ineffective and shift budget toward the cache; a long effective
    streak (> 6*faa windows, src/adaptive_faa.c:183) grows the FAA by
    2.  The look-ahead window extends by the reference's proportional
    step (law_high/70 - law/70, src/adaptive_faa.c:210-212) only while
    the probationary cache is populated (its ``p_num`` gate) — a large
    p cache means little known reuse, so more look-ahead is needed to
    find it.  Mutates ``st`` in place; the budget invariant
    ``faa + cache == mem`` holds on every exit path."""
    if reads_w > 2:
        st.effective_faa = 0
        st.effective_cache += 1
    else:
        st.effective_faa += 1
        st.effective_cache = 0

    if st.effective_faa > 6 * st.faa:
        # FAA effective: grow it (budget moves cache -> faa)
        if st.faa + 2 <= st.faa_high:
            st.faa += 2
        st.effective_faa = 0
    elif st.effective_cache > 0:
        # misses dominate: shrink FAA (budget moves faa -> cache),
        # and look further ahead if the p cache says reuse is sparse
        if st.faa - 1 >= st.faa_low:
            st.faa -= 1
        st.effective_cache = 0
        if pcache_w >= st.p_threshold:
            law_try = st.law_high // 70 - st.law // 70
            st.law = min(st.law + max(law_try, 0), st.law_high)
    st.faa = min(max(st.faa, st.faa_low), st.faa_high)
    st.law = min(max(st.law, st.law_low), st.law_high)


def adaptive_windowed_restore(assignments: "ray.data.Dataset",
                              store: "ray.data.Dataset",
                              window_size: int = 1024,
                              mem_windows: int = 32,
                              initial_faa: int = 8,
                              p_threshold: int | None = None,
                              order_cols: tuple = ("doc_id",)) -> dict:
    """Adaptive FAA restore (reference R14, src/adaptive_faa.c:158-263
    + src/trace_work.c:744-830): the fixed memory budget of
    ``mem_windows`` assembly-buffer slots is re-split between in-flight
    FAA windows and cache capacity as the recipe streams, driven by
    per-window container reads and the probationary-cache signal.

    Ray formulation — three bounded passes, no driver-resident store:

    1. ONE sort-scatter gather + per-window stats pass (digest, rows,
       bytes, distinct canonicals, singleton canonicals — the pcache
       proxy: a canonical seen once in its window has no known reuse,
       exactly the reference's p-chunk);
    2. a pure driver walk over the O(#windows) stat rows running the
       reference's controller (``adaptive_adjust``) to decide each
       window's FAA group — driver state is the controller struct plus
       one int per window;
    3. ONE distributed pass counting distinct (faa_group, canonical)
       under the DECIDED grouping — the exact container reads the
       multi-window scatter performs (R13 semantics per group).

    Byte-identity: per-window digests are grouping-independent, so
    ``restored_merkle`` equals ``windowed_restore_distributed``'s for
    the same window_size (tested).  Returns counters + the controller
    trajectory (faa/law per window) for the reference's
    ``look_ahead_log`` parity."""
    import hashlib

    from dedup_restore_ray.stages.cluster import _scatter_lookup
    from dedup_restore_ray.stages.groups import presort_coalesce

    refs = presort_coalesce(assignments.select_columns(
        [*order_cols, "canonical_id"])).sort(list(order_cols)).materialize()
    n_refs = refs.count()
    if n_refs == 0:
        return {"total_container_read": 0, "restored_rows": 0,
                "restored_bytes": 0, "window_size": window_size,
                "faa_trajectory": [], "law_trajectory": [],
                "restored_merkle": hashlib.sha1(b"").hexdigest()}
    refs_w = _window_ids(refs, order_cols, window_size)
    gathered = _scatter_lookup(
        refs_w, store, key_col="canonical_id", payload_col="stored_text",
        out_cols=["window_id", "canonical_id", *order_cols]).materialize()

    # ---- pass 1: per-window stats --------------------------------------
    def window_stats(b: pa.Table) -> pa.Table:
        empty = pa.table({"window_id": pa.array([], pa.int64()),
                          "digest": pa.array([], pa.string()),
                          "n_rows": pa.array([], pa.int64()),
                          "n_bytes": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64()),
                          "n_singleton": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        starts, ends = group_bounds(b, ["window_id"])
        texts = b.column("stored_text").to_pylist()
        canon = b.column("canonical_id")
        wids, digs, nrows, nbytes, ndis, nsing = [], [], [], [], [], []
        for s, e in zip(starts, ends):
            h = hashlib.sha1()
            wb = 0
            for t in texts[s:e]:
                t = t or ""
                wb += len(t)
                h.update(t.encode())
                h.update(b"\x00")
            vc = pc.value_counts(canon.slice(int(s), int(e - s)))
            wids.append(b.column("window_id")[int(s)].as_py())
            digs.append(h.hexdigest())
            nrows.append(int(e - s))
            nbytes.append(wb)
            ndis.append(len(vc))
            nsing.append(int(pc.sum(pc.equal(
                vc.field("counts"), pa.scalar(1))).as_py() or 0))
        return pa.table({"window_id": pa.array(wids, pa.int64()),
                         "digest": pa.array(digs, pa.string()),
                         "n_rows": pa.array(nrows, pa.int64()),
                         "n_bytes": pa.array(nbytes, pa.int64()),
                         "n_distinct": pa.array(ndis, pa.int64()),
                         "n_singleton": pa.array(nsing, pa.int64())})

    interior, edge = sorted_split(gathered, ["window_id", *order_cols],
                                  ["window_id"])
    stat_rows = (interior.map_batches(window_stats, batch_format="pyarrow",
                                      batch_size=None)
                 .union(edge.groupby("window_id").map_groups(
                     lambda g: window_stats(g.sort_by(
                         [("window_id", "ascending")]
                         + [(c, "ascending") for c in order_cols])),
                     batch_format="pyarrow"))).take_all()
    stat_rows.sort(key=lambda r: r["window_id"])
    restored_rows = sum(r["n_rows"] for r in stat_rows)
    if restored_rows != n_refs:
        raise KeyError(
            f"{n_refs - restored_rows} recipe refs point at canonicals "
            f"absent from the store (adaptive_windowed_restore)")

    # ---- pass 2: driver controller walk (O(#windows) state) ------------
    if p_threshold is None:
        p_threshold = 512
    st = AdaptiveState(mem=mem_windows,
                       faa=min(max(initial_faa, 2),
                               max(2, 5 * mem_windows // 8)),
                       law=2 * mem_windows, p_threshold=p_threshold)
    groups = np.empty(len(stat_rows), dtype=np.int64)
    faa_traj, law_traj = [], []
    gid = 0
    fill = 0
    for i, r in enumerate(stat_rows):
        groups[i] = gid
        fill += 1
        if fill >= st.faa:       # this FAA group of windows is full
            gid += 1
            fill = 0
        faa_traj.append(st.faa)
        law_traj.append(st.law)
        adaptive_adjust(st, r["n_distinct"], r["n_singleton"])

    # ---- pass 3: exact reads under the decided grouping ----------------
    wid_min = stat_rows[0]["window_id"]
    group_ref = ray.put(groups)

    def stamp_group(b: pa.Table) -> pa.Table:
        g = ray.get(group_ref)
        wid_np = np.asarray(b.column("window_id").combine_chunks())
        return b.append_column(
            "__g", pa.array(g[wid_np - wid_min], pa.int64()))

    def group_reads(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        starts, ends = group_bounds(b, ["__g"])
        canon = b.column("canonical_id")
        ns = [len(pc.unique(canon.slice(int(s), int(e - s))))
              for s, e in zip(starts, ends)]
        return pa.table({"n": pa.array(ns, pa.int64())})

    stamped = gathered.map_batches(stamp_group, batch_format="pyarrow")
    g_interior, g_edge = sorted_split(stamped, ["__g", "canonical_id"],
                                      ["__g"])
    reads = (g_interior.map_batches(group_reads, batch_format="pyarrow",
                                    batch_size=None)
             .union(g_edge.groupby("__g").map_groups(
                 lambda g: group_reads(g.sort_by(
                     [("__g", "ascending"),
                      ("canonical_id", "ascending")])),
                 batch_format="pyarrow"))).sum("n") or 0

    merkle = hashlib.sha1()
    for r in stat_rows:
        merkle.update(r["digest"].encode())
    return {
        "total_container_read": int(reads),
        "restored_rows": int(restored_rows),
        "restored_bytes": int(sum(r["n_bytes"] for r in stat_rows)),
        "window_size": window_size,
        "mem_windows": mem_windows,
        "faa_trajectory": faa_traj,
        "law_trajectory": law_traj,
        "restored_merkle": merkle.hexdigest(),
    }


def restore_corpus(assignments: "ray.data.Dataset",
                   store: "ray.data.Dataset",
                   strategy: str = "sort") -> "ray.data.Dataset":
    """(doc_id, canonical_id) x (canonical_id, stored_text) ->
    (doc_id, restored_text)."""
    if strategy == "broadcast":
        texts = {}
        for b in store.iter_batches(batch_size=8192, batch_format="pyarrow"):
            for k, t in zip(b.column("canonical_id").to_pylist(),
                            b.column("stored_text").to_pylist()):
                texts[k] = t
        ref = ray.put(texts)

        def gather(batch: pa.Table) -> pa.Table:
            tmap = ray.get(ref)
            refs_ = batch.column("canonical_id").to_pylist()
            missing = [c for c in refs_ if c not in tmap]
            if missing:
                raise KeyError(
                    f"{len(missing)} canonical ids referenced by the "
                    f"recipe are absent from the store (first: "
                    f"{missing[0]!r})")
            restored = [tmap[c] for c in refs_]
            return pa.table({"doc_id": batch.column("doc_id"),
                             "restored_text": pa.array(restored, pa.string())})

        return assignments.map_batches(gather, batch_format="pyarrow")

    if strategy == "sort":
        # sort-scatter: store rows (slot -1) lead each canonical group,
        # reference rows follow; one vectorized take replicates text.
        def store_rows(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "canonical_id": b.column("canonical_id"),
                "slot": pa.array(np.full(n, -1, np.int8)),
                "doc_id": b.column("canonical_id"),
                "text": b.column("stored_text"),
            })

        def ref_rows(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "canonical_id": b.column("canonical_id"),
                "slot": pa.array(np.zeros(n, np.int8)),
                "doc_id": b.column("doc_id"),
                "text": pa.array([None] * n, pa.string()),
            })

        rows = (store.map_batches(store_rows, batch_format="pyarrow")
                .union(assignments.select_columns(["doc_id", "canonical_id"])
                       .map_batches(ref_rows, batch_format="pyarrow")))

        def scatter(b: pa.Table) -> pa.Table:
            out_schema = pa.schema([
                ("doc_id", b.schema.field("doc_id").type),
                ("restored_text", pa.string())])
            n = b.num_rows
            if n == 0:
                return out_schema.empty_table()
            starts, ends = group_bounds(b, ["canonical_id"])
            sizes = ends - starts
            slot = np.asarray(b.column("slot"))
            has_store = slot[starts] == -1
            store_idx = np.repeat(starts, sizes)
            ref_mask = (slot >= 0) & np.repeat(has_store, sizes)
            # refs whose canonical group has no store row = store/
            # recipe inconsistency — fail loudly rather than dropping
            orphan = (slot >= 0) & ~np.repeat(has_store, sizes)
            if orphan.any():
                bad = b.column("canonical_id").take(
                    pa.array(np.flatnonzero(orphan)[:1]))[0].as_py()
                raise KeyError(
                    f"canonical_id {bad!r} referenced by recipe is "
                    f"absent from the store (restore_corpus sort path)")
            rr = np.flatnonzero(ref_mask)
            if len(rr) == 0:
                return out_schema.empty_table()
            return pa.table({
                "doc_id": b.column("doc_id").take(pa.array(rr)),
                "restored_text": b.column("text").take(
                    pa.array(store_idx[rr])),
            })

        interior, edge = sorted_split(rows, ["canonical_id", "slot"],
                                      ["canonical_id"])
        return (interior.map_batches(scatter, batch_format="pyarrow",
                                     batch_size=None)
                .union(edge.groupby("canonical_id").map_groups(
                    lambda g: scatter(g.sort_by(
                        [("canonical_id", "ascending"),
                         ("slot", "ascending")])),
                    batch_format="pyarrow")))

    raise ValueError(f"unknown strategy {strategy!r}")
