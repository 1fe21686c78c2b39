"""Candidate-pair generation: band expansion + bucket groupby with
explicit skew handling.

The LSH bucket shuffle replaces the reference's central fingerprint
index (SURVEY §2.3 L2/L5 → 'the tier collapses into the shuffle').
Band rows are (bucket_key, doc_id); a ``groupby(bucket_key)`` then
pairs members within each bucket.

Skew (north_rule: 'explicit salted-key skew splitting'): web corpora
have pathological buckets (boilerplate pages).  A bucket of size n
would emit O(n^2) pairs.  Strategy:
  - n <= max_bucket_pairs: all C(n,2) pairs (exact within bucket);
  - n  > max_bucket_pairs: *salted star+chain* pairing — members are
    split into ``num_salts`` deterministic sub-buckets; within each
    sub-bucket a chain (m_i, m_i+1) is emitted, and each sub-bucket's
    minimum member is paired to the bucket's global minimum (the star
    across salt boundaries).  This keeps every member transitively
    connected to the bucket minimum in O(n) pairs, which is sufficient
    for *clustering* (union-find closes the transitive hull); pairwise
    verification happens on these edges only.
All emitted pairs carry their source tag for metrics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.hashing import U64, combine64
from dedup_restore_ray.functions.lsh import band_keys
from dedup_restore_ray.functions.minhash import EMPTY_SIG
from dedup_restore_ray.functions.simhash import simhash_block_keys


class BandExpand:
    """signatures batch -> (bucket_key:uint64, doc_id) bucket rows.

    The union of candidate *sources* in one row stream (so ONE sort +
    pair chain serves them all):
      - minhash LSH bands (16 per doc) — near-dup candidates;
      - SimHash bands (hamming <= t pigeonhole guarantee), when
        ``use_simhash``;
      - winnowed substring fingerprints, when ``use_fingerprints``
        (the suffix-array pass's shuffle formulation);
      - the norm-hash rail, when ``use_norm`` — docs with identical
        normalized token streams share a bucket; their pairs verify at
        Jaccard exactly 1 (incl. the zero-shingle group), so the rail
        needs no separate edge stage.
    Each source's keys are mixed with a distinct tag so keyspaces never
    collide across sources.
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 use_simhash: bool = True, use_fingerprints: bool = True,
                 use_norm: bool = True, use_minhash: bool = True,
                 emit_id_hash: bool = False, minhash_bbits: int = 0):
        self.cfg = cfg or PipelineConfig()
        self.use_minhash = use_minhash
        # minhash_bbits > 0: band over only the LOW b bits of each
        # minhash value (b-bit minhash, Li & Koenig 2010).  Keys
        # collide whenever the full-value keys collide (masking is a
        # function of the value), so the candidate set is a SUPERSET
        # of the full-value rail's — recall never drops; the extra
        # false positives are killed by exact verify.  The win is the
        # PERSISTED signature footprint (128 x b bits vs 128 x 64 for
        # incremental/near-dup stores), not the bucket shuffle (keys
        # are 64-bit hashes either way).
        self.minhash_bbits = int(minhash_bbits)
        self.use_simhash = use_simhash
        self.use_fingerprints = use_fingerprints
        self.use_norm = use_norm
        from math import comb
        t = self.cfg.simhash_hamming_threshold
        self.n_simhash_bands = comb(6, 6 - t)   # Manku block-combo keys
        # emit_id_hash: the doc_id column carries the uint64 id hash
        # (stages/verify._id_hashes) instead of the raw id — the whole
        # bucket sort + pair + distinct chain then moves 16-byte
        # numeric rows instead of string payloads (the measured 4-CPU
        # scaling limiter for url-keyed corpora); callers resolve ids
        # at the chain boundary (see pairs.resolve_pair_ids)
        self.emit_id_hash = emit_id_hash

    def _ids(self, batch: pa.Table, n: int):
        """(id column as Arrow array, replicate fn(idx)->column)."""
        if self.emit_id_hash:
            from dedup_restore_ray.stages.verify import _id_hashes
            idh = _id_hashes(batch.column("doc_id"))
            return (lambda idx: pa.array(idh[idx], pa.uint64()))
        col = batch.column("doc_id").combine_chunks()
        return (lambda idx: col.take(pa.array(idx)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        if n == 0:
            id_arr = (pa.array([], pa.uint64()) if self.emit_id_hash
                      else batch.column("doc_id"))
            return pa.table({"bucket_key": pa.array([], pa.uint64()),
                             "doc_id": id_arr})
        replicate = self._ids(batch, n)
        if "bucket_keys" in batch.schema.names:
            # keys precomputed by SignatureStage(emit_bucket_keys=True)
            bk = batch.column("bucket_keys").combine_chunks()
            counts = np.diff(np.asarray(bk.offsets))
            idx = np.repeat(np.arange(n), counts)
            return pa.table({
                "bucket_key": pa.array(np.asarray(bk.flatten(),
                                                  dtype=U64), pa.uint64()),
                "doc_id": replicate(idx),
            })
        # minhash is optional when the caller only uses the simhash
        # rail (e.g. perceptual-hash image signatures): the sentinel
        # empty-doc mask then has no rows to flag
        mh = (np.asarray(batch.column("minhash").combine_chunks()
                         .flatten(), dtype=U64).reshape(n, cfg.num_perm)
              if "minhash" in batch.schema.names else None)
        keys, ids = [], []
        if self.use_minhash:
            if mh is None:
                raise ValueError(
                    "BandExpand: use_minhash=True but the signature "
                    "table has no 'minhash' column (simhash-only "
                    "tables must pass use_minhash=False)")
            mh_band = mh
            if self.minhash_bbits:
                # mask AFTER remembering empties: EMPTY_SIG rows must
                # keep their sentinel so band_keys uniquifies them
                empty = mh[:, 0] == EMPTY_SIG
                mh_band = mh & np.uint64(
                    (1 << self.minhash_bbits) - 1)
                mh_band[empty] = EMPTY_SIG
            bk = band_keys(mh_band, cfg.num_bands,
                           cfg.rows_per_band)  # [n, B]
            keys.append(bk.reshape(-1))
            ids.append(np.repeat(np.arange(n), cfg.num_bands))
        if self.use_simhash:
            sh = np.asarray(batch.column("simhash"), dtype=U64)
            sb = simhash_block_keys(sh, self.cfg.simhash_hamming_threshold)
            # tag simhash keyspace so it never collides with minhash keys
            sb = combine64(sb.reshape(-1), np.uint64(0x51))
            empty = ((mh[:, 0] == EMPTY_SIG) if mh is not None
                     else np.zeros(n, bool))
            sbm = sb.reshape(n, self.n_simhash_bands)
            if empty.any():
                # empty docs: make simhash keys unique too
                from dedup_restore_ray.functions.hashing import mix64
                uniq = mix64(np.flatnonzero(empty).astype(np.uint64))
                sbm[empty] = combine64(
                    np.repeat(uniq, self.n_simhash_bands).reshape(-1, self.n_simhash_bands),
                    np.uint64(7))
            keys.append(sbm.reshape(-1))
            ids.append(np.repeat(np.arange(n), self.n_simhash_bands))
        if self.use_fingerprints:
            fps = batch.column("fingerprints").combine_chunks()
            fp_flat = np.asarray(fps.flatten(), dtype=U64)
            counts = np.diff(np.asarray(fps.offsets))
            keys.append(combine64(fp_flat, np.uint64(0xF1)))
            ids.append(np.repeat(np.arange(n), counts))
        if self.use_norm:
            nh = batch.column("norm_hash").combine_chunks()
            # first 8 bytes of each fixed-binary(20) digest, straight
            # from the Arrow data buffer (no per-row bytes objects)
            from dedup_restore_ray.functions.similarity import (
                fixed_binary_to_matrix)
            nh64 = np.ascontiguousarray(
                fixed_binary_to_matrix(nh, 20)[:, :8]).view(U64).ravel()
            keys.append(combine64(nh64, np.uint64(0xA7)))
            ids.append(np.arange(n))
        key_arr = np.concatenate(keys)
        id_idx = np.concatenate(ids)
        return pa.table({"bucket_key": pa.array(key_arr, pa.uint64()),
                         "doc_id": replicate(id_idx)})


def resolve_pair_ids(pairs: "ray.data.Dataset",
                     signatures: "ray.data.Dataset",
                     cfg: PipelineConfig | None = None,
                     id_col: str = "doc_id",
                     extra_cols: tuple = (),
                     n_ids_hint: int | None = None,
                     table_ref=None) -> "ray.data.Dataset":
    """(u, v) uint64 id-hash pairs -> (u, v) original ids (+extra_cols
    passthrough), re-canonicalized to u < v in the ORIGINAL id order.

    The hashed pair chain (BandExpand(emit_id_hash=True) -> bucket_pairs
    -> distinct_pairs) moves only 16-byte numeric rows through its
    sorts; this is the boundary that maps hashes back.  Two strategies:

      - broadcast (default below cfg.broadcast_limit ids): one driver
        pass over ``signatures`` builds (sorted id-hashes, ids) —
        ~12 bytes/id — broadcast once via ray.put; each pair batch
        resolves with two searchsorted+take gathers;
      - scatter (beyond the limit): two sort-scatter rendezvous
        (stages/cluster._scatter_lookup) keyed on the u64 hash.

    Hash identity: 64-bit id-hash equality is the engine's established
    id-identity convention (the packed verify and canonical filter
    already key on it; see stages/verify._id_hashes collision note).
    """
    import ray

    from dedup_restore_ray.stages.verify import _id_hashes

    cfg = cfg or PipelineConfig()
    extra_cols = list(extra_cols)
    if table_ref is None:
        n_ids = (n_ids_hint if n_ids_hint is not None
                 else signatures.count())
    else:
        n_ids = 0   # prebuilt broadcast table (ray.put((idh, ids)))
    if n_ids > cfg.broadcast_limit:
        from dedup_restore_ray.stages.cluster import _scatter_lookup

        def store_u(b: pa.Table) -> pa.Table:
            return pa.table({"__idh": pa.array(
                _id_hashes(b.column(id_col)), pa.uint64()),
                "__u": b.column(id_col)})

        def store_v(b: pa.Table) -> pa.Table:
            return pa.table({"__idh": pa.array(
                _id_hashes(b.column(id_col)), pa.uint64()),
                "__v": b.column(id_col)})

        sig_ids = signatures.select_columns([id_col])

        def key_on_u(b: pa.Table) -> pa.Table:
            return pa.table({"__idh": b.column("u"), "v": b.column("v"),
                             **{c: b.column(c) for c in extra_cols}})

        def key_on_v(b: pa.Table) -> pa.Table:
            return pa.table({"__idh": b.column("v"), "__u": b.column("__u"),
                             **{c: b.column(c) for c in extra_cols}})

        withu = _scatter_lookup(
            pairs.map_batches(key_on_u, batch_format="pyarrow"),
            sig_ids.map_batches(store_u, batch_format="pyarrow"),
            "__idh", "__u", ["v", *extra_cols])
        withv = _scatter_lookup(
            withu.map_batches(key_on_v, batch_format="pyarrow"),
            sig_ids.map_batches(store_v, batch_format="pyarrow"),
            "__idh", "__v", ["__u", *extra_cols])

        def canon(b: pa.Table) -> pa.Table:
            u, v = b.column("__u"), b.column("__v")
            cols = {"u": pc.min_element_wise(u, v),
                    "v": pc.max_element_wise(u, v)}
            for c in extra_cols:
                cols[c] = b.column(c)
            return pa.table(cols)

        return withv.map_batches(canon, batch_format="pyarrow")

    if table_ref is None:
        # broadcast: one small (hash-sorted ids) table
        idh_parts, id_parts = [], []
        for b in signatures.select_columns([id_col]).iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            idh_parts.append(_id_hashes(b.column(id_col)))
            id_parts.append(b.column(id_col).combine_chunks())
        if idh_parts:
            idh = np.concatenate(idh_parts)
            ids = pa.concat_arrays([p.combine_chunks() if isinstance(
                p, pa.ChunkedArray) else p for p in id_parts])
            order = np.argsort(idh, kind="stable")
            idh = idh[order]
            ids = ids.take(pa.array(order))
        else:
            idh = np.empty(0, np.uint64)
            ids = pa.array([], pa.string())
        table_ref = ray.put((idh, ids))

    def resolve(b: pa.Table) -> pa.Table:
        h_sorted, id_arr = ray.get(table_ref)
        n = b.num_rows
        if n == 0:
            cols = {"u": id_arr.slice(0, 0), "v": id_arr.slice(0, 0)}
            for c in extra_cols:
                cols[c] = b.column(c)
            return pa.table(cols)
        uh = np.asarray(b.column("u").combine_chunks())
        vh = np.asarray(b.column("v").combine_chunks())
        m = len(h_sorted)
        pu = np.minimum(np.searchsorted(h_sorted, uh), max(m - 1, 0))
        pv = np.minimum(np.searchsorted(h_sorted, vh), max(m - 1, 0))
        if m == 0 or not (np.all(h_sorted[pu] == uh)
                          and np.all(h_sorted[pv] == vh)):
            raise ValueError("resolve_pair_ids: pair member missing "
                             "from the id table")
        u = id_arr.take(pa.array(pu))
        v = id_arr.take(pa.array(pv))
        cols = {"u": pc.min_element_wise(u, v),
                "v": pc.max_element_wise(u, v)}
        for c in extra_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    return pairs.map_batches(resolve, batch_format="pyarrow")


def resolve_pair_ids_member(pairs: "ray.data.Dataset",
                            signatures: "ray.data.Dataset",
                            cfg: PipelineConfig | None = None,
                            id_col: str = "doc_id",
                            extra_cols: tuple = ()) -> "ray.data.Dataset":
    """Hash->id resolution for a SMALL pair set against a LARGE corpus
    (e.g. the verified subset in scale mode): instead of scatter-joining
    against the full id store (two shuffles over n_docs rows), collect
    the pair MEMBER hashes (O(pairs) driver memory), filter the
    signature stream to members in one shuffle-free pass, and resolve
    with the resulting small broadcast table."""
    import ray

    from dedup_restore_ray.stages.verify import _id_hashes

    cfg = cfg or PipelineConfig()
    pairs = pairs.materialize()
    mh: list[np.ndarray] = []
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        mh.append(np.asarray(b.column("u").combine_chunks()))
        mh.append(np.asarray(b.column("v").combine_chunks()))
    members = (np.unique(np.concatenate(mh)) if mh
               else np.empty(0, np.uint64))
    member_ref = ray.put(members)

    def member_rows(b: pa.Table) -> pa.Table:
        mem = ray.get(member_ref)
        ih = _id_hashes(b.column(id_col))
        pos = np.searchsorted(mem, ih)
        pos[pos == len(mem)] = max(len(mem) - 1, 0)
        mask = (mem[pos] == ih) if len(mem) else np.zeros(len(ih), bool)
        sel = b.filter(pa.array(mask))
        return pa.table({"__idh": pa.array(ih[mask], pa.uint64()),
                         "__id": sel.column(id_col)})

    idh_parts, id_parts = [], []
    for b in signatures.select_columns([id_col]).map_batches(
            member_rows, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        idh_parts.append(np.asarray(b.column("__idh").combine_chunks()))
        id_parts.append(b.column("__id").combine_chunks())
    if idh_parts:
        idh = np.concatenate(idh_parts)
        ids = pa.concat_arrays(id_parts)
        order = np.argsort(idh, kind="stable")
        table_ref = ray.put((idh[order], ids.take(pa.array(order))))
    else:
        table_ref = ray.put((np.empty(0, np.uint64),
                             pa.array([], pa.string())))
    return resolve_pair_ids(pairs, signatures, cfg, id_col=id_col,
                            extra_cols=extra_cols, table_ref=table_ref)


def candidate_pairs(signatures: "ray.data.Dataset",
                    cfg: PipelineConfig | None = None,
                    use_simhash: bool = True,
                    use_fingerprints: bool = False,
                    use_norm: bool = False,
                    use_minhash: bool = True,
                    ids: str = "resolve",
                    minhash_bbits: int = 0) -> "ray.data.Dataset":
    """signatures -> distinct candidate (u, v) pairs, u < v.

    Band expansion (map_batches) feeds the sort-based vectorized bucket
    pairing of stages/groups.py — one sort shuffle over the band rows,
    block-level pair kernels, residual pass for boundary groups, then a
    hash-keyed distinct.  The WHOLE chain runs on uint64 id hashes —
    bucket rows and pair rows are 16-byte numeric, never strings (the
    string payload was the measured 4-CPU scaling limiter: a 59s
    combiner at 500k url-keyed docs).

    ids: "resolve" (default) maps hashes back to original ids at the
    boundary (broadcast table or sort-scatter beyond
    cfg.broadcast_limit); "hashed" returns the raw uint64 pairs for
    callers that verify/cluster on hashes and resolve later (the
    flagship resolves only the verified subset)."""
    cfg = cfg or PipelineConfig()
    from dedup_restore_ray.stages.groups import bucket_pairs
    bands = signatures.map_batches(
        BandExpand(cfg, use_simhash=use_simhash,
                   use_fingerprints=use_fingerprints, use_norm=use_norm,
                   use_minhash=use_minhash, emit_id_hash=True,
                   minhash_bbits=minhash_bbits),
        batch_format="pyarrow")
    pairs = bucket_pairs(bands, cfg.max_bucket_pairs, cfg.num_salts)
    if ids == "hashed":
        return pairs
    return resolve_pair_ids(pairs, signatures, cfg)
