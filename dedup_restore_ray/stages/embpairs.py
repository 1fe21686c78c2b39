"""Embedding near-duplicate pair generation — scale-safe formulations.

Two paths, neither of which broadcasts the corpus:

- ``cosine_pairs_blockwise`` (exact): the self-cross-product is
  decomposed into block pairs; one Ray task per (block_i, block_j)
  matmuls the two blocks from the object store.  O(n^2) WORK (it is
  the exact answer) but fully distributed: the driver holds only
  block refs, no task sees more than two blocks.  This is the one
  place the Dataset API genuinely can't express the semantics
  (a self-join on no key), so raw Ray tasks are used.
- ``hyperplane_lsh_pairs`` (approximate, the 100-TB path): sign-random-
  projection sketches (SimHash for vectors — Charikar 2002) banded
  into buckets; candidate pairs via the same salted bucket_pairs
  stream as text LSH; exact-cosine verification attaches each side's
  vector by sort-scatter (stages/cluster._scatter_lookup) — again no
  broadcast of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.similarity import (l2_normalize,
                                                    list_to_matrix)


@ray.remote
def _block_pair_task(ti: pa.Table, tj: pa.Table, same: bool,
                     threshold: float, id_col: str,
                     vec_col: str) -> pa.Table:
    ids_i = np.asarray(ti.column(id_col))
    ids_j = np.asarray(tj.column(id_col))
    vi = l2_normalize(list_to_matrix(ti.column(vec_col)))
    vj = l2_normalize(list_to_matrix(tj.column(vec_col)))
    s = vi @ vj.T
    bi, bj = np.nonzero(s >= threshold)
    a, b, sc = ids_i[bi], ids_j[bj], s[bi, bj]
    if same:
        # both orientations are present in the score matrix — keep one
        keep = a < b
        u, v = a[keep], b[keep]
        sc = sc[keep]
    else:
        # each unordered cross pair appears exactly once (i < j tasks
        # only) — normalize the orientation, drop accidental id ties
        keep = a != b
        a, b, sc = a[keep], b[keep], sc[keep]
        u = np.minimum(a, b)
        v = np.maximum(a, b)
    return pa.table({"u": pa.array(u, pa.int64()),
                     "v": pa.array(v, pa.int64()),
                     "cosine": pa.array(sc, pa.float64())})


def cosine_pairs_blockwise(emb: "rd.Dataset", threshold: float,
                           num_blocks: int | None = None,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> "rd.Dataset":
    """All (u < v) pairs with cosine >= threshold — exact, distributed
    block-cross-product (no whole-corpus broadcast)."""
    if num_blocks:
        emb = emb.repartition(num_blocks)
    refs = emb.select_columns([id_col, vec_col]).to_arrow_refs()
    tasks = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            tasks.append(_block_pair_task.remote(
                refs[i], refs[j], i == j, threshold, id_col, vec_col))
    if not tasks:
        return rd.from_arrow(pa.table({
            "u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    return rd.from_arrow_refs(tasks)


_NN_ID_BITS = 41
_NN_ID_MASK = (1 << _NN_ID_BITS) - 1


@ray.remote
def _block_nn_task(ta: pa.Table, tb: pa.Table, id_col: str,
                   vec_col: str) -> pa.Table:
    """Per-(block_a, block_b) partial nearest neighbors, BOTH
    directions from one matmul.  Cosines quantize to 1e-4 units
    (half away from zero, DuckDB round parity) BEFORE the argmax so
    the winner — ties broken by the smaller candidate id — is integer
    math the SQL oracle reproduces.  Emits one packed
    ((e4 + 10000) << 41 | ~other_id) candidate row per (side, id);
    the cross-block grouped MAX of the pack IS the argmax."""
    ids_a = np.asarray(ta.column(id_col), dtype=np.int64)
    ids_b = np.asarray(tb.column(id_col), dtype=np.int64)
    if len(ids_a) == 0 or len(ids_b) == 0:
        e = pa.array([], pa.int64())
        return pa.table({"side": e, "id": e, "pack": e})
    if (max(ids_a.max(), ids_b.max()) >= _NN_ID_MASK
            or min(ids_a.min(), ids_b.min()) < 0):
        raise ValueError("mutual_nn: vec ids outside the 41-bit "
                         "pack range [0, 2^41 - 1)")
    va = l2_normalize(list_to_matrix(ta.column(vec_col)))
    vb = l2_normalize(list_to_matrix(tb.column(vec_col)))
    s = va @ vb.T
    e4 = (np.sign(s) * np.floor(np.abs(s) * 10000.0 + 0.5)).astype(
        np.int64)

    def best(rows_e4, other_ids):
        # the in-block winner IS the pack max — one int64 temp, and
        # the (max e4, min id) tie-break exists in exactly one form
        return (((rows_e4 + 10000) << _NN_ID_BITS)
                | (_NN_ID_MASK - other_ids[None, :])).max(axis=1)

    pack_a = best(e4, ids_b)
    pack_b = best(e4.T, ids_a)
    return pa.table({
        "side": pa.array(np.concatenate(
            [np.zeros(len(ids_a), np.int64),
             np.ones(len(ids_b), np.int64)])),
        "id": pa.array(np.concatenate([ids_a, ids_b])),
        "pack": pa.array(np.concatenate([pack_a, pack_b]))})


def mutual_nn_pairs(emb_a: "rd.Dataset", emb_b: "rd.Dataset",
                    num_blocks: int | None = None,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> "rd.Dataset":
    """Mutual-nearest-neighbor alignment between two embedding sets
    (the margin-free core of bitext mining, Artetxe & Schwenk 2019):
    (a, b) is emitted iff b is a's best cosine match in B AND a is
    b's best match in A, ties by smaller id on both sides.

    Distributed shape: block-cross-product tasks emit ONE packed
    partial-argmax row per (side, row, opposite block) — linear in
    n x blocks, never the n^2 pair stream — then one grouped pack-max
    resolves the true argmax and one grouped count over the directed
    claims keeps the pairs claimed from BOTH sides.  Exact rail; the
    ANN/IVF index is the approximate 100-TB path."""
    from dedup_restore_ray.stages.groups import grouped_aggregate

    if num_blocks:
        emb_a = emb_a.repartition(num_blocks)
        emb_b = emb_b.repartition(num_blocks)
    refs_a = emb_a.select_columns([id_col, vec_col]).to_arrow_refs()
    refs_b = emb_b.select_columns([id_col, vec_col]).to_arrow_refs()
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine_e4": pa.array([], pa.int64())})
    tasks = [_block_nn_task.remote(ra, rb, id_col, vec_col)
             for ra in refs_a for rb in refs_b]
    if not tasks:
        return rd.from_arrow(empty)
    parts = rd.from_arrow_refs(tasks)
    won = grouped_aggregate(parts, ["side", "id"],
                            {"p": ("pack", "max")})

    def claims(b: pa.Table) -> pa.Table:
        side = np.asarray(b.column("side"), dtype=np.int64)
        me = np.asarray(b.column("id"), dtype=np.int64)
        p = np.asarray(b.column("p"), dtype=np.int64)
        other = _NN_ID_MASK - (p & _NN_ID_MASK)
        e4 = (p >> _NN_ID_BITS) - 10000
        a = np.where(side == 0, me, other)
        bb = np.where(side == 0, other, me)
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(bb),
                         "e4": pa.array(e4)})

    both = grouped_aggregate(
        won.map_batches(claims, batch_format="pyarrow"),
        ["id_a", "id_b"], {"cosine_e4": ("e4", "min")},
        count_alias="n_claims")

    def mutual(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("n_claims"), 2))
        return t.select(["id_a", "id_b", "cosine_e4"])

    return both.map_batches(mutual, batch_format="pyarrow")


def mutual_nn_pairs_lsh(emb_a: "rd.Dataset", emb_b: "rd.Dataset",
                        cfg: PipelineConfig | None = None,
                        num_bands: int = 16, bits_per_band: int = 8,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> "rd.Dataset":
    """Approximate mutual-NN alignment — the 100-TB path: candidates
    come from the hyperplane-LSH bucket stream over the tagged union
    of both sides (only the projection matrix is broadcast), so each
    row is scored only against its bucket collisions, never the whole
    opposite set.  Per-direction argmax via the same packed grouped
    MAX as the exact rail, mutuality via the two-claim rendezvous.
    Approximate: a true mutual pair is missed iff it never shares a
    band bucket (recall asserted on a planted corpus in tests);
    rows with zero cross-side candidates drop out."""
    from dedup_restore_ray.stages.groups import grouped_aggregate

    def tag(add: int):
        def f(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column(id_col), dtype=np.int64)
            if len(ids) and (ids.max() >= (1 << 40) or ids.min() < 0):
                raise ValueError("mutual_nn_lsh: ids outside [0, 2^40)")
            return pa.table({id_col: pa.array(ids * 2 + add),
                             vec_col: b.column(vec_col)})
        return f

    union = (emb_a.map_batches(tag(0), batch_format="pyarrow")
             .union(emb_b.map_batches(tag(1), batch_format="pyarrow")))
    # same-side bucket collisions are rejected from the ids alone,
    # BEFORE the two vector scatter shuffles — on self-similar corpora
    # same-side pairs dominate the candidate stream
    pairs = hyperplane_lsh_pairs(union, threshold=-1.0, cfg=cfg,
                                 num_bands=num_bands,
                                 bits_per_band=bits_per_band,
                                 id_col=id_col, vec_col=vec_col,
                                 cand_filter=lambda u, v:
                                     (u & 1) != (v & 1))

    def cross(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("u"), dtype=np.int64)
        v = np.asarray(b.column("v"), dtype=np.int64)
        s = np.asarray(b.column("cosine"), dtype=np.float64)
        m = (u & 1) != (v & 1)
        u, v, s = u[m], v[m], s[m]
        a = np.where(u & 1 == 0, u, v) >> 1
        bb = np.where(u & 1 == 0, v, u) >> 1
        e4 = (np.sign(s) * np.floor(np.abs(s) * 10000.0 + 0.5)).astype(
            np.int64)
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(bb),
                         "e4": pa.array(e4)})

    # materialize: two grouped_aggregate consumers follow — a lazy
    # plan would re-run the whole LSH candidate + verify chain twice
    scored = pairs.map_batches(cross,
                               batch_format="pyarrow").materialize()

    def packed(key: str, other: str):
        def f(b: pa.Table) -> pa.Table:
            e4 = np.asarray(b.column("e4"), dtype=np.int64)
            ob = np.asarray(b.column(other), dtype=np.int64)
            return pa.table({
                "id": b.column(key),
                "pack": pa.array(((e4 + 10000) << _NN_ID_BITS)
                                 | (_NN_ID_MASK - ob))})
        return f

    def claim(side: int):
        def f(b: pa.Table) -> pa.Table:
            me = np.asarray(b.column("id"), dtype=np.int64)
            p = np.asarray(b.column("p"), dtype=np.int64)
            other = _NN_ID_MASK - (p & _NN_ID_MASK)
            e4 = (p >> _NN_ID_BITS) - 10000
            a = me if side == 0 else other
            bb = other if side == 0 else me
            return pa.table({"id_a": pa.array(a), "id_b": pa.array(bb),
                             "e4": pa.array(e4)})
        return f

    claims = None
    for side, (key, other) in enumerate([("id_a", "id_b"),
                                         ("id_b", "id_a")]):
        won = grouped_aggregate(
            scored.map_batches(packed(key, other),
                               batch_format="pyarrow"),
            ["id"], {"p": ("pack", "max")})
        c = won.map_batches(claim(side), batch_format="pyarrow")
        claims = c if claims is None else claims.union(c)

    both = grouped_aggregate(claims, ["id_a", "id_b"],
                             {"cosine_e4": ("e4", "min")},
                             count_alias="n_claims")
    return both.map_batches(
        lambda b: b.filter(pc.equal(b.column("n_claims"), 2))
                   .select(["id_a", "id_b", "cosine_e4"]),
        batch_format="pyarrow")


def hyperplane_lsh_pairs(emb: "rd.Dataset", threshold: float,
                         cfg: PipelineConfig | None = None,
                         num_bands: int = 16, bits_per_band: int = 8,
                         seed: int = 42,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         cand_filter=None) -> "rd.Dataset":
    """Approximate near-dup pairs: sign-random-projection LSH.

    Collision probability per bit = 1 - theta/pi; with 16 bands x 8
    bits a cosine-0.8 pair collides in >= 1 band w.p. ~0.94 (recall
    asserted on a planted corpus in tests).  Only the [d x bands*bits]
    projection matrix is broadcast — never the corpus.  Verification
    is exact cosine with both sides' vectors delivered by sort-scatter.

    ``cand_filter``: optional vectorized (u_int64, v_int64) -> bool
    mask applied to candidate ids BEFORE the two vector scatter
    shuffles — callers that can reject pairs from ids alone (e.g. the
    mutual-NN cross-side parity test) prune the verify volume here.
    """
    from dedup_restore_ray.functions.hashing import combine64, mix64
    from dedup_restore_ray.stages.cluster import _scatter_lookup
    from dedup_restore_ray.stages.groups import bucket_pairs
    cfg = cfg or PipelineConfig()
    nbits = num_bands * bits_per_band

    # the only broadcast: a [d, nbits] projection matrix
    first = emb.limit(1).take_all()[0]
    d = len(first[vec_col])
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((d, nbits))
    proj_ref = ray.put(proj)

    def bucket_rows(batch: pa.Table) -> pa.Table:
        pm = ray.get(proj_ref)
        vecs = list_to_matrix(batch.column(vec_col))
        bits = (vecs @ pm) >= 0                          # [n, nbits]
        n = len(vecs)
        # pack each band's bits into one uint64 key, salted by band idx
        keys = np.empty((n, num_bands), dtype=np.uint64)
        for b in range(num_bands):
            chunk = bits[:, b * bits_per_band:(b + 1) * bits_per_band]
            packed = np.zeros(n, dtype=np.uint64)
            for k in range(bits_per_band):
                packed = (packed << np.uint64(1)) | chunk[:, k].astype(np.uint64)
            keys[:, b] = combine64(packed, np.uint64(b + 1))
        ids = batch.column(id_col)
        idx = np.repeat(np.arange(n), num_bands)
        return pa.table({
            "bucket_key": pa.array(keys.reshape(-1), pa.uint64()),
            "doc_id": ids.take(pa.array(idx)),
        })

    rows = emb.map_batches(bucket_rows, batch_format="pyarrow")
    cands = bucket_pairs(rows, cfg.max_bucket_pairs, cfg.num_salts)
    if cand_filter is not None:
        def prune(b: pa.Table) -> pa.Table:
            keep = cand_filter(np.asarray(b.column("u"), dtype=np.int64),
                               np.asarray(b.column("v"), dtype=np.int64))
            return b.filter(pa.array(keep))
        cands = cands.map_batches(prune, batch_format="pyarrow")

    # exact-cosine verification: attach u's and v's vectors by scatter
    vec_type = pa.list_(pa.float64())

    def cast_store(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            "vec": b.column(vec_col).cast(vec_type)})

    store = emb.map_batches(cast_store, batch_format="pyarrow")

    def u_refs(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b.column("u"),
                         "u": b.column("u"), "v": b.column("v")})

    with_u = _scatter_lookup(
        cands.map_batches(u_refs, batch_format="pyarrow"), store,
        key_col=id_col, payload_col="vec", out_cols=["u", "v"])
    with_u = with_u.map_batches(
        lambda b: pa.table({id_col: b.column("v"), "u": b.column("u"),
                            "v": b.column("v"), "vec_u": b.column("vec")}),
        batch_format="pyarrow")
    both = _scatter_lookup(with_u, store, key_col=id_col,
                           payload_col="vec",
                           out_cols=["u", "v", "vec_u"])

    def check(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        vu = l2_normalize(list_to_matrix(b.column("vec_u")))
        vv = l2_normalize(list_to_matrix(b.column("vec")))
        cos = np.einsum("ij,ij->i", vu, vv)
        keep = cos >= threshold
        return pa.table({
            "u": b.column("u").filter(pa.array(keep)),
            "v": b.column("v").filter(pa.array(keep)),
            "cosine": pa.array(cos[keep], pa.float64())})

    return both.map_batches(check, batch_format="pyarrow")


def _semdedup_group(ids: np.ndarray, vecs: np.ndarray,
                    threshold: float, chunk: int = 2048,
                    priority: np.ndarray | None = None):
    """Greedy first-wins semantic dedup of ONE cluster: scan in
    priority order (ascending ``priority``, ids ascending as the
    tiebreak; ids ascending when no priority is given); a vector is a
    duplicate iff its cosine to some EARLIER KEPT vector is >=
    threshold, and its canonical is the first such keeper.  Returns
    (keep mask, canonical ids) aligned to the INPUT order — the scan
    order is derived from (priority, id) values only, so results are
    independent of block layout.  The scan is row-chunked: each chunk
    matmuls against the kept prefix once (O(g * kept * d) worst case
    == the cluster's pairwise cost, the price SemDeDup intentionally
    confines to within-cluster work)."""
    if priority is None:
        order = np.argsort(ids, kind="stable")
    else:
        order = np.lexsort((ids, priority))
    ids_s = ids[order]
    v = l2_normalize(vecs[order].astype(np.float64))
    g = len(ids_s)
    keep = np.ones(g, dtype=bool)
    canon = ids_s.copy()
    for lo in range(0, g, chunk):
        hi = min(lo + chunk, g)
        kept_before = np.flatnonzero(keep[:lo])
        if len(kept_before):
            # cosine of every chunk row vs all kept rows before the
            # chunk — one matmul, then only intra-chunk order needs
            # the sequential pass
            s = v[lo:hi] @ v[kept_before].T
            hit = s >= threshold
            has = hit.any(axis=1)
            first = np.where(has, hit.argmax(axis=1), 0)
        else:
            has = np.zeros(hi - lo, dtype=bool)
            first = np.zeros(hi - lo, dtype=np.int64)
        s_in = v[lo:hi] @ v[lo:hi].T
        for r in range(hi - lo):
            i = lo + r
            if has[r]:
                keep[i] = False
                canon[i] = ids_s[kept_before[first[r]]]
                continue
            kept_in = np.flatnonzero(keep[lo:lo + r])
            if len(kept_in):
                c = s_in[r, kept_in]
                j = np.flatnonzero(c >= threshold)
                if len(j):
                    keep[i] = False
                    canon[i] = ids_s[lo + kept_in[j[0]]]
    inv = np.empty(g, dtype=np.int64)
    inv[order] = np.arange(g)
    return keep[inv], canon[inv]


def semdedup(emb: "rd.Dataset", threshold: float = 0.95,
             cfg: PipelineConfig | None = None,
             sample_size: int = 2000, seed: int = 42,
             id_col: str = "vec_id",
             vec_col: str = "embedding",
             keep_order: str = "id") -> "rd.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding space (deterministic hash-rank sample -> kmeans_fit, the
    IVF build's machinery), then greedy first-wins cosine dedup WITHIN
    each cluster — the pairwise work is confined to cluster-sized
    blocks, which is the whole trick that makes semantic dedup
    tractable at corpus scale.

    Returns (vec_id, cluster_id, is_dup, canonical_id) — the same
    assignment shape as the text flagship, so downstream keep-filters
    compose.  Scale shape: one small broadcast (centroids), one
    map_batches assignment pass, ONE sort by cluster, and per-cluster
    kernels via map_groups (cluster count = ivf_num_centroids, a FEW
    large groups — the many-groups map_groups ban doesn't apply).

    keep_order picks which member of a duplicate group survives:
    "id" (default) keeps the lowest id — the deterministic engine
    convention shared with the text flagship; "centroid" is the
    paper's rule — scan in ASCENDING cosine-to-cluster-centroid
    order, so the kept representative is the one FARTHEST from the
    centroid (Abbas et al. §3 found keeping low-similarity examples
    preserves the most diversity).  Ids break priority ties so both
    modes stay layout-independent.

    Approximation rails (documented): near-dup pairs straddling a
    k-means boundary are missed — that is SemDeDup's own recall
    trade; the exact rail (cosine_pairs_blockwise) is the oracle."""
    from dedup_restore_ray.functions.similarity import kmeans_fit
    from dedup_restore_ray.stages.ann import _hash_rank_sample
    if keep_order not in ("id", "centroid"):
        raise ValueError(f"keep_order must be 'id' or 'centroid', "
                         f"got {keep_order!r}")
    cfg = cfg or PipelineConfig()
    sample = _hash_rank_sample(emb, id_col, vec_col, sample_size)
    cent = kmeans_fit(sample, cfg.ivf_num_centroids, seed=seed)
    cent_ref = ray.put(cent)
    by_centroid = keep_order == "centroid"

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        xn = l2_normalize(list_to_matrix(batch.column(vec_col)))
        # assignment matches ivf_assign exactly (argmax against the
        # RAW centroids) so keep_order never perturbs the clustering
        a = np.argmax(xn @ c.T, axis=1)
        cols = {
            id_col: batch.column(id_col),
            vec_col: batch.column(vec_col),
            "cluster_id": pa.array(a.astype(np.int64))}
        if by_centroid:
            cn = l2_normalize(c)
            cols["cent_sim"] = pa.array(
                np.einsum("ij,ij->i", xn, cn[a]), pa.float64())
        return pa.table(cols)

    def dedup_group(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        vecs = list_to_matrix(group.column(vec_col))
        prio = (np.asarray(group.column("cent_sim"), dtype=np.float64)
                if by_centroid else None)
        keep, canon = _semdedup_group(ids, vecs, threshold,
                                      priority=prio)
        return pa.table({
            id_col: pa.array(ids),
            "cluster_id": group.column("cluster_id").slice(0, len(ids)),
            "is_dup": pa.array(~keep),
            "canonical_id": pa.array(canon)})

    return (emb.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster_id")
            .map_groups(dedup_group, batch_format="pyarrow"))
