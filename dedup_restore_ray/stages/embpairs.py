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


def hyperplane_lsh_pairs(emb: "rd.Dataset", threshold: float,
                         cfg: PipelineConfig | None = None,
                         num_bands: int = 16, bits_per_band: int = 8,
                         seed: int = 42,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> "rd.Dataset":
    """Approximate near-dup pairs: sign-random-projection LSH.

    Collision probability per bit = 1 - theta/pi; with 16 bands x 8
    bits a cosine-0.8 pair collides in >= 1 band w.p. ~0.94 (recall
    asserted on a planted corpus in tests).  Only the [d x bands*bits]
    projection matrix is broadcast — never the corpus.  Verification
    is exact cosine with both sides' vectors delivered by sort-scatter.
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
