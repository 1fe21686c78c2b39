"""Distributed Lloyd k-means over an embedding column — the iterative
model-fitting loop (assign / re-estimate until fixpoint) expressed as
repeated Ray Data passes with a tiny driver-side reduce.

Everything is int64-exact: vectors quantize once to ``round(v * 2^s)``
and centroids live on the same integer grid (floor-divided partial
sums), so distances, argmin assignment, inertia and the convergence
test are integer arithmetic — results are bit-identical to a
sequential reference and independent of block layout / reduce order
(integer addition commutes), which float-matmul Lloyd is not.

Scale shape: each iteration is ONE map_batches pass emitting <= k
partial rows per block ((cluster, int64 sum-vector, count) — the same
reduced-sketch discipline as label_centroids); only k x n_blocks tiny
rows reach the driver, never a vector table.  The broadcast side is
one k x d int64 matrix per iteration via ray.put.

Reference seeds: k-means as the IVF coarse quantizer (stages/ann.py)
trains on a bounded sample; this module is the full-corpus refinement
loop for when the sample fit must be polished against ALL rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from dedup_restore_ray.functions.similarity import list_to_matrix


def _quantize(vecs: np.ndarray, scale_bits: int) -> np.ndarray:
    return np.rint(vecs * float(1 << scale_bits)).astype(np.int64)


def _assign(q: np.ndarray, cq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, sq-dist) per row — int64 exact, ties to lowest index.

    d2 headroom: |q| <= ~2^s * max|v|, diff^2 * dim must fit int64 —
    holds for s=20, dim<=512, |v|<=32."""
    n = q.shape[0]
    best_d = np.full(n, np.iinfo(np.int64).max, np.int64)
    best_c = np.zeros(n, np.int64)
    for j in range(cq.shape[0]):
        diff = q - cq[j]
        d2 = np.einsum("ij,ij->i", diff, diff)
        take = d2 < best_d
        best_d[take] = d2[take]
        best_c[take] = j
    return best_c, best_d


def _partials(q: np.ndarray, cid: np.ndarray, d2: np.ndarray
              ) -> pa.Table:
    """<=k (cluster, sum-vector, count, inertia) rows for one block."""
    order = np.argsort(cid, kind="stable")
    sc, sq = cid[order], q[order]
    starts = np.flatnonzero(np.concatenate(([True], sc[1:] != sc[:-1])))
    ends = np.concatenate((starts[1:], [len(sc)]))
    sums = np.add.reduceat(sq, starts, axis=0)
    inert = np.add.reduceat(d2[order], starts)
    return pa.table({
        "cluster": pa.array(sc[starts], pa.int64()),
        "psum": pa.array(list(sums), pa.list_(pa.int64())),
        "n": pa.array((ends - starts).astype(np.int64)),
        "inertia": pa.array(inert, pa.int64()),
    })


def kmeans_lloyd(emb: "ray.data.Dataset", k: int = 8, iters: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 scale_bits: int = 20) -> dict:
    """Full-corpus Lloyd iterations; returns
    ``{"assignments": Dataset(id, cluster, d2), "centroids_q": int64
    [k, d] (on the 2^scale_bits grid), "inertia": int, "n_iters":
    int, "converged": bool}``.

    Init is the deterministic splitmix64-rank bottom-k sample
    (stages/ann._hash_rank_sample) — never the head of the dataset.
    Empty clusters keep their previous centroid.  Iteration stops
    early when the integer centroid grid is unchanged (exact
    fixpoint test, no epsilon)."""
    from dedup_restore_ray.stages.ann import _hash_rank_sample

    sample = _hash_rank_sample(emb, id_col, vec_col, k)
    if sample.shape[0] < k:
        raise ValueError(f"k={k} exceeds corpus size {sample.shape[0]}")
    cq = _quantize(np.asarray(sample, dtype=np.float64), scale_bits)

    # quantize once; the per-iteration passes re-read this table
    def quant(b: pa.Table) -> pa.Table:
        qm = _quantize(list_to_matrix(b.column(vec_col)), scale_bits)
        return pa.table({id_col: b.column(id_col),
                         "q": pa.array(list(qm), pa.list_(pa.int64()))})

    qds = emb.map_batches(quant, batch_format="pyarrow").materialize()

    inertia = -1
    converged = False
    it = 0
    for it in range(1, iters + 1):
        ref = ray.put(cq)

        def step(b: pa.Table) -> pa.Table:
            c = ray.get(ref)
            q = list_to_matrix(b.column("q"), dtype=np.int64)
            cid, d2 = _assign(q, c)
            return _partials(q, cid, d2)

        parts = qds.map_batches(step, batch_format="pyarrow").take_all()
        d = cq.shape[1]
        sums = np.zeros((k, d), np.int64)
        cnts = np.zeros(k, np.int64)
        inertia = 0
        for r in parts:
            j = r["cluster"]
            sums[j] += np.asarray(r["psum"], dtype=np.int64)
            cnts[j] += r["n"]
            inertia += int(r["inertia"])
        new_cq = cq.copy()
        nz = cnts > 0
        new_cq[nz] = sums[nz] // cnts[nz, None]
        if np.array_equal(new_cq, cq):
            converged = True
            break
        cq = new_cq

    final_ref = ray.put(cq)

    def assign_out(b: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        q = list_to_matrix(b.column("q"), dtype=np.int64)
        cid, d2 = _assign(q, c)
        return pa.table({id_col: b.column(id_col),
                         "cluster": pa.array(cid),
                         "d2": pa.array(d2)})

    assignments = qds.map_batches(assign_out, batch_format="pyarrow")
    if not converged:
        # the loop's last inertia was measured against the PRE-update
        # grid; re-measure against the final centroids so the reported
        # number always matches the returned assignments (int-exact)
        inertia = int(assignments.sum("d2") or 0)
    return {"assignments": assignments,
            "centroids_q": cq, "inertia": int(inertia),
            "n_iters": it, "converged": converged}


def kmeans_lloyd_reference(vecs: np.ndarray, init_q: np.ndarray,
                           iters: int = 10, scale_bits: int = 20
                           ) -> tuple[np.ndarray, np.ndarray, int]:
    """Sequential single-array reference (tests): identical integer
    arithmetic, so parity with kmeans_lloyd is exact, not allclose."""
    q = _quantize(np.asarray(vecs, dtype=np.float64), scale_bits)
    cq = init_q.copy()
    k = cq.shape[0]
    cid = np.zeros(len(q), np.int64)
    d2 = np.zeros(len(q), np.int64)
    for _ in range(iters):
        cid, d2 = _assign(q, cq)
        new_cq = cq.copy()
        for j in range(k):
            m = cid == j
            if m.any():
                new_cq[j] = q[m].sum(axis=0) // int(m.sum())
        if np.array_equal(new_cq, cq):
            break
        cq = new_cq
    cid, d2 = _assign(q, cq)
    return cid, cq, int(d2.sum())
