"""Vector similarity kernels: brute-force cosine top-k and IVF routing.

Similarity search over an embedding column (task brief): the baseline
is exact brute-force cosine — a numpy matmul of each Arrow batch
against a broadcast query matrix (``ray.put`` once, read per actor) —
and the scale path is IVF: k-means centroids assign each vector to a
list; queries probe the nearest ``num_probe`` lists only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<float>`` / ``fixed_size_list`` Arrow column -> [n, d]
    numpy matrix via ONE ``pc.list_flatten`` + reshape — no per-row
    Python (``np.stack(col.to_pylist())`` was the hottest-numeric-path
    anti-pattern: a Python object per row per batch).  Raises on
    ragged rows or nulls, which would silently misalign the reshape."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("list_to_matrix: column has null rows")
    flat = pc.list_flatten(col)
    if flat.null_count:
        raise ValueError("list_to_matrix: column has null elements")
    d, rem = divmod(len(flat), n)
    if rem:
        raise ValueError(
            f"list_to_matrix: ragged list column ({len(flat)} values "
            f"across {n} rows)")
    mat = flat.to_numpy(zero_copy_only=False).reshape(n, d)
    return mat.astype(dtype, copy=False)


def fixed_binary_to_matrix(col, width: int) -> np.ndarray:
    """``fixed_size_binary(width)`` Arrow column -> [n, width] uint8
    matrix, zero-copy from the Arrow data buffer (the per-row
    ``b"".join(col.to_pylist())`` it replaces materialized every code
    as a Python bytes object)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("fixed_binary_to_matrix: column has nulls")
    n = len(col)
    if n == 0:
        return np.empty((0, width), dtype=np.uint8)
    a = np.frombuffer(col.buffers()[1], dtype=np.uint8)
    start = col.offset * width
    return a[start:start + n * width].reshape(n, width)


def l2_normalize(m: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, eps)


def cosine_topk_block(
    queries_n: np.ndarray, block: np.ndarray, block_ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-query top-k over one block.  queries_n must be L2-normalized;
    block is raw.  Returns (ids [Q,k'], scores [Q,k']) with k' <= k —
    partial results to be merged across blocks."""
    bn = l2_normalize(block)
    scores = queries_n @ bn.T  # [Q, B]
    kk = min(k, scores.shape[1])
    part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
    rows = np.arange(scores.shape[0])[:, None]
    ps = scores[rows, part]
    order = np.argsort(-ps, axis=1, kind="stable")
    top = part[rows, order]
    return block_ids[top], scores[rows, top]


def merge_topk(
    ids_list: list[np.ndarray], scores_list: list[np.ndarray], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-block partial top-k results → global top-k per query.
    Ties broken by ascending id for determinism."""
    ids = np.concatenate(ids_list, axis=1)
    scores = np.concatenate(scores_list, axis=1)
    # sort by (-score, id) per row
    order = np.lexsort((ids, -scores), axis=1)
    kk = min(k, ids.shape[1])
    rows = np.arange(ids.shape[0])[:, None]
    sel = order[:, :kk]
    return ids[rows, sel], scores[rows, sel]


def kmeans_fit(x: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on normalized vectors (cosine =
    euclidean on the unit sphere).  Returns [k, d] centroids."""
    rng = np.random.default_rng(seed)
    xn = l2_normalize(x)
    idx = rng.choice(len(xn), size=min(k, len(xn)), replace=False)
    cent = xn[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(xn @ cent.T, axis=1)
        for c in range(len(cent)):
            members = xn[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = l2_normalize(cent)
    return cent


def ivf_assign(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid list id per vector."""
    return np.argmax(l2_normalize(x) @ centroids.T, axis=1).astype(np.int64)
