"""Vector similarity kernels: brute-force cosine top-k and IVF routing.

Similarity search over an embedding column (task brief): the baseline
is exact brute-force cosine — a numpy matmul of each Arrow batch
against a broadcast query matrix (``ray.put`` once, read per actor) —
and the scale path is IVF: k-means centroids assign each vector to a
list; queries probe the nearest ``num_probe`` lists only.
"""

from __future__ import annotations

import numpy as np


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
