"""Distributed Lloyd k-means: exact parity with the sequential
integer-grid reference, block-layout independence, fixpoint behavior,
empty-cluster handling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _emb_frame(n=300, d=16, k_blobs=5, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, (k_blobs, d))
    vecs = (centers[rng.integers(0, k_blobs, n)]
            + rng.normal(0, 0.05, (n, d))).astype(np.float32)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(vecs)})


def _to_ds(df, num_blocks):
    tbl = pa.table({
        "vec_id": pa.array(df["vec_id"].to_numpy()),
        "embedding": pa.array([list(map(float, v))
                               for v in df["embedding"]],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(tbl).repartition(num_blocks)


class TestKMeansLloyd:
    @pytest.mark.parametrize("num_blocks", [1, 6])
    def test_exact_parity_vs_sequential_reference(self, ray_session,
                                                  num_blocks):
        from dedup_restore_ray.stages.ann import _hash_rank_sample
        from dedup_restore_ray.stages.kmeans import (
            _quantize, kmeans_lloyd, kmeans_lloyd_reference)
        df = _emb_frame()
        ds = _to_ds(df, num_blocks)
        k, iters = 5, 12
        res = kmeans_lloyd(ds, k=k, iters=iters)
        got = (res["assignments"].to_pandas()
               .sort_values("vec_id").reset_index(drop=True))

        init = _quantize(np.asarray(_hash_rank_sample(
            _to_ds(df, num_blocks), "vec_id", "embedding", k),
            dtype=np.float64), 20)
        vecs = np.stack(df["embedding"]).astype(np.float64)
        cid, cq, inertia = kmeans_lloyd_reference(vecs, init,
                                                  iters=iters)
        assert np.array_equal(got["cluster"].to_numpy(), cid)
        assert np.array_equal(res["centroids_q"], cq)
        assert res["inertia"] == inertia
        assert int(got["d2"].sum()) == inertia

    def test_block_layout_independence(self, ray_session):
        from dedup_restore_ray.stages.kmeans import kmeans_lloyd
        df = _emb_frame(n=200, seed=9)
        a = kmeans_lloyd(_to_ds(df, 1), k=4, iters=8)
        b = kmeans_lloyd(_to_ds(df, 9), k=4, iters=8)
        assert np.array_equal(a["centroids_q"], b["centroids_q"])
        pa_ = (a["assignments"].to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        pb_ = (b["assignments"].to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(pa_, pb_)

    def test_converges_to_fixpoint(self, ray_session):
        from dedup_restore_ray.stages.kmeans import kmeans_lloyd
        df = _emb_frame(n=150, k_blobs=3, seed=5)
        res = kmeans_lloyd(_to_ds(df, 3), k=3, iters=50)
        assert res["converged"]
        # one more round from the fixpoint changes nothing
        again = kmeans_lloyd(_to_ds(df, 3), k=3, iters=res["n_iters"] + 5)
        assert np.array_equal(res["centroids_q"], again["centroids_q"])

    def test_identical_points_leave_empty_clusters_on_init(
            self, ray_session):
        from dedup_restore_ray.stages.kmeans import kmeans_lloyd
        n, d = 40, 8
        df = pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [np.full(d, 0.25, np.float32)] * n,
        })
        res = kmeans_lloyd(_to_ds(df, 2), k=3, iters=5)
        got = res["assignments"].to_pandas()
        # every point ties on all centroids (they are all identical
        # samples of the same vector) -> lowest index wins everywhere
        assert (got["cluster"] == 0).all()
        assert (got["d2"] == 0).all()
        assert res["converged"]

    def test_k_exceeds_corpus_raises(self, ray_session):
        from dedup_restore_ray.stages.kmeans import kmeans_lloyd
        df = _emb_frame(n=4)
        with pytest.raises(ValueError):
            kmeans_lloyd(_to_ds(df, 1), k=9, iters=2)
