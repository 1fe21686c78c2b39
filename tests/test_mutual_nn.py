"""Mutual-NN embedding alignment (stages/embpairs.mutual_nn_pairs)."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_mutual(ids_a, va, ids_b, vb):
    na = va / np.linalg.norm(va, axis=1, keepdims=True)
    nb = vb / np.linalg.norm(vb, axis=1, keepdims=True)
    s = na @ nb.T
    e4 = (np.sign(s) * np.floor(np.abs(s) * 10000.0 + 0.5)).astype(np.int64)

    def best(rows, other):
        m = rows.max(axis=1)
        out = []
        for i in range(rows.shape[0]):
            cand = other[rows[i] == m[i]]
            out.append((int(cand.min()), int(m[i])))
        return out

    nn_a = best(e4, np.asarray(ids_b))
    nn_b = best(e4.T, np.asarray(ids_a))
    bpos = {b: i for i, b in enumerate(ids_b)}
    apos = {a: i for i, a in enumerate(ids_a)}
    got = set()
    for i, a in enumerate(ids_a):
        b, c = nn_a[i]
        if nn_b[bpos[b]][0] == a:
            got.add((a, b, c))
    return got


@pytest.mark.usefixtures("ray_session")
class TestMutualNN:
    def test_vs_bruteforce_and_layout_independent(self):
        import ray.data as rd
        from dedup_restore_ray.stages.embpairs import mutual_nn_pairs
        rng = np.random.default_rng(5)
        na, nb, d = 60, 45, 16
        va = rng.standard_normal((na, d))
        vb = rng.standard_normal((nb, d))
        # planted exact matches -> guaranteed mutual pairs
        vb[:5] = va[:5]
        ids_a = np.arange(100, 100 + na, dtype=np.int64)
        ids_b = np.arange(500, 500 + nb, dtype=np.int64)
        ta = pa.table({"vec_id": pa.array(ids_a),
                       "embedding": pa.array(list(va))})
        tb = pa.table({"vec_id": pa.array(ids_b),
                       "embedding": pa.array(list(vb))})
        want = _brute_mutual(ids_a.tolist(), va, ids_b.tolist(), vb)
        for blocks in (1, 4):
            out = mutual_nn_pairs(rd.from_arrow(ta), rd.from_arrow(tb),
                                  num_blocks=blocks).to_pandas()
            got = set(zip(out["id_a"].astype(int),
                          out["id_b"].astype(int),
                          out["cosine_e4"].astype(int)))
            assert got == want, f"blocks={blocks}"
        assert {(100 + i, 500 + i, 10000) for i in range(5)} <= want

    def test_lsh_path_planted_recall(self):
        import ray.data as rd
        from dedup_restore_ray.stages.embpairs import mutual_nn_pairs_lsh
        rng = np.random.default_rng(9)
        na, nb, d = 80, 70, 32
        va = rng.standard_normal((na, d))
        vb = rng.standard_normal((nb, d))
        vb[:8] = va[:8]          # identical vectors: collide in EVERY band
        ids_a = np.arange(na, dtype=np.int64)
        ids_b = np.arange(1000, 1000 + nb, dtype=np.int64)
        ta = pa.table({"vec_id": pa.array(ids_a),
                       "embedding": pa.array(list(va))})
        tb = pa.table({"vec_id": pa.array(ids_b),
                       "embedding": pa.array(list(vb))})
        out = mutual_nn_pairs_lsh(rd.from_arrow(ta),
                                  rd.from_arrow(tb)).to_pandas()
        got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
        assert {(i, 1000 + i) for i in range(8)} <= got
        assert (out["cosine_e4"] <= 10000).all()
        # argmax winners are claimed from both directions -> unique per id
        assert out["id_a"].is_unique and out["id_b"].is_unique
