"""Product quantization (functions/pq.py) + ann_pq query."""

import numpy as np
import pytest

from dedup_restore_ray.functions.pq import (pq_adc_scores, pq_decode,
                                            pq_encode, pq_train)


def _unit_rows(n, d, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


class TestPQ:
    def test_adc_equals_dot_with_decoded(self):
        x = _unit_rows(400, 64)
        books = pq_train(x, m=8, ksub=32, iters=8)
        codes = pq_encode(x, books)
        q = _unit_rows(3, 64, seed=9)
        adc = pq_adc_scores(q, codes, books)
        dec = pq_decode(codes, books)
        assert np.allclose(adc, q @ dec.T, atol=1e-4)

    def test_deterministic(self):
        x = _unit_rows(300, 64)
        b1 = pq_train(x, m=8, ksub=16)
        b2 = pq_train(x, m=8, ksub=16)
        assert np.array_equal(b1, b2)
        assert np.array_equal(pq_encode(x, b1), pq_encode(x, b2))

    def test_reconstruction_improves_with_ksub(self):
        x = _unit_rows(600, 64)
        errs = []
        for ksub in (4, 16, 64):
            books = pq_train(x, m=8, ksub=ksub, iters=10)
            dec = pq_decode(pq_encode(x, books), books)
            errs.append(float(np.mean(np.sum((x - dec) ** 2, axis=1))))
        assert errs[0] > errs[1] > errs[2]

    def test_dim_not_divisible_raises(self):
        with pytest.raises(ValueError):
            pq_train(_unit_rows(50, 30), m=8)

    def test_query_recall_vs_brute_force(self, ray_session, sf_dir):
        from dedup_restore_ray.queries import QUERIES
        pq = QUERIES["ann_pq"](sf_dir)
        bf = QUERIES["similarity_topk"](sf_dir)
        hits = 0
        for qid in bf.qid.unique():
            hits += len(set(pq[pq.qid == qid].vec_id)
                        & set(bf[bf.qid == qid].vec_id))
        assert hits / len(bf) >= 0.9
        # re-ranked scores are EXACT cosines: every overlapping
        # (qid, vec_id) pair must carry the identical rounded score
        merged = pq.merge(bf, on=["qid", "vec_id"], suffixes=("_pq", "_bf"))
        assert (merged["score_pq"] == merged["score_bf"]).all()


class TestIVFPQ:
    def test_recall_and_exact_scores(self, ray_session, sf_dir):
        """At a generous probe count IVF-PQ must reach the recall bar
        AND return exact cosine scores (re-rank removes all PQ loss:
        any pair it shares with the brute-force oracle scores
        identically)."""
        from dedup_restore_ray.queries import QUERIES, q_ann_ivfpq
        pq = q_ann_ivfpq(sf_dir, num_probe=12)
        bf = QUERIES["similarity_topk"](sf_dir)
        hits = 0
        for qid in bf.qid.unique():
            hits += len(set(pq[pq.qid == qid].vec_id)
                        & set(bf[bf.qid == qid].vec_id))
        assert hits / len(bf) >= 0.9
        merged = pq.merge(bf, on=["qid", "vec_id"], suffixes=("_pq", "_bf"))
        assert len(merged) > 0
        assert (merged["score_pq"] == merged["score_bf"]).all()
