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


class TestIVFAppend:
    def test_append_union_is_exact_and_resumable(self, ray_session, sf_dir):
        """Even-half build + odd-half append, probed exhaustively,
        must equal the exact search over the full corpus (a lost or
        doubled row changes the top-k); the meta manifest must reflect
        the appended count so a rebuild call reuses the index."""
        from dedup_restore_ray.queries import (QUERIES, CFG,
                                               q_ann_ivf_append)
        got = q_ann_ivf_append(sf_dir)
        exact = QUERIES["ann_ivf_exact"](sf_dir)
        import pandas as pd
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exact.reset_index(drop=True))

        import os
        from dedup_restore_ray.sources.io import read_parquet_clean
        from dedup_restore_ray.stages.ann import IVFIndex
        tag = os.path.basename(os.path.normpath(sf_dir))
        index_dir = f"/tmp/ivf_append_{tag}_{CFG.config_hash()}"
        emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
        idx = IVFIndex.build(emb, index_dir, CFG)   # reuse, no rebuild
        assert idx.num_rows == emb.count()

        # pruning still holds on the appended index
        import numpy as np
        q = np.stack([r["embedding"] for r in emb.limit(3).take_all()])
        _, metrics = idx.search(q.astype(np.float64), k=5)
        assert 0 < metrics["partitions_read"] < metrics["partitions_total"]

    def test_append_pq_codes_searchable(self, ray_session, sf_dir, tmp_path):
        """Appending into an IVF-PQ index must encode codes with the
        FROZEN codebooks: an appended vector's self-query returns it
        top-1 through the codes-only scan + exact re-rank."""
        import numpy as np
        from dedup_restore_ray.config import PipelineConfig
        from dedup_restore_ray.sources.io import read_parquet_clean
        from dedup_restore_ray.stages.ann import IVFIndex
        import pyarrow as pa
        cfg = PipelineConfig()
        emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])

        def parity(b: pa.Table, keep_even: bool) -> pa.Table:
            even = np.asarray(b.column("vec_id")) % 2 == 0
            return b.filter(pa.array(even if keep_even else ~even))

        idx = IVFIndex.build(
            emb.map_batches(lambda b: parity(b, True),
                            batch_format="pyarrow"),
            str(tmp_path / "ivfpq"), cfg, pq_m=8)
        n = idx.append(emb.map_batches(lambda b: parity(b, False),
                                       batch_format="pyarrow"))
        assert n > 0
        odd = [r for r in emb.take_all() if r["vec_id"] % 2 == 1][:3]
        q = np.stack([r["embedding"] for r in odd]).astype(np.float64)
        qids = np.array([r["vec_id"] for r in odd])
        out, metrics = idx.search_pq(q, k=3, num_probe=idx.num_lists,
                                     query_ids=qids)
        for qid in qids:
            top = out[out.qid == qid].sort_values("score",
                                                  ascending=False)
            assert int(top.iloc[0].vec_id) == int(qid)
