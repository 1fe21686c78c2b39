"""One-Permutation Hashing MinHash (functions/minhash.oph_signatures):
estimator accuracy, densification invariants, and the flagship recall
gate under minhash_mode="oph"."""

import numpy as np
import pytest

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.minhash import (EMPTY_SIG,
                                                 estimate_jaccard,
                                                 oph_signatures)


def _csr(sets):
    """list of sorted-unique uint64 arrays -> (flat, offsets)."""
    offsets = np.zeros(len(sets) + 1, dtype=np.int64)
    offsets[1:] = np.cumsum([len(s) for s in sets])
    flat = (np.concatenate(sets) if offsets[-1]
            else np.empty(0, np.uint64))
    return flat.astype(np.uint64), offsets


def _rand_sets(rng, n_common, n_only_a, n_only_b):
    need = n_common + n_only_a + n_only_b
    pool = rng.permutation(np.unique(
        rng.integers(0, 2**64, size=need * 2, dtype=np.uint64)))[:need]
    common = pool[:n_common]
    a = np.sort(np.concatenate([common, pool[n_common:n_common + n_only_a]]))
    b = np.sort(np.concatenate([common, pool[n_common + n_only_a:]]))
    return a, b


class TestOPHKernel:

    def test_identical_sets_agree_everywhere(self):
        rng = np.random.default_rng(5)
        s = np.unique(rng.integers(0, 2**64, size=800,
                                   dtype=np.uint64))
        flat, off = _csr([s, s])
        sig = oph_signatures(flat, off, 128)
        assert estimate_jaccard(sig[0], sig[1]) == 1.0
        assert not (sig == EMPTY_SIG).any()

    def test_estimator_tracks_jaccard(self):
        rng = np.random.default_rng(7)
        for j_target, (c, oa, ob) in [(0.8, (800, 100, 100)),
                                      (0.5, (500, 250, 250)),
                                      (0.2, (200, 400, 400))]:
            a, b = _rand_sets(rng, c, oa, ob)
            true_j = c / (c + oa + ob)
            flat, off = _csr([a, b])
            sig = oph_signatures(flat, off, 128)
            est = estimate_jaccard(sig[0], sig[1])
            # 128 slots: sd ~= sqrt(J(1-J)/128) <= 0.045; allow 4 sd
            assert abs(est - true_j) < 0.18, (j_target, est, true_j)

    def test_densification_fills_every_bin(self):
        # 3 shingles can fill at most 3 of 128 bins; rotation
        # densification must leave no EMPTY slot and only reuse the
        # doc's own bin minima
        rng = np.random.default_rng(9)
        s = np.unique(rng.integers(0, 2**64, size=3,
                                   dtype=np.uint64))
        flat, off = _csr([s])
        sig = oph_signatures(flat, off, 128)
        assert not (sig == EMPTY_SIG).any()
        assert len(np.unique(sig[0])) <= 3

    def test_empty_doc_and_determinism(self):
        rng = np.random.default_rng(3)
        s = np.unique(rng.integers(0, 2**64, size=50,
                                   dtype=np.uint64))
        flat, off = _csr([np.empty(0, np.uint64), s])
        sig1 = oph_signatures(flat, off, 128)
        sig2 = oph_signatures(flat, off, 128)
        assert (sig1[0] == EMPTY_SIG).all()
        assert np.array_equal(sig1, sig2)

    def test_power_of_two_required(self):
        with pytest.raises(ValueError, match="power of two"):
            oph_signatures(np.empty(0, np.uint64),
                           np.zeros(1, np.int64), 100)


@pytest.mark.usefixtures("ray_session")
class TestOPHPipeline:

    def test_flagship_recall_in_oph_mode(self):
        """The BASELINE recall gate (>= 0.99 vs brute exact Jaccard)
        must hold with the one-pass signature path too."""
        import ray.data as rd

        from dedup_restore_ray.functions.jaccard import jaccard_sorted
        from dedup_restore_ray.functions.shingle import ShingleEncoder
        from dedup_restore_ray.pipelines.dedup import ExtractText, dedup_pipeline
        from dedup_restore_ray.sources.pages import generate_pages

        cfg = PipelineConfig(minhash_mode="oph")
        pages, truth = generate_pages(300, seed=42)
        res = dedup_pipeline(rd.from_arrow(pages), cfg, id_col="url",
                             text_col="text", html_col="html")
        out = res.assignments.to_pandas()
        ex = ExtractText()
        urls = pages["url"].to_pylist()
        texts = [t if t is not None else ex.extract_one(h)
                 for t, h in zip(pages["text"].to_pylist(),
                                 pages["html"].to_pylist())]
        enc = ShingleEncoder(k=cfg.shingle_k, seed=cfg.minhash_seed)
        flat, off = enc.encode(texts)
        sets = [flat[off[i]:off[i + 1]] for i in range(len(urls))]
        cl = dict(zip(out.doc_id, out.cluster_id))
        oracle = hits = 0
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                if jaccard_sorted(sets[i], sets[j]) >= cfg.jaccard_threshold:
                    oracle += 1
                    hits += cl[urls[i]] == cl[urls[j]]
        assert oracle > 50
        assert hits / oracle >= 0.99
