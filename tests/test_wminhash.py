"""ICWS weighted MinHash (functions/wminhash.py)."""

import numpy as np
import pytest

from dedup_restore_ray.functions.wminhash import (icws_signatures,
                                                  weighted_jaccard_legs)


def _exact_jw(ta, ca, tb, cb):
    da, db = dict(zip(ta, ca)), dict(zip(tb, cb))
    keys = set(da) | set(db)
    num = sum(min(da.get(k, 0), db.get(k, 0)) for k in keys)
    den = sum(max(da.get(k, 0), db.get(k, 0)) for k in keys)
    return num / den


def _sig_pair(ta, ca, tb, cb, n_perm=256):
    toks = np.concatenate([ta, tb]).astype(np.uint64)
    ws = np.concatenate([ca, cb]).astype(np.float64)
    off = np.array([0, len(ta), len(ta) + len(tb)], np.int64)
    return icws_signatures(toks, ws, off, n_perm=n_perm)


class TestICWS:
    def test_estimator_tracks_weighted_jaccard(self):
        rng = np.random.default_rng(11)
        errs = []
        for _ in range(12):
            va = rng.integers(1, 20, 40)
            vb = va.copy()
            # perturb: change some counts, drop/add some tokens
            k = rng.integers(0, 25)
            vb[:k] = rng.integers(1, 20, k)
            ta = np.arange(1000, 1040, dtype=np.uint64)
            tb = ta.copy()
            sig = _sig_pair(ta, va, tb, vb)
            est = (sig[0] == sig[1]).mean()
            true = _exact_jw(ta.tolist(), va.tolist(),
                             tb.tolist(), vb.tolist())
            errs.append(abs(est - true))
        # 256 perms -> se ~ sqrt(J(1-J)/256) <= 0.031; allow 4 sigma
        assert np.mean(errs) < 0.05, errs

    def test_identical_multisets_identical_signatures(self):
        rng = np.random.default_rng(3)
        t = rng.integers(1, 1 << 60, 30).astype(np.uint64)
        c = rng.integers(1, 50, 30)
        sig = _sig_pair(t, c, t, c, n_perm=64)
        assert (sig[0] == sig[1]).all()
        # scaling ALL weights leaves weighted Jaccard at 1 only for
        # identical scaling; a doubled copy is NOT identical to ICWS
        # levels, but J_w(a, 2a) = 0.5 and the estimator must track it
        sig2 = _sig_pair(t, c, t, 2 * c, n_perm=512)
        est = (sig2[0] == sig2[1]).mean()
        assert abs(est - 0.5) < 0.12

    def test_empty_docs_and_order_independence(self):
        t = np.array([5, 9, 1], np.uint64)
        c = np.array([3, 1, 2], np.int64)
        perm = np.array([2, 0, 1])
        a = _sig_pair(t, c, t[perm], c[perm], n_perm=64)
        assert (a[0] == a[1]).all()          # token order irrelevant
        off = np.array([0, 0], np.int64)
        z = icws_signatures(np.array([], np.uint64),
                            np.array([], np.float64), off, n_perm=8)
        assert (z == 0).all()

    def test_exact_legs_match_bruteforce(self):
        rng = np.random.default_rng(7)
        for _ in range(20):
            na, nb = rng.integers(0, 15, 2)
            ta = np.unique(rng.integers(0, 30, na).astype(np.uint64))
            tb = np.unique(rng.integers(0, 30, nb).astype(np.uint64))
            ca = rng.integers(1, 9, len(ta)).astype(np.int64)
            cb = rng.integers(1, 9, len(tb)).astype(np.int64)
            num, den = weighted_jaccard_legs(ta, ca, tb, cb)
            if den == 0:
                assert len(ta) == 0 and len(tb) == 0
                continue
            assert num / den == pytest.approx(_exact_jw(
                ta.tolist(), ca.tolist(), tb.tolist(), cb.tolist()))


@pytest.mark.usefixtures("ray_session")
class TestWeightedNearDupQuery:
    def test_planted_multiset_semantics(self):
        import os
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        from dedup_restore_ray.queries import q_weighted_neardup_pairs_docs
        texts = [
            "alpha beta gamma delta epsilon zeta",        # 0
            "alpha beta gamma delta epsilon zeta",        # 1: exact dup
            # 2: SAME token set as 0 but one token repeated 50x ->
            # set-Jaccard 1.0, weighted Jaccard ~6/55 — must NOT pair
            "alpha " * 50 + "beta gamma delta epsilon zeta",
            "completely different words here altogether",  # 3
            "",                                            # 4
        ]
        n = len(texts)
        t = pa.table({"doc_id": pa.array(np.arange(n)),
                      "text": pa.array(texts),
                      "lang": pa.array(["en"] * n),
                      "source": pa.array(["s"] * n),
                      "n_chars": pa.array(np.zeros(n, np.int64))})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            out = q_weighted_neardup_pairs_docs(d).to_pandas()
        pairs = set(zip(out["u"].astype(int), out["v"].astype(int)))
        assert (0, 1) in pairs                 # identical multisets
        assert (0, 2) not in pairs             # set-dup, weight-far
        assert (1, 2) not in pairs
        row = out[(out["u"] == 0) & (out["v"] == 1)].iloc[0]
        assert row["jw_num"] == row["jw_den"]  # J_w == 1 exactly

    def test_weighted_clusters_consistent_with_pairs(self, sf_dir):
        from dedup_restore_ray.queries import (
            q_weighted_dedup_clusters_docs, q_weighted_neardup_pairs_docs)
        asg = q_weighted_dedup_clusters_docs(sf_dir)
        pairs = q_weighted_neardup_pairs_docs(sf_dir).to_pandas()
        lab = dict(zip(asg["doc_id"].astype(int),
                       asg["cluster_id"].astype(int)))
        # every verified pair shares a component label
        for u, v in zip(pairs["u"].astype(int), pairs["v"].astype(int)):
            assert lab[u] == lab[v]
        # labels are component minima
        import collections
        members = collections.defaultdict(list)
        for d, c in lab.items():
            members[c].append(d)
        for c, ms in members.items():
            assert c == min(ms)
