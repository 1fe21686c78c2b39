"""DSIR hashed n-gram importance weighting (functions/dsir.py,
queries q_dsir_weights_docs / q_dsir_sample_docs).

The vectorized Arrow gram path is checked against a brute per-doc
Python reference (same tokenizer contract), and the end-to-end scores
against a sequential numpy reimplementation of the whole operator.
"""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest

from dedup_restore_ray.functions.dsir import (GramBucketer,
                                              doc_gram_buckets,
                                              dsir_weight_micro,
                                              gumbel_micro_for_ids, md5_u64)
from dedup_restore_ray.functions.shingle import tokenize

B = 64


def brute_buckets(text):
    toks = tokenize(text)
    grams = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
    return sorted(md5_u64(g) % B for g in grams)


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "the QUICK brown-fox; jumps!!",
    "",
    None,
    "one",
    "café au lait très bon café",   # non-ascii fallback row
    "a a a a a a",
    "Punctuation... only ---",
    "123 456 123_456 mixed_Case Words",
]


class TestGramBuckets:
    def test_matches_brute_per_doc(self):
        col = pa.array(TEXTS, pa.string())
        flat, counts, rows = doc_gram_buckets(col, GramBucketer(B))
        assert len(flat) == int(counts.sum())
        assert sorted(rows.tolist()) == list(range(len(TEXTS)))
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        for i, r in enumerate(rows):
            seg = sorted(flat[starts[i]:starts[i] + counts[i]].tolist())
            assert seg == brute_buckets(TEXTS[r]), TEXTS[r]

    def test_empty_column(self):
        flat, counts, rows = doc_gram_buckets(
            pa.array([], pa.string()), GramBucketer(B))
        assert len(flat) == 0 and len(counts) == 0 and len(rows) == 0

    def test_cache_consistency(self):
        bk = GramBucketer(B)
        col = pa.array(TEXTS, pa.string())
        f1, c1, r1 = doc_gram_buckets(col, bk)
        f2, c2, r2 = doc_gram_buckets(col, bk)   # warm cache
        assert np.array_equal(f1, f2) and np.array_equal(c1, c2)


class TestWeightMath:
    def test_weight_formula(self):
        t = np.array([5, 0, 2], dtype=np.int64)
        r = np.array([9, 4, 2], dtype=np.int64)
        w = dsir_weight_micro(t, r, 7, 15, 3)
        for i in range(3):
            exp = math.floor(math.log(((t[i] + 1.0) * (15 + 3))
                                      / ((r[i] + 1.0) * (7 + 3))) * 1e6)
            assert w[i] == exp

    def test_gumbel_deterministic(self):
        ids = np.array([1, 2, 3, 10**12], dtype=np.int64)
        g1 = gumbel_micro_for_ids(ids)
        g2 = gumbel_micro_for_ids(ids)
        assert np.array_equal(g1, g2)
        d = hashlib.md5(b"1").digest()
        u = (int.from_bytes(d[8:16], "little") + 0.5) / 2.0 ** 64
        assert g1[0] == math.floor(-math.log(-math.log(u)) * 1e6)


@pytest.mark.usefixtures("ray_session")
class TestDsirQueries:
    def _reference_scores(self, sf_dir, n_buckets):
        import pyarrow.parquet as pq
        tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
        ids = tbl.column("doc_id").to_pylist()
        texts = tbl.column("text").to_pylist()
        langs = tbl.column("lang").to_pylist()
        t_cnt = np.zeros(n_buckets, np.int64)
        r_cnt = np.zeros(n_buckets, np.int64)
        per_doc = []
        for i, tx in enumerate(texts):
            bks = np.array(brute_buckets(tx), dtype=np.int64)
            per_doc.append(bks)
            if len(bks):
                r_cnt += np.bincount(bks, minlength=n_buckets)
                if langs[i] == "en":
                    t_cnt += np.bincount(bks, minlength=n_buckets)
        w = dsir_weight_micro(t_cnt, r_cnt, int(t_cnt.sum()),
                              int(r_cnt.sum()), n_buckets)
        return {ids[i]: (len(per_doc[i]), int(w[per_doc[i]].sum()))
                for i in range(len(ids)) if len(per_doc[i])}

    def test_weights_match_sequential_reference(self, sf_dir):
        from dedup_restore_ray.queries import q_dsir_weights_docs
        got = q_dsir_weights_docs(sf_dir, n_buckets=B).to_pandas()
        exp = self._reference_scores(sf_dir, B)
        assert len(got) == len(exp)
        for row in got.itertuples(index=False):
            n, s = exp[row.doc_id]
            assert (row.n_grams, row.dsir_score_micro) == (n, s)

    def test_sample_is_topk_of_weights(self, sf_dir):
        from dedup_restore_ray.queries import (q_dsir_sample_docs,
                                               q_dsir_weights_docs)
        k = 25
        samp = q_dsir_sample_docs(sf_dir, k=k, n_buckets=B)
        assert len(samp) == k
        w = q_dsir_weights_docs(sf_dir, n_buckets=B).to_pandas()
        pri = (w["dsir_score_micro"].to_numpy(np.int64)
               + gumbel_micro_for_ids(w["doc_id"].to_numpy(np.int64)))
        order = np.lexsort((w["doc_id"].to_numpy(np.int64), -pri))[:k]
        assert samp["doc_id"].tolist() == \
            w["doc_id"].to_numpy(np.int64)[order].tolist()
        assert samp["priority_micro"].tolist() == pri[order].tolist()
