"""Sorted-neighborhood blocking (q_snm_pairs_docs)."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _brute_snm(ids, texts, window, key_chars):
    order = sorted(range(len(ids)),
                   key=lambda i: (texts[i][:key_chars].lower(), ids[i]))
    pairs = set()
    for p in range(len(order)):
        for q in range(p + 1, min(p + window + 1, len(order))):
            pairs.add((ids[order[p]], ids[order[q]]))
    return pairs


@pytest.mark.usefixtures("ray_session")
class TestSortedNeighborhood:
    def test_vs_bruteforce(self):
        from dedup_restore_ray.queries import q_snm_pairs_docs
        rng = np.random.default_rng(7)
        # clumpy keys: near-identical prefixes land adjacent in the sort
        stems = ["acme corp", "acme corporation", "beta llc", "beta ltd",
                 "gamma inc", "zzz"]
        texts = [stems[rng.integers(len(stems))] + " " +
                 "".join(chr(97 + c) for c in rng.integers(0, 26, 20))
                 for _ in range(120)]
        ids = list(range(120))
        t = pa.table({"doc_id": pa.array(np.array(ids, np.int64)),
                      "text": pa.array(texts),
                      "lang": pa.array(["en"] * 120),
                      "source": pa.array(["s"] * 120),
                      "n_chars": pa.array(
                          np.array([len(x) for x in texts], np.int64))})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            out = q_snm_pairs_docs(d, window=3, key_chars=12).to_pandas()
        got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
        assert got == _brute_snm(ids, texts, 3, 12)
        # exact-duplicate prefixes are always within the window reach
        # when fewer than `window` rows share the sort neighborhood
        n = 120
        assert len(got) == 3 * n - 6  # full band join count: sum w..1 tail
