"""Distributed BPE merge-pair counting (q_bpe_merge_pairs_docs)."""

import collections
import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _brute_pairs(texts, k):
    cnt = collections.Counter()
    for t in texts:
        for w in re.findall(r"\w+", t.lower(), re.ASCII):
            for i in range(len(w) - 1):
                cnt[w[i:i + 2]] += 1
    rows = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return rows


@pytest.mark.usefixtures("ray_session")
class TestBpeMergePairs:
    def test_vs_bruteforce(self):
        from dedup_restore_ray.queries import q_bpe_merge_pairs_docs
        texts = ["the cat sat on the mat", "THE THEME the-cat",
                 "aaa bb a", "", "punct!!! only???", "x",
                 "lower lower lower bound"]
        n = len(texts)
        t = pa.table({"doc_id": pa.array(np.arange(n)),
                      "text": pa.array(texts),
                      "lang": pa.array(["en"] * n),
                      "source": pa.array(["s"] * n),
                      "n_chars": pa.array(
                          np.array([len(x) for x in texts], np.int64))})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            out = q_bpe_merge_pairs_docs(d, k=10)
        got = list(zip(out["pair"], out["cnt"].astype(int)))
        assert got == _brute_pairs(texts, 10)
        # the argmax of this table IS the next BPE merge ("th"/"he"
        # tie in this corpus; ties break by pair string ascending)
        assert got[0] == ("he", got[0][1])
        assert got[1][0] == "th" and got[1][1] == got[0][1]
