"""Per-source KL drift monitor (q_source_kl_docs)."""

import math
import os
import re
import tempfile
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _brute_kl(texts, sources):
    sc, cw, ns = Counter(), Counter(), Counter()
    for t, s in zip(texts, sources):
        for w in re.findall(r"\w+", (t or "").lower(), re.ASCII):
            sc[(s, w)] += 1
            cw[w] += 1
            ns[s] += 1
    nc = float(sum(ns.values()))
    sums = Counter()
    for (s, w), c in sc.items():
        sums[s] += math.floor(
            c * math.log((c * nc) / (cw[w] * float(ns[s]))) * 1e6)
    return {s: max(sums[s], 0) // ns[s] for s in ns}, dict(ns)


@pytest.mark.usefixtures("ray_session")
class TestSourceKL:
    def test_vs_bruteforce_with_drifted_source(self):
        from dedup_restore_ray.queries import q_source_kl_docs
        rng = np.random.default_rng(3)
        common = ["the", "cat", "sat", "on", "a", "mat", "and", "ran"]
        texts, sources = [], []
        for i in range(40):
            texts.append(" ".join(rng.choice(common, 12)))
            sources.append("web")
        for i in range(40):
            texts.append(" ".join(rng.choice(common, 12)))
            sources.append("books")
        for i in range(20):  # drifted source: disjoint jargon vocab
            texts.append(" ".join(rng.choice(
                ["qubit", "tensor", "lattice", "eigen"], 12)))
            sources.append("arxiv")
        n = len(texts)
        t = pa.table({"doc_id": pa.array(np.arange(n)),
                      "text": pa.array(texts),
                      "lang": pa.array(["en"] * n),
                      "source": pa.array(sources),
                      "n_chars": pa.array(np.zeros(n, np.int64))})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            out = q_source_kl_docs(d)
        want_kl, want_n = _brute_kl(texts, sources)
        got = dict(zip(out["source"], out["kl_micro"].astype(int)))
        gotn = dict(zip(out["source"], out["n_tokens"].astype(int)))
        assert got == want_kl
        assert gotn == want_n
        assert (out["kl_micro"] >= 0).all()
        # the jargon source diverges far more than the two blended ones
        assert got["arxiv"] > 5 * max(got["web"], got["books"])
