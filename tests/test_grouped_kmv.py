"""Grouped KMV distinct-token sketch (q_distinct_tokens_by_source_kmv)."""

import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
class TestGroupedKMV:
    def test_exact_below_k_and_estimate_above_k(self):
        from dedup_restore_ray.queries import q_distinct_tokens_by_source_kmv
        rng = np.random.default_rng(23)
        texts, sources = [], []
        # "small": 30 distinct tokens (< k=64) -> estimate is EXACT
        for i in range(20):
            texts.append(" ".join(f"s{rng.integers(30)}"
                                  for _ in range(25)))
            sources.append("small")
        # "big": ~2000 distinct tokens -> KMV estimate within ~25%
        for i in range(200):
            texts.append(" ".join(f"b{rng.integers(2000)}"
                                  for _ in range(40)))
            sources.append("big")
        n = len(texts)
        t = pa.table({"doc_id": pa.array(np.arange(n)),
                      "text": pa.array(texts),
                      "lang": pa.array(["en"] * n),
                      "source": pa.array(sources),
                      "n_chars": pa.array(np.zeros(n, np.int64))})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            out = q_distinct_tokens_by_source_kmv(d)
        got = dict(zip(out["source"], out["est_distinct"]))
        truth = {}
        for s in ("small", "big"):
            vocab = set()
            for txt, src in zip(texts, sources):
                if src == s:
                    vocab.update(re.findall(r"\w+", txt.lower()))
            truth[s] = len(vocab)
        assert got["small"] == truth["small"]          # exact path
        assert abs(got["big"] - truth["big"]) / truth["big"] < 0.25
