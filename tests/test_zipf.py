"""Zipf slope of the token rank-frequency curve (q_zipf_slope_tokens)."""

import math
import os
import re
import tempfile
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _brute_slope(texts):
    cnt = Counter()
    for t in texts:
        cnt.update(re.findall(r"\w+", (t or "").lower(), re.ASCII))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    v = len(ranked)
    sx = sy = sxy = sxx = 0
    for i, (w, c) in enumerate(ranked, start=1):
        x, y = math.log(i), math.log(c)
        sx += math.floor(x * 1e6)
        sy += math.floor(y * 1e6)
        sxy += math.floor(x * y * 1e6)
        sxx += math.floor(x * x * 1e6)
    num = (float(v) * float(sxy)) * 1e6 - float(sx) * float(sy)
    den = (float(v) * float(sxx)) * 1e6 - float(sx) * float(sx)
    return v, sx, sy, sxy, sxx, math.floor(num / den * 1e6)


@pytest.mark.usefixtures("ray_session")
class TestZipfSlope:
    def test_vs_bruteforce_zipfian_corpus(self):
        from dedup_restore_ray.queries import q_zipf_slope_tokens
        rng = np.random.default_rng(17)
        vocab = [f"w{i}" for i in range(200)]
        # draw tokens with p(rank r) ~ 1/r -> slope near -1
        p = 1.0 / np.arange(1, 201)
        p /= p.sum()
        texts = [" ".join(rng.choice(vocab, size=60, p=p))
                 for _ in range(80)]
        n = len(texts)
        t = pa.table({"doc_id": pa.array(np.arange(n)),
                      "text": pa.array(texts),
                      "lang": pa.array(["en"] * n),
                      "source": pa.array(["s"] * n),
                      "n_chars": pa.array(np.zeros(n, np.int64))})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            out = q_zipf_slope_tokens(d)
        want = _brute_slope(texts)
        got = (int(out["v"][0]), int(out["sx"][0]), int(out["sy"][0]),
               int(out["sxy"][0]), int(out["sxx"][0]),
               int(out["slope_micro"][0]))
        assert got == want
        # a 1/r-sampled corpus regresses near the Zipf exponent -1
        assert -1_400_000 < got[5] < -600_000
