"""Character-entropy quality signal (q_char_entropy_docs)."""

import math
import os
import tempfile
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _brute_entropy_micro(t):
    if not t:
        return 0
    n = len(t)
    s = sum(math.floor(c * math.log(c) * 1e6)
            for c in Counter(t).values())
    return math.floor(math.log(n) * 1e6) - s // n


@pytest.mark.usefixtures("ray_session")
class TestCharEntropy:
    def test_vs_bruteforce(self):
        from dedup_restore_ray.queries import q_char_entropy_docs
        texts = ["aaaa",                       # zero entropy
                 "abab", "hello world", "",
                 "The quick brown fox jumps over the lazy dog",
                 "你好世界你好",  # CJK repeats
                 None, "x"]
        n = len(texts)
        t = pa.table({"doc_id": pa.array(np.arange(n)),
                      "text": pa.array(texts, pa.string()),
                      "lang": pa.array(["en"] * n),
                      "source": pa.array(["s"] * n),
                      "n_chars": pa.array(np.zeros(n, np.int64))})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            from dedup_restore_ray.queries import q_char_entropy_docs
            out = (q_char_entropy_docs(d).to_pandas()
                   .sort_values("doc_id").reset_index(drop=True))
        for i, txt in enumerate(texts):
            assert out.loc[i, "entropy_micro"] == _brute_entropy_micro(txt)
            assert out.loc[i, "n_chars_text"] == len(txt or "")
        assert out.loc[0, "entropy_micro"] == 0          # 'aaaa'
        # natural English text sits in the 3.5-4.7 nat band
        assert 3_000_000 < out.loc[4, "entropy_micro"] < 4_700_000
