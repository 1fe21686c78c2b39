"""C4-style blocklist filter (q_badwords_filter_docs)."""

import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
class TestBadwordsFilter:
    def test_vs_bruteforce(self):
        from dedup_restore_ray.queries import _BLOCKLIST, q_badwords_filter_docs
        texts = ["this is fine", "what the HELL", "damn damn crap",
                 "", "hellish is not hell-ish but hell is",
                 "Stupid! moron?  ok", None]
        n = len(texts)
        t = pa.table({"doc_id": pa.array(np.arange(n)),
                      "text": pa.array(texts, pa.string()),
                      "lang": pa.array(["en"] * n),
                      "source": pa.array(["s"] * n),
                      "n_chars": pa.array(np.zeros(n, np.int64))})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            out = (q_badwords_filter_docs(d).to_pandas()
                   .sort_values("doc_id").reset_index(drop=True))
        bl = set(_BLOCKLIST)
        for i, txt in enumerate(texts):
            toks = re.findall(r"\w+", (txt or "").lower(), re.ASCII)
            nb = sum(1 for w in toks if w in bl)
            assert out.loc[i, "n_bad"] == nb, (i, txt)
            assert bool(out.loc[i, "kept"]) == (nb == 0)
        # substrings must NOT match ("hellish" is not "hell")
        assert out.loc[4, "n_bad"] == 2
