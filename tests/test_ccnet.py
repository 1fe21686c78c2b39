"""CCNet perplexity bucketing (q_ccnet_buckets_docs)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
class TestCCNetBuckets:
    def test_buckets_are_per_lang_perplexity_terciles(self, sf_dir):
        from dedup_restore_ray.queries import (q_bigram_lm_docs,
                                               q_ccnet_buckets_docs)
        out = q_ccnet_buckets_docs(sf_dir).to_pandas()
        scores = q_bigram_lm_docs(sf_dir).to_pandas()
        # every scored doc (>= 2 tokens) gets exactly one bucket
        assert len(out) == len(scores)
        assert out["doc_id"].is_unique
        assert set(out["bucket"]) <= {"head", "middle", "tail"}
        # ppl_micro matches the scorer's integer contract
        merged = out.merge(scores, on="doc_id")
        expect = ((-merged["sum_logprob_micro"].to_numpy(np.int64))
                  // merged["n_bigrams"].to_numpy(np.int64))
        assert (merged["ppl_micro"].to_numpy(np.int64) == expect).all()
        for lang, g in out.groupby("lang"):
            n = len(g)
            sizes = g["bucket"].value_counts()
            # NTILE(3): first n%3 buckets get one extra row
            want = {b: n // 3 + (i < n % 3) for i, b in
                    enumerate(["head", "middle", "tail"])}
            for b, w in want.items():
                if w:
                    assert sizes.get(b, 0) == w, (lang, b)
            # head really is the low-perplexity third: every head
            # doc's ppl <= every tail doc's ppl
            if (sizes.get("head", 0) and sizes.get("tail", 0)):
                assert (g.loc[g["bucket"] == "head", "ppl_micro"].max()
                        <= g.loc[g["bucket"] == "tail",
                                 "ppl_micro"].min())
