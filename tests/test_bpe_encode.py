"""BPE tokenizer APPLICATION: distributed encode counts must match
the sequential per-word reference exactly, across block layouts and
empty/degenerate inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _corpus():
    return [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the the the aaaa bbbb aaaabbbb",
        "",
        "aaaaaa",          # overlapping same-symbol runs
        "mixed CASE and   punctuation!!! 123 underscore_word",
    ] * 4


class TestBpeEncode:
    @pytest.mark.parametrize("num_blocks", [1, 5])
    def test_parity_vs_sequential_reference(self, ray_session,
                                            num_blocks):
        from dedup_restore_ray.stages.bpe import (bpe_encode_counts,
                                                  bpe_encode_reference,
                                                  bpe_train)
        texts = _corpus()
        df = pd.DataFrame({"doc_id": np.arange(len(texts)),
                           "text": texts})
        ds = rd.from_pandas(df).repartition(num_blocks)
        merges = bpe_train(ds, n_merges=12)
        assert len(merges) > 0
        got = (bpe_encode_counts(ds, merges).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        ref = bpe_encode_reference(texts, merges)
        assert list(got["n_tokens"]) == ref
        # zero merges degenerate: token count == total word chars
        got0 = (bpe_encode_counts(ds, merges.iloc[:0]).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        assert list(got0["n_tokens"]) == \
            bpe_encode_reference(texts, merges.iloc[:0])

    def test_merges_strictly_compress(self, ray_session):
        from dedup_restore_ray.stages.bpe import (bpe_encode_counts,
                                                  bpe_train)
        texts = _corpus()
        df = pd.DataFrame({"doc_id": np.arange(len(texts)),
                           "text": texts})
        ds = rd.from_pandas(df)
        merges = bpe_train(ds, n_merges=12)
        with_m = bpe_encode_counts(ds, merges).to_pandas()
        without = bpe_encode_counts(ds, merges.iloc[:0]).to_pandas()
        assert with_m["n_tokens"].sum() < without["n_tokens"].sum()
        assert (with_m["n_words"] == without["n_words"]).all()
