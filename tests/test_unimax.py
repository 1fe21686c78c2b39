"""UniMax language-budget allocation (q_unimax_alloc_docs)."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_unimax(n_by_lang: dict, epoch_cap: int) -> dict:
    """Sequential water-filling reference in integer micro-docs."""
    order = sorted(n_by_lang.items(), key=lambda kv: (kv[1], kv[0]))
    rem = sum(n_by_lang.values()) * 1_000_000
    k = len(order)
    out = {}
    for lang, n in order:
        a = min(n * epoch_cap * 1_000_000, rem // k)
        out[lang] = a
        rem -= a
        k -= 1
    return out


@pytest.mark.usefixtures("ray_session")
class TestUniMax:
    def test_vs_brute_and_invariants(self, sf_dir):
        from dedup_restore_ray.queries import q_unimax_alloc_docs
        cap = 3
        w = q_unimax_alloc_docs(sf_dir, epoch_cap=cap).to_pandas()
        per_lang = (w.groupby("lang")
                     .agg(n=("n_docs", "first"), a=("alloc_micro", "first"),
                          rows=("doc_id", "size")))
        # n_docs is the real per-language row count
        assert (per_lang["n"] == per_lang["rows"]).all()
        ref = _brute_unimax(per_lang["n"].to_dict(), cap)
        assert per_lang["a"].to_dict() == ref
        # budget conserved: total allocation == one corpus epoch, up
        # to the integer-floor remainders of the sequential division
        total = int(per_lang["n"].sum()) * 1_000_000
        assert 0 <= total - int(per_lang["a"].sum()) < len(per_lang)
        # nobody exceeds the epoch cap; per-doc mass is the floor share
        assert (per_lang["a"] <= per_lang["n"] * cap * 1_000_000).all()
        assert (w["w_micro"] == w["alloc_micro"] // w["n_docs"]).all()

    def test_null_lang_dropped_like_oracle(self):
        # NULL-lang docs must drop (the SQL oracle's JOIN ON lang
        # excludes them), not crash the attach
        import ray.data as rd
        from dedup_restore_ray.queries import q_unimax_alloc_docs
        import os
        import tempfile
        import pyarrow.parquet as pq

        langs = ["en", "en", None, "fr", None, "en"]
        t = pa.table({"doc_id": pa.array(np.arange(len(langs))),
                      "text": pa.array(["x"] * len(langs)),
                      "lang": pa.array(langs, pa.string()),
                      "source": pa.array(["s"] * len(langs)),
                      "n_chars": pa.array(np.ones(len(langs), np.int64))})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            w = q_unimax_alloc_docs(d, epoch_cap=3).to_pandas()
        assert len(w) == 4                      # the two NULLs dropped
        assert set(w["lang"]) == {"en", "fr"}
        # budget is ONE epoch over the non-null corpus (4 docs)
        assert 0 <= 4_000_000 - int(
            w.groupby("lang")["alloc_micro"].first().sum()) < 2

    def test_cap_binds_only_small_languages(self):
        # synthetic skewed corpus: tiny languages hit the 3-epoch cap,
        # the surplus flows to the largest language
        import ray.data as rd
        from dedup_restore_ray.queries import q_unimax_alloc_docs
        import os
        import tempfile

        n = {"aa": 2, "bb": 5, "en": 993}
        langs = [l for l, c in n.items() for _ in range(c)]
        t = pa.table({"doc_id": pa.array(np.arange(len(langs))),
                      "text": pa.array(["x"] * len(langs)),
                      "lang": pa.array(langs),
                      "source": pa.array(["s"] * len(langs)),
                      "n_chars": pa.array(np.ones(len(langs), np.int64))})
        with tempfile.TemporaryDirectory() as d:
            import pyarrow.parquet as pq
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            w = q_unimax_alloc_docs(d, epoch_cap=3).to_pandas()
        got = (w.groupby("lang")["alloc_micro"].first()).to_dict()
        assert got["aa"] == 2 * 3 * 1_000_000
        assert got["bb"] == 5 * 3 * 1_000_000
        assert got["en"] == 1000 * 1_000_000 - got["aa"] - got["bb"]
