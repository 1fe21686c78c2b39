"""Similarity-search and text-analysis kernels (pure numpy)."""

import numpy as np
import pytest

from dedup_restore_ray.functions.similarity import (cosine_topk_block,
                                                    ivf_assign, kmeans_fit,
                                                    l2_normalize, merge_topk)
from dedup_restore_ray.functions.textstats import (bpe_token_count,
                                                   detect_language,
                                                   quality_features)


class TestCosineTopK:
    def test_exact_vs_bruteforce(self):
        rng = np.random.default_rng(0)
        corpus = rng.standard_normal((200, 16))
        queries = rng.standard_normal((3, 16))
        qn = l2_normalize(queries)
        ids = np.arange(200, dtype=np.int64)
        # blockwise: two blocks merged
        i1, s1 = cosine_topk_block(qn, corpus[:120], ids[:120], 5)
        i2, s2 = cosine_topk_block(qn, corpus[120:], ids[120:], 5)
        mi, ms = merge_topk([i1, i2], [s1, s2], 5)
        # oracle
        full = qn @ l2_normalize(corpus).T
        for q in range(3):
            expect = np.argsort(-full[q], kind="stable")[:5]
            assert set(mi[q]) == set(expect)
            assert np.allclose(sorted(ms[q], reverse=True),
                               sorted(full[q][expect], reverse=True))

    def test_merge_tiebreak_by_id(self):
        ids = np.array([[5, 3]], dtype=np.int64)
        scores = np.array([[0.5, 0.5]])
        mi, _ = merge_topk([ids], [scores], 2)
        assert mi[0].tolist() == [3, 5]


class TestIVF:
    def test_kmeans_deterministic(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((300, 8))
        c1 = kmeans_fit(x, 4, seed=42)
        c2 = kmeans_fit(x, 4, seed=42)
        assert np.array_equal(c1, c2)

    def test_assign_covers_all_lists(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((400, 8))
        cent = kmeans_fit(x, 4, seed=42)
        lists = ivf_assign(x, cent)
        assert set(np.unique(lists)) <= {0, 1, 2, 3}
        assert len(np.unique(lists)) >= 2


class TestTextStats:
    def test_langid_obvious(self):
        assert detect_language("the cat and the dog are in the house") == "en"
        assert detect_language("der Hund und die Katze sind in dem Haus") == "de"
        assert detect_language("le chat et le chien dans la maison") == "fr"
        assert detect_language("el gato y el perro en la casa") == "es"
        assert detect_language("数据 处理 系统 管道 数据 处理") == "zh"
        assert detect_language("") == "und"
        assert detect_language("zzz qqq xxx") == "und"

    def test_quality_monotone_in_substance(self):
        feats = quality_features([
            "The quick brown fox jumps over the lazy dog and keeps going "
            "with a perfectly ordinary sentence of reasonable length.",
            "!!! ??? ### $$$ %%%",
            "",
        ])
        assert feats["quality_score"][0] > feats["quality_score"][1]
        assert feats["quality_score"][2] == 0.0
        assert feats["n_tokens"][2] == 0

    def test_bpe_count_positive(self):
        assert bpe_token_count("Hello, world! It's fine.") >= 6
        assert bpe_token_count("") == 0


class TestPIIScrub:
    """Arrow-RE2 scrub must be bit-identical to DuckDB's nested
    regexp_replace chain (same regex engine, same nesting order) on
    text that actually contains PII."""

    TEXTS = [
        "contact a.b+c@foo-bar.co.uk or x@y.io today",
        "server at 10.0.255.3 fell over; backup 192.168.1.1.",
        "call +1 555-123-4567 or 020 7946 0958 now",
        "mixed: bob@corp.com from 8.8.8.8 dialed 555-000-1111",
        "no pii here, just words and numbers like 42",
        "",
        "edge e@e.ee 1.2.3.4 12345678901",
    ]

    def test_matches_duckdb(self):
        import duckdb
        import pyarrow as pa
        from dedup_restore_ray.functions.pii import (PII_PATTERNS,
                                                     scrub_batch)
        clean, counts = scrub_batch(pa.array(self.TEXTS))
        con = duckdb.connect()
        t = "coalesce(s, '')"
        sql_counts = []
        for _, pat, repl in PII_PATTERNS:
            sql_counts.append(f"len(regexp_extract_all({t}, '{pat}'))")
            t = f"regexp_replace({t}, '{pat}', '{repl}', 'g')"
        rows = con.execute(
            f"SELECT {t}, {', '.join(sql_counts)} FROM "
            "(SELECT unnest(?) AS s)", [self.TEXTS]).fetchall()
        assert [r[0] for r in rows] == clean.to_pylist()
        for k, (name, _, _) in enumerate(PII_PATTERNS):
            assert [r[1 + k] for r in rows] == counts[name].to_pylist()

    def test_redaction_happened(self):
        import pyarrow as pa
        from dedup_restore_ray.functions.pii import scrub_batch
        clean, counts = scrub_batch(pa.array(self.TEXTS))
        got = "\n".join(clean.to_pylist())
        assert "<EMAIL>" in got and "<IP>" in got and "<PHONE>" in got
        assert "@" not in got
        assert sum(counts["email"].to_pylist()) == 4


@pytest.mark.usefixtures("ray_session")
class TestBigramLM:
    """q_bigram_lm_docs: vectorized scorer == sequential reference."""

    def test_matches_sequential_reference(self, tmp_path):
        import math
        from collections import Counter

        import pandas as pd
        from dedup_restore_ray.functions.shingle import tokenize
        from dedup_restore_ray.queries import QUERIES

        df = pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["the cat sat on the mat",
                     "the cat sat",        # shared bigrams
                     "solo",                # 1 token: no bigram
                     "",                    # empty
                     "on the mat on the"]})
        df.to_parquet(tmp_path / "documents.parquet")
        out = (QUERIES["bigram_lm_docs"](str(tmp_path)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))

        c2: Counter = Counter()
        c1: Counter = Counter()
        docs = {r.doc_id: tokenize(r.text) for r in df.itertuples()}
        for toks in docs.values():
            for a, b in zip(toks, toks[1:]):
                c2[(a, b)] += 1
                c1[a] += 1
        want = {}
        for did, toks in docs.items():
            pairs = list(zip(toks, toks[1:]))
            if not pairs:
                continue
            s = sum(math.floor(math.log(c2[p] / c1[p[0]]) * 1e6)
                    for p in pairs)
            want[did] = (len(pairs), s)
        assert dict(zip(out.doc_id,
                        zip(out.n_bigrams, out.sum_logprob_micro))) == want
        assert set(out.doc_id) == {1, 2, 5}


class TestArrowTextKernels:
    """The Arrow-vectorized quality/langid kernels must be BIT-equal to
    the per-doc Python references on every row class: ASCII, unicode,
    CJK, empty, null, control chars (VERDICT r4 #1 — the references
    stay as the parity gate)."""

    CORPUS = [
        "The quick brown Fox; it was THE best of times!!! and of it",
        "", None,
        "für die männer und frauen in der stadt ist das nicht gut",
        "de la que el en y a los se del las un por",
        "这是一个中文文档 里面有很多汉字 足够触发中文判定的长度啊",
        "no_stop words here zqx vvv mmm",
        "punct\v\f\ttabs and\nnewlines mixed \x0b ok! #$%^&*",
        "a" * 300, "UPPER CASE SHOUTING TEXT WITH THE AND OF",
        "mixed ascii and ünïcode tökens the of and to",
        "   ", "!!! ??? ...",
        "le la de et les des en un du",
        "the the the para por con un una y los",  # en/es tie shapes
    ]

    def test_quality_counts_parity(self):
        import pyarrow as pa
        from dedup_restore_ray.functions.textstats import (
            quality_filter_counts, quality_filter_counts_arrow)
        ref = quality_filter_counts(
            ["" if t is None else t for t in self.CORPUS])
        got = quality_filter_counts_arrow(
            pa.array(self.CORPUS, pa.string()))
        for k in ref:
            assert np.array_equal(ref[k], got[k]), k

    def test_langid_parity(self):
        import pyarrow as pa
        from dedup_restore_ray.functions.textstats import (
            detect_language, detect_language_arrow)
        ref = [detect_language(t) for t in self.CORPUS]
        got = list(detect_language_arrow(
            pa.array(self.CORPUS, pa.string())))
        assert ref == got

    def test_quality_counts_empty_and_chunked(self):
        import pyarrow as pa
        from dedup_restore_ray.functions.textstats import \
            quality_filter_counts_arrow
        empty = quality_filter_counts_arrow(pa.array([], pa.string()))
        assert all(len(v) == 0 for v in empty.values())
        chunked = pa.chunked_array([
            pa.array(self.CORPUS[:5], pa.string()),
            pa.array(self.CORPUS[5:], pa.string())])
        flat = quality_filter_counts_arrow(
            pa.array(self.CORPUS, pa.string()))
        got = quality_filter_counts_arrow(chunked)
        for k in flat:
            assert np.array_equal(flat[k], got[k]), k

    def test_gram_rows_parity(self):
        """Vectorized _gram_rows == per-doc shingle reference, and
        < k-token docs emit nothing."""
        import pyarrow as pa
        from dedup_restore_ray.functions.hashing import WordHasher
        from dedup_restore_ray.functions.shingle import (
            shingle_hashes_for_tokens, tokenize)
        from dedup_restore_ray.pipelines.prep import _gram_rows

        texts = [t for t in self.CORPUS if t is not None]
        ids = list(range(len(texts)))
        b = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        k = 5
        got = _gram_rows("text", "doc_id", k, True)(b).to_pandas()

        hasher = WordHasher()
        exp = []
        for i, t in enumerate(texts):
            toks = tokenize(t)
            if len(toks) < k:
                continue
            for g in shingle_hashes_for_tokens(
                    hasher.hash_words(toks), k):
                exp.append((int(g), i))
        got_set = sorted(zip(got["gram"].astype("uint64").tolist(),
                             got["doc_id"].tolist()))
        assert got_set == sorted(exp)
