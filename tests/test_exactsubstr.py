"""ExactSubstr span dedup (stages/exactsubstr.py): brute-force
parity, layout independence, interval-merge correctness, guards."""

import numpy as np
import pandas as pd
import pytest

from dedup_restore_ray.functions.shingle import tokenize
from dedup_restore_ray.stages.exactsubstr import (exact_substring_clean,
                                                  exact_substring_spans,
                                                  exact_substring_stats)

K = 4  # small match length so tests exercise merges cheaply


def _mk_corpus():
    """Planted duplicated 4-grams: docs 1/3 share a phrase; doc 5
    repeats a phrase internally (overlapping covers must merge); doc
    2 is unique; doc 6 empty; doc 7 shorter than one gram."""
    boiler = "alpha beta gamma delta"
    docs = {
        1: boiler + " epsilon zeta eta theta",
        2: "iota kappa lambda mu nu xi",
        3: "omicron pi " + boiler + " rho",
        5: "one two " + boiler + " " + boiler + " three",
        6: "",
        7: "seven eight nine",
    }
    return pd.DataFrame({"doc_id": list(docs),
                         "text": list(docs.values())})


def _brute_spans(df, k, mode):
    """Sequential reference: positional grams -> dup occurrences ->
    per-doc merged intervals."""
    occ = []  # (doc_id, pos, gram)
    for _, r in df.iterrows():
        toks = tokenize(r.text)
        for i in range(max(len(toks) - k + 1, 0)):
            occ.append((int(r.doc_id), i, " ".join(toks[i:i + k])))
    from collections import Counter
    counts = Counter(g for _, _, g in occ)
    if mode == "all":
        flagged = [(d, p) for d, p, g in occ if counts[g] > 1]
    else:
        seen = set()
        flagged = []
        for d, p, g in sorted(occ):
            if g in seen:
                flagged.append((d, p))
            seen.add(g)
    spans = {}
    for d, p in sorted(flagged):
        cur = spans.setdefault(d, [])
        if cur and p <= cur[-1][1]:
            cur[-1][1] = max(cur[-1][1], p + k)
        else:
            cur.append([p, p + k])
    return sorted((d, s, e) for d, ivs in spans.items() for s, e in ivs)


@pytest.mark.usefixtures("ray_session")
class TestExactSubstr:

    def _run_spans(self, df, mode, **kw):
        import ray.data as rd
        out = exact_substring_spans(rd.from_pandas(df), k=K, mode=mode,
                                    **kw).to_pandas()
        return sorted(zip(out.doc_id.astype(int),
                          out.span_start.astype(int),
                          out.span_end.astype(int)))

    def test_spans_match_brute(self):
        df = _mk_corpus()
        for mode in ("all", "first_wins"):
            assert self._run_spans(df, mode) == _brute_spans(df, K, mode)

    def test_internal_repeat_merges_overlaps(self):
        # doc 5's back-to-back boiler copies: every window of the
        # repeated region duplicates, so the merged span covers the
        # whole repeated stretch as ONE interval
        df = _mk_corpus()
        got = [s for s in self._run_spans(df, "all") if s[0] == 5]
        assert len(got) == 1
        _, s, e = got[0]
        toks = tokenize(df[df.doc_id == 5].text.iloc[0])
        assert " ".join(toks[s:e]).count("alpha beta gamma delta") == 2

    def test_layout_independence(self):
        import ray.data as rd
        df = _mk_corpus()
        ref = self._run_spans(df, "all")
        shuffled = df.sample(frac=1.0, random_state=3)
        out = exact_substring_spans(
            rd.from_pandas(shuffled).repartition(7), k=K).to_pandas()
        got = sorted(zip(out.doc_id.astype(int),
                         out.span_start.astype(int),
                         out.span_end.astype(int)))
        assert got == ref

    def test_stats_cover_every_doc(self):
        import ray.data as rd
        df = _mk_corpus()
        out = (exact_substring_stats(rd.from_pandas(df), k=K)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out.doc_id) == sorted(df.doc_id)
        spans = _brute_spans(df, K, "all")
        for r in out.itertuples():
            toks = tokenize(df[df.doc_id == r.doc_id].text.iloc[0])
            want = sum(e - s for d, s, e in spans if d == r.doc_id)
            assert r.n_tokens == len(toks)
            assert r.n_dup_tokens == want
        assert (out.n_dup_tokens <= out.n_tokens).all()

    def test_clean_matches_brute(self):
        import hashlib

        import ray.data as rd
        df = _mk_corpus()
        for mode in ("first_wins", "all"):
            out = (exact_substring_clean(rd.from_pandas(df), k=K,
                                         mode=mode)
                   .to_pandas().sort_values("doc_id")
                   .reset_index(drop=True))
            assert list(out.doc_id) == sorted(df.doc_id)
            spans = _brute_spans(df, K, mode)
            for r in out.itertuples():
                toks = tokenize(df[df.doc_id == r.doc_id].text.iloc[0])
                drop = np.zeros(len(toks), dtype=bool)
                for d, s, e in spans:
                    if d == r.doc_id:
                        drop[s:e] = True
                kept = " ".join(t for t, dr in zip(toks, drop) if not dr)
                assert r.n_tokens == len(toks)
                assert r.n_dup_tokens == int(drop.sum())
                assert r.clean_md5 == hashlib.md5(
                    kept.encode()).hexdigest()
        # first_wins keeps the earliest copy: doc 1 (first in corpus
        # order) must be untouched while doc 3's shared phrase drops
        fw = (exact_substring_clean(rd.from_pandas(df), k=K,
                                    mode="first_wins").to_pandas())
        byid = fw.set_index("doc_id")
        assert byid.loc[1, "n_dup_tokens"] == 0
        assert byid.loc[3, "n_dup_tokens"] == K

    def test_guards(self):
        import ray.data as rd
        bad = pd.DataFrame({"doc_id": [-1], "text": ["a b c d e"]})
        with pytest.raises(Exception, match="doc ids"):
            exact_substring_spans(rd.from_pandas(bad),
                                  k=K).materialize()
        with pytest.raises(ValueError, match="mode"):
            exact_substring_spans(rd.from_pandas(_mk_corpus()), k=K,
                                  mode="nope")
