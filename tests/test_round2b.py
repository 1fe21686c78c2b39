"""Round-2 additions: inverted index, ranking windows, source overlap."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from dedup_restore_ray.functions.shingle import tokenize


def _docs_frame(n=120, n_sources=4, seed=3):
    rng = np.random.default_rng(seed)
    vocab = ["join", "hash", "scan", "window", "table", "spark",
             "vector", "row", "batch", "merge"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(n)]
    # plant exact dups across sources
    for i in range(0, n, 5):
        texts[i] = texts[(i + 7) % n]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "source": [f"s{int(x)}" for x in rng.integers(0, n_sources, n)],
    })


class TestInvertedIndex:
    def test_lookup_matches_bruteforce_and_prunes(self, ray_session,
                                                  tmp_path):
        from dedup_restore_ray.stages.invindex import InvertedIndex
        df = _docs_frame()
        idx_dir = str(tmp_path / "inv")
        idx = InvertedIndex.build(rd.from_pandas(df).repartition(5),
                                  idx_dir, num_buckets=16)
        terms = ["join", "vector", "absent_term"]
        post, metrics = idx.lookup(terms)
        got = (post.to_pandas().sort_values(["term", "doc_id"])
               .reset_index(drop=True))
        exp_rows = [(t, int(d)) for d, txt in zip(df.doc_id, df.text)
                    for t in sorted(set(tokenize(txt))) if t in terms]
        exp = (pd.DataFrame(exp_rows, columns=["term", "doc_id"])
               .sort_values(["term", "doc_id"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)
        # pruning: <= one bucket per distinct term, never the full index
        assert metrics["partitions_read"] <= len(terms)
        assert metrics["partitions_read"] < metrics["partitions_total"]

    def test_append_equals_rebuild(self, ray_session, tmp_path):
        from dedup_restore_ray.stages.invindex import InvertedIndex
        df = _docs_frame()
        half = len(df) // 2
        inc_dir = str(tmp_path / "inc")
        idx = InvertedIndex.build(
            rd.from_pandas(df.iloc[:half]).repartition(3), inc_dir,
            num_buckets=16)
        n_added = idx.append(
            rd.from_pandas(df.iloc[half:]).repartition(4))
        assert n_added > 0
        full_dir = str(tmp_path / "full")
        full = InvertedIndex.build(rd.from_pandas(df), full_dir,
                                   num_buckets=16)
        assert idx.num_rows == full.num_rows
        for terms in (["join"], ["vector", "hash"], ["absent_term"]):
            a, _ = idx.term_doc_counts(terms)
            b, _ = full.term_doc_counts(terms)
            pd.testing.assert_frame_equal(
                a.sort_values("term").reset_index(drop=True),
                b.sort_values("term").reset_index(drop=True))
        # meta manifest reflects the merged size -> a rebuild call
        # with matching config resumes without re-tokenizing
        again = InvertedIndex.build(rd.from_pandas(df.iloc[:half]),
                                    inc_dir, num_buckets=16)
        assert again.num_rows == idx.num_rows

    def test_build_is_resumable(self, ray_session, tmp_path):
        from dedup_restore_ray.stages.invindex import InvertedIndex
        df = _docs_frame(n=30)
        idx_dir = str(tmp_path / "inv2")
        InvertedIndex.build(rd.from_pandas(df), idx_dir, num_buckets=8)
        meta_mtime = os.path.getmtime(os.path.join(idx_dir, "meta.json"))
        idx2 = InvertedIndex.build(rd.from_pandas(df), idx_dir,
                                   num_buckets=8)
        assert os.path.getmtime(
            os.path.join(idx_dir, "meta.json")) == meta_mtime
        assert idx2.num_rows > 0

    def test_term_doc_counts(self, ray_session, tmp_path):
        from dedup_restore_ray.stages.invindex import InvertedIndex
        df = _docs_frame()
        idx = InvertedIndex.build(rd.from_pandas(df),
                                  str(tmp_path / "inv3"), num_buckets=8)
        out, _ = idx.term_doc_counts(["join", "hash"])
        out = out.sort_values("term").reset_index(drop=True)
        for t in ["hash", "join"]:
            docs = [int(d) for d, txt in zip(df.doc_id, df.text)
                    if t in tokenize(txt)]
            row = out[out.term == t].iloc[0]
            assert row.n_docs == len(docs)
            assert row.sum_doc_id == sum(docs)


class TestPhraseSearch:
    @staticmethod
    def _brute(df, phrase):
        k = len(phrase)
        out = {}
        for d, txt in zip(df.doc_id, df.text):
            t = tokenize(txt)
            c = sum(1 for i in range(len(t) - k + 1)
                    if t[i:i + k] == phrase)
            if c:
                out[int(d)] = c
        return out

    @pytest.mark.parametrize("num_blocks", [1, 6])
    def test_parity_vs_bruteforce(self, ray_session, tmp_path,
                                  num_blocks):
        from dedup_restore_ray.stages.invindex import InvertedIndex
        df = _docs_frame(n=150, seed=9)
        idx = InvertedIndex.build(
            rd.from_pandas(df).repartition(num_blocks),
            str(tmp_path / "ph"), num_buckets=8)
        for phrase in (["join", "hash"], ["hash", "hash"],
                       ["scan", "window", "table"]):
            out, _ = idx.phrase_lookup(phrase)
            got = dict(zip(*[out.to_pandas().get(c, [])
                             for c in ("doc_id", "n_occurrences")]))
            got = {int(k): int(v) for k, v in got.items()}
            assert got == self._brute(df, phrase), phrase

    def test_overlapping_occurrences(self, ray_session, tmp_path):
        from dedup_restore_ray.stages.invindex import InvertedIndex
        df = pd.DataFrame({"doc_id": np.array([1, 2], dtype=np.int64),
                           "text": ["a a a a", "b a a b"]})
        idx = InvertedIndex.build(rd.from_pandas(df),
                                  str(tmp_path / "ov"), num_buckets=4)
        out, _ = idx.phrase_lookup(["a", "a"])
        got = {int(r.doc_id): int(r.n_occurrences)
               for r in out.to_pandas().itertuples()}
        assert got == {1: 3, 2: 1}

    def test_absent_phrase(self, ray_session, tmp_path):
        from dedup_restore_ray.stages.invindex import InvertedIndex
        df = _docs_frame(n=20)
        idx = InvertedIndex.build(rd.from_pandas(df),
                                  str(tmp_path / "ab"), num_buckets=4)
        out, _ = idx.phrase_lookup(["join", "zzz_absent"])
        assert out.count() == 0


class TestBM25:
    def test_contributions_match_bruteforce(self, ray_session, tmp_path):
        from dedup_restore_ray.stages.invindex import InvertedIndex
        df = _docs_frame()
        idx = InvertedIndex.build(rd.from_pandas(df).repartition(4),
                                  str(tmp_path / "bm"), num_buckets=8)
        terms = ["join", "vector"]
        scores, metrics = idx.bm25_contributions(terms)
        got = (scores.to_pandas()
               .sort_values(["doc_id", "term"]).reset_index(drop=True))
        assert metrics["partitions_read"] <= len(terms)

        toks = {int(d): tokenize(t) for d, t in zip(df.doc_id, df.text)}
        nz = {d: t for d, t in toks.items() if t}
        n = len(nz)
        avgdl = sum(len(t) for t in nz.values()) / n
        rows = []
        for term in terms:
            dfreq = sum(1 for t in nz.values() if term in t)
            if dfreq == 0:
                continue
            idf = np.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
            for d, t in sorted(nz.items()):
                tf = t.count(term)
                if tf == 0:
                    continue
                dl = len(t)
                s = idf * (tf * 2.2) / (
                    tf + 1.2 * (1 - 0.75 + (0.75 * dl) / avgdl))
                rows.append((d, term, s))
        exp = (pd.DataFrame(rows, columns=["doc_id", "term", "bm25"])
               .sort_values(["doc_id", "term"]).reset_index(drop=True))
        assert len(got) == len(exp)
        assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()
        assert (got.term.to_numpy() == exp.term.to_numpy()).all()
        np.testing.assert_allclose(got.bm25.to_numpy(),
                                   exp.bm25.to_numpy(), rtol=1e-12)


class TestRankWindows:
    @pytest.mark.parametrize("num_blocks", [1, 9])
    def test_parity_vs_pandas(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import rank_windows
        rng = np.random.default_rng(11)
        n = 500
        df = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 17, n).astype(np.int64),
            # coarse values -> plenty of ties inside groups
            "val": rng.integers(0, 6, n).astype(np.int64),
        })
        got = (rank_windows(rd.from_pandas(df).repartition(num_blocks),
                            key_col="key", value_col="val",
                            tiebreak_col="id", n_tiles=4,
                            carry_cols=["id", "key"])
               .to_pandas().sort_values("id").reset_index(drop=True))

        g = df.groupby("key")["val"]
        exp_rnk = g.rank(method="min").astype(np.int64)
        exp_drnk = g.rank(method="dense").astype(np.int64)
        # SQL ntile: order by (val, id); first size%n buckets get one
        # extra row
        tiles = np.zeros(n, dtype=np.int64)
        for _, grp in df.sort_values(["val", "id"]).groupby("key"):
            s = len(grp)
            base, rem = divmod(s, 4)
            sizes = [base + 1] * rem + [base] * (4 - rem)
            sizes = [x for x in sizes if x > 0]
            t = np.repeat(np.arange(1, len(sizes) + 1), sizes)
            tiles[grp.index.to_numpy()] = t[:s]
        assert (got["rnk"].to_numpy()
                == exp_rnk[got["id"]].to_numpy()).all()
        assert (got["drnk"].to_numpy()
                == exp_drnk[got["id"]].to_numpy()).all()
        assert (got["tile"].to_numpy()
                == tiles[got["id"].to_numpy()]).all()

    def test_small_groups(self, ray_session):
        from dedup_restore_ray.stages.windows import rank_windows
        df = pd.DataFrame({"id": [0, 1, 2], "key": [1, 1, 2],
                           "val": [5, 5, 3]})
        got = (rank_windows(rd.from_pandas(df), key_col="key",
                            value_col="val", tiebreak_col="id",
                            n_tiles=4, carry_cols=["id", "key"])
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert got["rnk"].tolist() == [1, 1, 1]
        assert got["drnk"].tolist() == [1, 1, 1]
        # group of 2 with ntile(4): every row its own tile
        assert got["tile"].tolist() == [1, 2, 1]


class TestGroupedCountDistinct:
    @pytest.mark.parametrize("num_blocks", [1, 8])
    def test_parity_vs_pandas(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.groups import grouped_count_distinct
        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "key": rng.integers(0, 40, 1000).astype(np.int64),
            "val": rng.integers(0, 15, 1000).astype(np.int64),
        })
        got = (grouped_count_distinct(
            rd.from_pandas(df).repartition(num_blocks),
            ["key"], "val", out_col="nd", count_alias="n")
            .to_pandas().sort_values("key").reset_index(drop=True))
        exp = (df.groupby("key").agg(nd=("val", "nunique"),
                                     n=("val", "size"))
               .reset_index())
        assert (got["key"].to_numpy() == exp["key"].to_numpy()).all()
        assert (got["nd"].to_numpy() == exp["nd"].to_numpy()).all()
        assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


class TestSourceOverlap:
    @pytest.mark.parametrize("num_blocks", [1, 6])
    def test_parity_vs_join(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.exact import source_overlap_matrix
        df = _docs_frame()
        rows = pd.DataFrame({
            "content_hash": [t.encode() for t in df.text],
            "source": df.source,
        })
        got = (source_overlap_matrix(
            rd.from_pandas(rows).repartition(num_blocks))
            .to_pandas().sort_values(["source_a", "source_b"])
            .reset_index(drop=True))
        j = df.merge(df, on="text")
        j = j[j.source_x < j.source_y]
        exp = (j.groupby(["source_x", "source_y"]).size()
               .reset_index(name="n_pairs")
               .rename(columns={"source_x": "source_a",
                                "source_y": "source_b"})
               .sort_values(["source_a", "source_b"])
               .reset_index(drop=True))
        exp["n_pairs"] = exp["n_pairs"].astype(np.int64)
        pd.testing.assert_frame_equal(got, exp)

    def test_no_overlap(self, ray_session):
        from dedup_restore_ray.stages.exact import source_overlap_matrix
        rows = pd.DataFrame({"content_hash": [b"a", b"b", b"c"],
                             "source": ["s0", "s1", "s2"]})
        got = source_overlap_matrix(rd.from_pandas(rows)).to_pandas()
        assert len(got) == 0
