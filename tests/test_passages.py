"""Passage-level dedup (stages/passages.py): brute-force parity,
layout independence, degenerate docs."""

import hashlib

import pandas as pd
import pytest

from dedup_restore_ray.functions.shingle import tokenize
from dedup_restore_ray.stages.passages import passage_dedup, passage_split

W = 5  # small window so tests exercise multi-passage docs cheaply


def _mk_corpus():
    """Deterministic docs with planted shared windows (window=5):
    docs 3/4 repeat doc 1's first passage; doc 5 repeats its own
    passage internally; doc 6 empty; doc 7 shorter than one window."""
    boiler = "alpha beta gamma delta epsilon"        # one full window
    uniq = ["zeta eta theta iota kappa",
            "lambda mu nu xi omicron",
            "pi rho sigma tau upsilon",
            "phi chi psi omega one",
            "two three four five six"]
    docs = {
        1: boiler + " " + uniq[0],
        2: uniq[1] + " " + uniq[2],
        3: boiler + " " + uniq[3],
        4: boiler + " " + uniq[4],
        5: uniq[0] + " " + uniq[0],          # internal repeat
        6: "",
        7: "seven eight",                     # short single passage
    }
    return pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})


def _brute(df, window, mode, min_docs=3):
    rows = []  # (passage, doc_id, pidx)
    for _, r in df.iterrows():
        for j, p in enumerate(passage_split(tokenize(r.text), window)):
            rows.append((p, int(r.doc_id), j))
    first = {}
    for p, d, j in sorted(rows, key=lambda x: (x[1], x[2])):
        first.setdefault(p, (d, j))
    ndocs = {}
    for p, d, j in rows:
        ndocs.setdefault(p, set()).add(d)
    out = []
    for _, r in df.iterrows():
        passages = passage_split(tokenize(r.text), window)
        if mode == "first_wins":
            drop = [j for j, p in enumerate(passages)
                    if first[p] != (int(r.doc_id), j)]
        else:
            drop = [j for j, p in enumerate(passages)
                    if len(ndocs[p]) >= min_docs]
        kept = " ".join(p for j, p in enumerate(passages) if j not in drop)
        out.append({"doc_id": int(r.doc_id),
                    "n_passages": len(passages),
                    "n_dup_passages": len(drop),
                    "clean_md5": hashlib.md5(kept.encode()).hexdigest()})
    return pd.DataFrame(out).sort_values("doc_id").reset_index(drop=True)


def _ds(df):
    import pyarrow as pa
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _run(ds, **kw):
    return (passage_dedup(ds, **kw).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


class TestPassageDedup:
    def test_split_last_window_short(self):
        assert passage_split(list("abcdefg"), 3) == ["a b c", "d e f", "g"]
        assert passage_split([], 3) == []

    def test_first_wins_matches_brute(self, ray_session):
        import ray.data as rd
        df = _mk_corpus()
        got = _run(_ds(df), window=W, mode="first_wins")
        exp = _brute(df, W, "first_wins")
        pd.testing.assert_frame_equal(got, exp)
        # planted facts: docs 3/4 lose the boilerplate window; doc 5's
        # passages BOTH duplicate doc 1's second window (first-wins at
        # doc 1); doc 1 keeps everything
        by_id = got.set_index("doc_id")
        assert by_id.loc[1, "n_dup_passages"] == 0
        assert by_id.loc[3, "n_dup_passages"] == 1
        assert by_id.loc[4, "n_dup_passages"] == 1
        assert by_id.loc[5, "n_dup_passages"] == 2

    def test_frequent_matches_brute(self, ray_session):
        import ray.data as rd
        df = _mk_corpus()
        got = _run(_ds(df), window=W, mode="frequent", min_docs=3)
        exp = _brute(df, W, "frequent", min_docs=3)
        pd.testing.assert_frame_equal(got, exp)
        # boilerplate window occurs in docs 1/3/4 -> dropped everywhere
        by_id = got.set_index("doc_id")
        assert by_id.loc[1, "n_dup_passages"] == 1
        assert by_id.loc[3, "n_dup_passages"] == 1
        assert by_id.loc[4, "n_dup_passages"] == 1
        assert by_id.loc[5, "n_dup_passages"] == 0

    def test_degenerate_docs(self, ray_session):
        import ray.data as rd
        df = _mk_corpus()
        got = _run(_ds(df), window=W, mode="first_wins")
        by_id = got.set_index("doc_id")
        empty_md5 = hashlib.md5(b"").hexdigest()
        assert by_id.loc[6, "n_passages"] == 0
        assert by_id.loc[6, "clean_md5"] == empty_md5
        # a doc whose every passage is dropped hashes to md5('')
        two = pd.DataFrame({"doc_id": [1, 2],
                            "text": ["a b c d e", "a b c d e"]})
        got2 = _run(_ds(two), window=W, mode="first_wins")
        assert got2.set_index("doc_id").loc[2, "clean_md5"] == empty_md5

    def test_layout_independence(self, ray_session):
        import ray.data as rd
        df = pd.concat([_mk_corpus()] * 1, ignore_index=True)
        base = _run(_ds(df), window=W, mode="first_wins")
        shuffled = _run(_ds(df).repartition(7),
                        window=W, mode="first_wins")
        pd.testing.assert_frame_equal(base, shuffled)

    @pytest.mark.parametrize("mode", ["first_wins", "frequent"])
    def test_sf0001_consistent_with_duckdb(self, ray_session, sf_dir, mode):
        import duckdb
        from dedup_restore_ray.queries import ORACLE_SQL, QUERIES
        name = ("passage_dedup_docs" if mode == "first_wins"
                else "boilerplate_docs")
        got = (QUERIES[name](sf_dir).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
        exp = (con.sql(ORACLE_SQL[name]).df()
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestPassageTextRows:
    def test_pid_packing_and_reassembly(self):
        import pyarrow as pa
        import ray.data as rd
        from dedup_restore_ray.functions.shingle import tokenize
        from dedup_restore_ray.stages.passages import (_ORDER_BITS,
                                                       passage_text_rows)
        texts = ["one two three four five six seven",
                 "", "solo",
                 " ".join(f"w{i}" for i in range(45))]
        t = pa.table({"doc_id": list(range(4)), "text": texts})
        out = (passage_text_rows(rd.from_arrow(t), window=3)
               .to_pandas().sort_values("pid"))
        # doc 1 (empty) contributes no passages
        docs = (out["pid"].to_numpy() >> _ORDER_BITS).tolist()
        assert 1 not in docs
        # reassembled token stream == original tokenization
        for d in [0, 2, 3]:
            toks = []
            for p in out[(out["pid"].to_numpy() >> _ORDER_BITS) == d]["ptext"]:
                toks.extend(p.split(" "))
            assert toks == tokenize(texts[d])
        # passage indexes are dense from 0 per doc
        for d in [0, 3]:
            idxs = sorted(out[(out["pid"].to_numpy() >> _ORDER_BITS)
                  == d]["pid"].to_numpy()
                  & ((1 << _ORDER_BITS) - 1))
            assert idxs == list(range(len(idxs)))
