"""Term inverted index as a persisted, hash-partitioned structure.

The text-search sibling of the IVF vector index (stages/ann.py) and
the distributed answer to the reference's disk hash index
(src/index.c hash-bucketed fingerprint files): posting rows
``(term, doc_id)`` are shuffled ONCE by term-hash bucket and persisted
as partitioned Parquet (one directory per bucket, terms sorted inside
each file).  A term lookup then reads ONLY the probed buckets'
partitions — query cost scales with ``len(terms)/num_buckets`` of the
index, not the corpus.

Scale notes (the 100-TB discipline):
- Build is one tokenize pass + ONE sort; posting volume is
  sum(distinct terms per doc) rows of (uint8 bucket, term, int64 id) —
  the dominant cost, and irreducible for an index build.
- Buckets are term-hash partitions, so a hot term concentrates in one
  bucket *file range* but never forces a driver-side structure; a
  probe for K terms opens <= K bucket directories.
- The meta.json manifest makes the build resumable/skippable, exactly
  like IVFIndex (same pattern as the reference's container manifests).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from dedup_restore_ray.functions.hashing import WordHasher
from dedup_restore_ray.functions.shingle import tokenize

_HASHER = WordHasher(seed=11)   # per-worker-process term-hash cache


def _term_buckets(terms: list[str], num_buckets: int) -> np.ndarray:
    h = _HASHER.hash_words(terms)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _index_files(index_dir: str) -> list[str]:
    """Parquet files of every bucket partition (skips meta.json)."""
    return [os.path.join(index_dir, d, f)
            for d in sorted(os.listdir(index_dir))
            if d.startswith("bucket=")
            for f in sorted(os.listdir(os.path.join(index_dir, d)))
            if f.endswith(".parquet")]


def _postings_fn(id_col: str, text_col: str, num_buckets: int):
    """Batch -> posting rows (bucket, term, id, tf, doc_len,
    positions); shared by build and append so both write the
    identical layout."""

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_t: list[str] = []
        out_d: list[int] = []
        out_tf: list[int] = []
        out_dl: list[int] = []
        out_pos: list[list[int]] = []
        for d, t in zip(ids, texts):
            toks = tokenize(t)
            # positions per distinct term (scoring postings need
            # tf + doc length for BM25; phrase queries need the
            # positions themselves)
            where: dict[str, list[int]] = {}
            for i, w in enumerate(toks):
                where.setdefault(w, []).append(i)
            terms = sorted(where)
            out_t.extend(terms)
            out_tf.extend(len(where[w]) for w in terms)
            out_pos.extend(where[w] for w in terms)
            out_d.extend([d] * len(terms))
            out_dl.extend([len(toks)] * len(terms))
        return pa.table({
            "bucket": pa.array(_term_buckets(out_t, num_buckets),
                               pa.int64()),
            "term": pa.array(out_t, pa.string()),
            id_col: pa.array(out_d, pa.int64()),
            "tf": pa.array(out_tf, pa.int64()),
            "doc_len": pa.array(out_dl, pa.int64()),
            "positions": pa.array(out_pos, pa.list_(pa.int32()))})

    return postings


class InvertedIndex:
    """Partitioned term->doc_id index over a document Dataset."""

    def __init__(self, index_dir: str, num_buckets: int, num_rows: int):
        self.index_dir = index_dir
        self.num_buckets = num_buckets
        self.num_rows = num_rows

    # ----------------------------------------------------------------
    @classmethod
    def build(cls, docs: "rd.Dataset", index_dir: str,
              num_buckets: int = 32, id_col: str = "doc_id",
              text_col: str = "text") -> "InvertedIndex":
        meta_path = os.path.join(index_dir, "meta.json")
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))
            if (meta.get("num_buckets") == num_buckets
                    and meta.get("schema") == 3):
                return cls(index_dir, num_buckets, meta["num_rows"])
        if os.path.isdir(index_dir):
            # stale / older-schema build: a partitioned write does not
            # remove existing files, so clear before rebuilding
            import shutil
            shutil.rmtree(index_dir)

        postings = _postings_fn(id_col, text_col, num_buckets)

        # ONE sort: clusters each bucket contiguously (few files per
        # partition dir — the IVF lesson) AND orders terms inside each
        # file so bucket scans are merge-friendly.
        post = docs.map_batches(postings, batch_format="pyarrow")
        (post.sort(["bucket", "term", id_col])
             .write_parquet(index_dir, partition_cols=["bucket"]))
        # metadata-only count over the written files (the tokenize
        # pass runs exactly once)
        n = rd.read_parquet(_index_files(index_dir)).count()
        json.dump({"num_buckets": num_buckets, "num_rows": n,
                   "schema": 3},
                  open(meta_path, "w"))
        return cls(index_dir, num_buckets, n)

    # ----------------------------------------------------------------
    def append(self, docs: "rd.Dataset", id_col: str = "doc_id",
               text_col: str = "text") -> int:
        """Incremental index maintenance: tokenize ONLY the new
        documents, sort their postings by (bucket, term, id) and add
        the files into the existing bucket partition dirs — the
        partitioned write is additive (unique file names per write),
        so probes transparently merge old and new postings and the
        original corpus is never re-tokenized (the same
        append-don't-rebuild discipline as ann_ivf_append).  The
        caller owns dedup: appending docs already indexed duplicates
        their postings.  Returns the number of posting rows added."""
        post = (docs.map_batches(
            _postings_fn(id_col, text_col, self.num_buckets),
            batch_format="pyarrow")
            .sort(["bucket", "term", id_col]).materialize())
        n_new = post.count()
        if n_new:
            post.write_parquet(self.index_dir,
                               partition_cols=["bucket"])
        self.num_rows += n_new
        meta_path = os.path.join(self.index_dir, "meta.json")
        json.dump({"num_buckets": self.num_buckets,
                   "num_rows": self.num_rows, "schema": 3},
                  open(meta_path, "w"))
        return n_new

    # ----------------------------------------------------------------
    def _bucket_dir(self, b: int) -> str:
        return os.path.join(self.index_dir, f"bucket={b}")

    def _all_files(self) -> list[str]:
        return _index_files(self.index_dir)

    def lookup(self, terms: list[str], id_col: str = "doc_id",
               columns: list[str] | None = None
               ) -> tuple["rd.Dataset", dict]:
        """Postings for ``terms`` via a pruned read of ONLY the probed
        bucket partitions.  Returns (postings Dataset with columns
        [term, id_col] (+ ``columns`` extras), metrics with
        ``partitions_read``)."""
        from dedup_restore_ray.sources.io import read_parquet_clean
        want = sorted(set(terms))
        buckets = sorted({int(b) for b in
                          _term_buckets(want, self.num_buckets)
                          if os.path.isdir(self._bucket_dir(int(b)))})
        metrics = {"partitions_read": len(buckets),
                   "partitions_total": self.num_buckets,
                   "terms": len(want)}
        cols = columns or ["term", id_col]
        if not buckets:
            typ = {"term": pa.string()}
            empty = pa.table({c: pa.array([], typ.get(c, pa.int64()))
                              for c in cols})
            return rd.from_arrow(empty), metrics
        files = [os.path.join(self._bucket_dir(b), f)
                 for b in buckets
                 for f in sorted(os.listdir(self._bucket_dir(b)))
                 if f.endswith(".parquet")]
        ds = read_parquet_clean(files, columns=cols)
        want_arr = pa.array(want, pa.string())

        def filt(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch.column("term"),
                                         value_set=want_arr))

        return ds.map_batches(filt, batch_format="pyarrow"), metrics

    def corpus_stats(self, id_col: str = "doc_id") -> tuple[int, float]:
        """(n_docs, avg doc length) over the indexed corpus — cached
        in meta.json after the first computation.  One distinct pass
        over the 16-byte (doc_id, doc_len) projection of the index
        (docs with zero tokens have no postings and are excluded, as
        in any search index)."""
        meta_path = os.path.join(self.index_dir, "meta.json")
        meta = json.load(open(meta_path))
        if "n_docs" in meta:
            return meta["n_docs"], meta["avgdl"]
        from dedup_restore_ray.sources.io import read_parquet_clean
        from dedup_restore_ray.stages.groups import distinct_rows
        # a doc has exactly one length, so distinct over the pair IS
        # distinct docs (distinct_rows projects to its key columns)
        docs = distinct_rows(
            read_parquet_clean(self._all_files(),
                               columns=[id_col, "doc_len"]),
            [id_col, "doc_len"])

        def partial(b: pa.Table) -> pa.Table:
            dl = np.asarray(b.column("doc_len"), dtype=np.int64)
            return pa.table({"n": pa.array([len(dl)], pa.int64()),
                             "s": pa.array([int(dl.sum())], pa.int64())})

        parts = docs.map_batches(partial, batch_format="pyarrow"
                                 ).to_pandas()
        n_docs = int(parts["n"].sum())
        avgdl = float(parts["s"].sum()) / n_docs if n_docs else 0.0
        meta.update(n_docs=n_docs, avgdl=avgdl)
        json.dump(meta, open(meta_path, "w"))
        return n_docs, avgdl

    def bm25_contributions(self, terms: list[str], k1: float = 1.2,
                           b: float = 0.75, id_col: str = "doc_id"
                           ) -> tuple["rd.Dataset", dict]:
        """Per-(doc, term) Okapi BM25 contribution for the query
        ``terms`` (Robertson et al.; the Lucene ``+1`` idf variant so
        scores stay positive)::

            idf  = ln((N - df + 0.5) / (df + 0.5) + 1)
            part = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

        Emitting per-term contributions (one grouped sum away from
        per-doc totals) keeps every value a pure scalar formula —
        deterministic across engines, no float-addition-order
        dependence.  Two pruned passes over the probed buckets: df
        per term (tiny aggregate), then scoring with the <=|terms|-row
        idf table broadcast."""
        n_docs, avgdl = self.corpus_stats(id_col=id_col)
        from dedup_restore_ray.stages.groups import grouped_aggregate
        post, metrics = self.lookup(
            terms, id_col=id_col, columns=["term", id_col, "tf",
                                           "doc_len"])
        df_pdf = grouped_aggregate(post.select_columns(["term", id_col]),
                                   ["term"], {}, count_alias="df"
                                   ).to_pandas()
        idf = {t: float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
               for t, d in zip(df_pdf["term"], df_pdf["df"])}
        k1p1 = k1 + 1.0

        def score(batch: pa.Table) -> pa.Table:
            tf = np.asarray(batch.column("tf"), dtype=np.float64)
            dl = np.asarray(batch.column("doc_len"), dtype=np.float64)
            iv = np.array([idf[t] for t in
                           batch.column("term").to_pylist()])
            denom = tf + k1 * (1.0 - b + (b * dl) / avgdl)
            out = iv * (tf * k1p1) / denom
            return pa.table({id_col: batch.column(id_col),
                             "term": batch.column("term"),
                             "bm25": pa.array(out, pa.float64())})

        post2, _ = self.lookup(terms, id_col=id_col,
                               columns=["term", id_col, "tf", "doc_len"])
        return post2.map_batches(score, batch_format="pyarrow"), metrics

    def phrase_lookup(self, phrase: list[str], id_col: str = "doc_id"
                      ) -> tuple["rd.Dataset", dict]:
        """Exact token-phrase search over the positional postings:
        docs containing ``phrase`` as consecutive tokens, with
        occurrence counts (overlaps included).

        Distributed shape: pruned read of the phrase terms' buckets,
        ONE sort co-locating each doc's postings, then a vectorized
        position-chain kernel — survivors of slot i are positions p
        with p+1 present in slot i+1's posting (flattened int keys +
        ``searchsorted``; no per-doc Python).  Block-split docs take
        the residual pass with the same kernel."""
        from dedup_restore_ray.stages.groups import (_ramp, group_bounds,
                                                     sorted_split)
        post, metrics = self.lookup(
            phrase, id_col=id_col,
            columns=["term", id_col, "doc_len", "positions"])

        def kernel(b: pa.Table) -> pa.Table:
            empty = pa.table({id_col: pa.array([], pa.int64()),
                              "n_occurrences": pa.array([], pa.int64())})
            n = b.num_rows
            if n == 0:
                return empty
            starts, ends = group_bounds(b, [id_col])
            row_seg = np.repeat(np.arange(len(starts), dtype=np.int64),
                                ends - starts)
            big = np.int64(
                int(pc.max(b.column("doc_len")).as_py()) + 2)
            plist = b.column("positions").combine_chunks()
            flat = np.asarray(plist.values, dtype=np.int64)
            offs = np.asarray(plist.offsets, dtype=np.int64)
            lens = offs[1:] - offs[:-1]
            terms_np = np.asarray(b.column("term"))

            def slot_keys(t: str) -> np.ndarray:
                sel = np.flatnonzero(terms_np == t)
                if len(sel) == 0:          # _ramp chokes on empty input
                    return np.empty(0, np.int64)
                fi = np.repeat(offs[sel], lens[sel]) + _ramp(lens[sel])
                return np.repeat(row_seg[sel], lens[sel]) * big + flat[fi]

            s = slot_keys(phrase[0])
            for t in phrase[1:]:
                bkeys = slot_keys(t)       # ascending: (doc, pos) sorted
                if len(bkeys) == 0:
                    s = s[:0]
                    break
                s = s + 1
                pos = np.searchsorted(bkeys, s)
                pos[pos >= len(bkeys)] = 0
                s = s[bkeys[pos] == s]
            if len(s) == 0:
                return empty
            segs, cnts = np.unique(s // big, return_counts=True)
            doc_ids = b.column(id_col).take(pa.array(starts[segs]))
            return pa.table({id_col: doc_ids,
                             "n_occurrences": pa.array(
                                 cnts.astype(np.int64))})

        interior, edge = sorted_split(post, [id_col, "term"], [id_col])
        out = (interior.map_batches(kernel, batch_format="pyarrow",
                                    batch_size=None)
               .union(edge.groupby(id_col).map_groups(
                   lambda g: kernel(g.sort_by(
                       [(id_col, "ascending"), ("term", "ascending")])),
                   batch_format="pyarrow")))
        return out, metrics

    def term_doc_counts(self, terms: list[str], id_col: str = "doc_id"
                        ) -> tuple[pd.DataFrame, dict]:
        """Per-term document count + doc-id sum over the pruned
        postings (distributed aggregate — posting lists of hot terms
        never land on the driver)."""
        from dedup_restore_ray.stages.groups import grouped_aggregate
        post, metrics = self.lookup(terms, id_col=id_col)
        agg = grouped_aggregate(post, ["term"],
                                {"sum_doc_id": (id_col, "sum")},
                                count_alias="n_docs")
        df = agg.to_pandas()
        if "term" not in df.columns:   # all-absent terms: the empty
            # Dataset's to_pandas has no columns at all (CLAUDE.md)
            df = pd.DataFrame({"term": pd.Series([], dtype="object"),
                               "n_docs": pd.Series([], dtype="int64"),
                               "sum_doc_id": pd.Series([],
                                                       dtype="int64")})
        return df[["term", "n_docs", "sum_doc_id"]], metrics
