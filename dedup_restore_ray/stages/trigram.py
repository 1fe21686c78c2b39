"""Character-trigram index for arbitrary SUBSTRING search.

The inverted term index (stages/invindex.py) answers word queries; a
``LIKE '%pattern%'`` query needs character n-grams — the classic
trigram index (what pg_trgm / code-search engines use).  Postings are
``(trigram, doc_id)`` rows, distinct per doc, shuffled ONCE by
gram-hash bucket into partitioned Parquet (the same persisted-store
pattern as invindex / IVF / zonemap: meta-manifest resume, pruned
probes).

Query = probe the pattern's trigram buckets (<= len(pattern)-2
directories opened), count grams per candidate doc (a doc must contain
ALL of them — count == n_grams after the per-doc-distinct build), then
verify candidates exactly against the pattern with a pruned read of
only the candidate documents.  False positives of the gram filter are
removed by the verify; false negatives are impossible (every substring
of a match contributes its grams).

Scale shape: the probe touches ~n_grams/num_buckets of the index; the
verify reads |candidates| documents, never the corpus.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from dedup_restore_ray.functions.hashing import WordHasher

_HASHER = WordHasher(seed=29)   # per-process gram-hash cache


def text_trigrams(t: str) -> list[str]:
    """Distinct character trigrams (raw text, no padding)."""
    return sorted({t[i:i + 3] for i in range(len(t) - 2)})


def _gram_buckets(grams: list[str], num_buckets: int) -> np.ndarray:
    h = _HASHER.hash_words(grams)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _trigram_postings_fn(id_col: str, text_col: str,
                         num_buckets: int):
    """Batch -> (bucket, gram, id) posting rows; shared by build and
    append so both write the identical layout."""

    def postings(batch: pa.Table) -> pa.Table:
        out_g: list[str] = []
        out_d: list[int] = []
        for d, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            gs = text_trigrams(t)
            out_g.extend(gs)
            out_d.extend([d] * len(gs))
        return pa.table({
            "bucket": pa.array(_gram_buckets(out_g, num_buckets),
                               pa.int64()),
            "gram": pa.array(out_g, pa.string()),
            id_col: pa.array(out_d, pa.int64())})

    return postings


class TrigramIndex:
    def __init__(self, index_dir: str, num_buckets: int, num_rows: int):
        self.index_dir = index_dir
        self.num_buckets = num_buckets
        self.num_rows = num_rows

    # ----------------------------------------------------------------
    @classmethod
    def build(cls, docs: "rd.Dataset", index_dir: str,
              num_buckets: int = 32, id_col: str = "doc_id",
              text_col: str = "text") -> "TrigramIndex":
        meta_path = os.path.join(index_dir, "meta.json")
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))
            if (meta.get("num_buckets") == num_buckets
                    and meta.get("schema") == 1):
                return cls(index_dir, num_buckets, meta["num_rows"])
        if os.path.isdir(index_dir):
            import shutil
            shutil.rmtree(index_dir)    # partitioned writes never
            #                             remove stale files

        postings = _trigram_postings_fn(id_col, text_col, num_buckets)

        post = docs.map_batches(postings, batch_format="pyarrow")
        (post.sort(["bucket", "gram", id_col])
             .write_parquet(index_dir, partition_cols=["bucket"]))
        n = rd.read_parquet(
            [os.path.join(index_dir, d, f)
             for d in sorted(os.listdir(index_dir))
             if d.startswith("bucket=")
             for f in sorted(os.listdir(os.path.join(index_dir, d)))
             if f.endswith(".parquet")]).count()
        json.dump({"num_buckets": num_buckets, "num_rows": n,
                   "schema": 1}, open(meta_path, "w"))
        return cls(index_dir, num_buckets, n)

    # ----------------------------------------------------------------
    def append(self, docs: "rd.Dataset", id_col: str = "doc_id",
               text_col: str = "text") -> int:
        """Incremental maintenance: gram postings for ONLY the new
        docs land as additional sorted files in the existing bucket
        partitions (additive partitioned write; probes merge
        transparently) — same discipline as InvertedIndex.append and
        ann_ivf_append.  Caller owns dedup.  Returns rows added."""
        post = (docs.map_batches(
            _trigram_postings_fn(id_col, text_col, self.num_buckets),
            batch_format="pyarrow")
            .sort(["bucket", "gram", id_col]).materialize())
        n_new = post.count()
        if n_new:
            post.write_parquet(self.index_dir,
                               partition_cols=["bucket"])
        self.num_rows += n_new
        json.dump({"num_buckets": self.num_buckets,
                   "num_rows": self.num_rows, "schema": 1},
                  open(os.path.join(self.index_dir, "meta.json"), "w"))
        return n_new

    # ----------------------------------------------------------------
    def _bucket_dir(self, b: int) -> str:
        return os.path.join(self.index_dir, f"bucket={b}")

    def candidates(self, pattern: str, id_col: str = "doc_id"
                   ) -> tuple["rd.Dataset", dict]:
        """Docs containing ALL of the pattern's trigrams (gram-filter
        superset of the true matches) via a pruned read of only the
        probed buckets.  Pattern must be >= 3 chars."""
        from dedup_restore_ray.sources.io import read_parquet_clean
        from dedup_restore_ray.stages.groups import grouped_aggregate
        grams = text_trigrams(pattern)
        assert grams, "pattern shorter than 3 characters"
        buckets = sorted({int(b) for b in
                          _gram_buckets(grams, self.num_buckets)
                          if os.path.isdir(self._bucket_dir(int(b)))})
        metrics = {"partitions_read": len(buckets),
                   "partitions_total": self.num_buckets,
                   "grams": len(grams)}
        if len(buckets) < len(set(
                _gram_buckets(grams, self.num_buckets).tolist())):
            # some gram's bucket has no directory -> that gram appears
            # in no document -> no doc can contain the pattern
            return rd.from_arrow(
                pa.table({id_col: pa.array([], pa.int64())})), metrics
        files = [os.path.join(self._bucket_dir(b), f)
                 for b in buckets
                 for f in sorted(os.listdir(self._bucket_dir(b)))
                 if f.endswith(".parquet")]
        ds = read_parquet_clean(files, columns=["gram", id_col])
        want = pa.array(grams, pa.string())

        def filt(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b.column("gram"), value_set=want))

        hits = ds.map_batches(filt, batch_format="pyarrow")
        per_doc = grouped_aggregate(hits.select_columns([id_col]),
                                    [id_col], {}, count_alias="ng")
        ngrams = len(grams)

        def full(b: pa.Table) -> pa.Table:
            keep = np.asarray(b.column("ng")) == ngrams
            return pa.table(
                {id_col: b.column(id_col).filter(pa.array(keep))})

        return per_doc.map_batches(full, batch_format="pyarrow"), metrics

    def search(self, pattern: str, docs: "rd.Dataset",
               id_col: str = "doc_id", text_col: str = "text"
               ) -> tuple["rd.Dataset", dict]:
        """Exact substring matches: gram candidates, then verify each
        candidate's text (pruned by a broadcast packed-id filter —
        only candidate docs are materialized)."""
        import ray as _ray
        cand, metrics = self.candidates(pattern, id_col)
        pdf = cand.to_pandas()      # empty Dataset -> no columns
        cand_ids = (np.sort(pdf[id_col].to_numpy(np.int64))
                    if id_col in pdf.columns
                    else np.array([], np.int64))
        metrics["candidates"] = int(len(cand_ids))
        ids_ref = _ray.put(cand_ids)

        def verify(b: pa.Table) -> pa.Table:
            cids = _ray.get(ids_ref)
            ids = np.asarray(b.column(id_col), dtype=np.int64)
            pos = np.searchsorted(cids, ids)
            pos[pos >= len(cids)] = 0
            is_cand = (np.take(cids, pos) == ids) if len(cids) \
                else np.zeros(len(ids), dtype=bool)
            t = b.filter(pa.array(is_cand))
            keep = [pattern in s
                    for s in t.column(text_col).to_pylist()]
            return pa.table(
                {id_col: t.column(id_col).filter(
                    pa.array(keep, pa.bool_()))})

        return docs.map_batches(verify, batch_format="pyarrow"), metrics
