"""IVF approximate-nearest-neighbor index as a REAL partitioned index.

The 100-TB formulation of similarity search: vectors are shuffled by
nearest-centroid list id and PERSISTED as partitioned Parquet (one
directory per list — the same group-by-physical-key discipline as the
reference's container grouping, src/look_ahead.c:710-793).  A probe
then READS ONLY the probed lists' partitions (directory-pruned
read_parquet) — query cost scales with num_probe/num_lists of the
corpus, not the corpus.

Build is one streaming pass: centroids fit on a bounded sample, list
assignment per Arrow batch, partitioned write.  The index directory is
resumable: a completed build writes a meta.json manifest (config hash
+ row count); rebuilds are skipped when the manifest matches.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.similarity import (cosine_topk_block,
                                                    ivf_assign, kmeans_fit,
                                                    fixed_binary_to_matrix,
                                                    l2_normalize,
                                                    list_to_matrix, merge_topk)


def _hash_rank_sample(emb: "rd.Dataset", id_col: str, vec_col: str,
                      sample_size: int) -> np.ndarray:
    """Deterministic uniform training sample ACROSS ALL BLOCKS via
    splitmix64-rank bottom-k: each block emits its sample_size
    hash-smallest rows, a tiny sort+limit merges them into the global
    bottom-k (bottom-k of a concat of bottom-ks == global bottom-k).
    Replaces the head-of-dataset ``limit(n)`` sample, which on a
    sorted / time-ordered corpus fed the k-means fit a single cluster
    and silently degraded list balance and probe pruning."""
    from dedup_restore_ray.functions.hashing import mix64

    def bottomk(b: pa.Table) -> pa.Table:
        ids = b.column(id_col)
        if pa.types.is_integer(ids.type):
            hv = mix64(np.asarray(ids, dtype=np.int64)
                       .view(np.uint64))
        else:
            from dedup_restore_ray.functions.sketch import kmv_hash
            hv = kmv_hash(ids.to_pylist())
        order = np.argsort(hv, kind="stable")[:sample_size]
        t = b.select([vec_col]).take(pa.array(order, pa.int64()))
        # keep uint64: an int64 view would flip the order of hashes
        # >= 2^63 and break the bottom-k merge
        return t.append_column("__hv", pa.array(hv[order], pa.uint64()))

    cands = emb.map_batches(bottomk, batch_format="pyarrow",
                            batch_size=None)
    sel = cands.sort("__hv").take_batch(sample_size,
                                        batch_format="pyarrow")
    return list_to_matrix(sel.column(vec_col))


class IVFIndex:
    """Partitioned IVF index over an embedding Dataset."""

    def __init__(self, index_dir: str, centroids: np.ndarray,
                 num_rows: int, pq_books: np.ndarray | None = None):
        self.index_dir = index_dir
        self.centroids = centroids
        self.num_rows = num_rows
        self.num_lists = len(centroids)
        self.pq_books = pq_books

    # ----------------------------------------------------------------
    @classmethod
    def build(cls, emb: "rd.Dataset", index_dir: str,
              cfg: PipelineConfig | None = None,
              sample_size: int = 2000, seed: int = 42,
              id_col: str = "vec_id",
              vec_col: str = "embedding",
              pq_m: int | None = None) -> "IVFIndex":
        """pq_m: when set, each row additionally stores an m-byte PQ
        code (and its list id as a data column) so searches can scan
        codes WITHOUT reading the float vectors — IVF-PQ."""
        cfg = cfg or PipelineConfig()
        meta_path = os.path.join(index_dir, "meta.json")
        chash = cfg.config_hash()
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))
            if (meta.get("config_hash") == chash
                    and meta.get("pq_m") == pq_m):
                books = (np.load(os.path.join(index_dir, "pq_books.npy"))
                         if pq_m else None)
                return cls(index_dir, np.load(
                    os.path.join(index_dir, "centroids.npy")),
                    meta["num_rows"], books)
        sample = _hash_rank_sample(emb, id_col, vec_col, sample_size)
        cent = kmeans_fit(sample, cfg.ivf_num_centroids, seed=seed)
        books = None
        if pq_m:
            from dedup_restore_ray.functions.pq import pq_train
            books = pq_train(l2_normalize(sample), m=pq_m, seed=seed)
        cent_ref = ray.put((cent, books))

        def assign(batch: pa.Table) -> pa.Table:
            c, bks = ray.get(cent_ref)
            vecs = list_to_matrix(batch.column(vec_col))
            lists = ivf_assign(vecs, c)
            cols = {id_col: batch.column(id_col),
                    vec_col: batch.column(vec_col),
                    "list_id": pa.array(lists, pa.int64())}
            if bks is not None:
                from dedup_restore_ray.functions.pq import pq_encode
                m = bks.shape[0]
                codes = pq_encode(
                    l2_normalize(vecs).astype(np.float32), bks)
                cols["code"] = pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(m), len(codes),
                    [None, pa.py_buffer(
                        np.ascontiguousarray(codes).tobytes())])
                # duplicate of the partition key as a data column: the
                # codes-only scan needs per-row list membership without
                # touching the float vectors
                cols["lid"] = pa.array(lists, pa.int64())
            return pa.table(cols)

        n = emb.count()
        # the shuffle: sort by list id clusters each list's vectors
        # contiguously, so the partitioned write emits a FEW files per
        # list directory (without the sort, every input block crosses
        # every partition -> blocks x lists tiny files, and the probe
        # read pays per-file overhead)
        (emb.map_batches(assign, batch_format="pyarrow")
            .sort("list_id")
            .write_parquet(index_dir, partition_cols=["list_id"]))
        np.save(os.path.join(index_dir, "centroids.npy"), cent)
        if books is not None:
            np.save(os.path.join(index_dir, "pq_books.npy"), books)
        json.dump({"config_hash": chash, "num_rows": n,
                   "num_lists": len(cent), "pq_m": pq_m},
                  open(meta_path, "w"))
        return cls(index_dir, cent, n, books)

    # ----------------------------------------------------------------
    def append(self, emb: "rd.Dataset", id_col: str = "vec_id",
               vec_col: str = "embedding") -> int:
        """Incremental index maintenance: assign NEW vectors to the
        EXISTING centroids (and PQ books) and add their rows as new
        Parquet files inside the hit lists' directories — no rebuild,
        resident partitions untouched (Parquet files are immutable, so
        append = new files; the same discipline as the incremental
        dedup hash store, pipelines/append.py).  meta.json's row count
        is bumped so a later ``build()`` reuse sees the appended index
        as current.  Returns the number of appended rows.

        Centroids are FROZEN — recall degrades only if the new
        vectors' distribution drifts far from the build sample, the
        standard IVF-append contract (rebuild on major drift)."""
        meta_path = os.path.join(self.index_dir, "meta.json")
        meta = json.load(open(meta_path))
        cent_ref = ray.put((self.centroids, self.pq_books))

        def assign(batch: pa.Table) -> pa.Table:
            c, bks = ray.get(cent_ref)
            vecs = list_to_matrix(batch.column(vec_col))
            lists = ivf_assign(vecs, c)
            cols = {id_col: batch.column(id_col),
                    vec_col: batch.column(vec_col),
                    "list_id": pa.array(lists, pa.int64())}
            if bks is not None:
                from dedup_restore_ray.functions.pq import pq_encode
                m = bks.shape[0]
                codes = pq_encode(
                    l2_normalize(vecs).astype(np.float32), bks)
                cols["code"] = pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(m), len(codes),
                    [None, pa.py_buffer(
                        np.ascontiguousarray(codes).tobytes())])
                cols["lid"] = pa.array(lists, pa.int64())
            return pa.table(cols)

        n_new = emb.count()
        if n_new == 0:
            return 0
        (emb.map_batches(assign, batch_format="pyarrow")
            .sort("list_id")
            .write_parquet(self.index_dir, partition_cols=["list_id"]))
        meta["num_rows"] = int(meta["num_rows"]) + int(n_new)
        json.dump(meta, open(meta_path, "w"))
        self.num_rows = meta["num_rows"]
        return int(n_new)

    # ----------------------------------------------------------------
    def _list_dir(self, list_id: int) -> str:
        return os.path.join(self.index_dir, f"list_id={list_id}")

    def search(self, query_vecs: np.ndarray, k: int = 10,
               num_probe: int | None = None,
               query_ids: np.ndarray | None = None,
               id_col: str = "vec_id",
               vec_col: str = "embedding"
               ) -> tuple[pd.DataFrame, dict]:
        """Probe the nearest ``num_probe`` lists per query; READ ONLY
        those lists' partitions.  Returns (topk frame, metrics) with
        ``partitions_read`` so callers can assert the pruning."""
        cfg = PipelineConfig()
        num_probe = num_probe or cfg.ivf_num_probe
        qn = l2_normalize(np.asarray(query_vecs, dtype=np.float64))
        if query_ids is None:
            query_ids = np.arange(len(qn))
        probe = np.argsort(-(qn @ self.centroids.T),
                           axis=1)[:, :num_probe]
        probed_lists = sorted({int(l) for row in probe for l in row
                               if os.path.isdir(self._list_dir(int(l)))})
        metrics = {"partitions_read": len(probed_lists),
                   "partitions_total": self.num_lists,
                   "num_probe": num_probe}
        if not probed_lists:
            return (pd.DataFrame(columns=["qid", "vec_id", "score"]),
                    metrics)
        # pruned read: ONE read over exactly the probed lists'
        # directories — no other partition is touched.  Per-row list
        # membership is recomputed from the broadcast centroids inside
        # the batch fn (deterministic — identical to the stored
        # assignment), so no per-directory datasets/unions are needed.
        from dedup_restore_ray.sources.io import read_parquet_clean
        files = [os.path.join(self._list_dir(l), f)
                 for l in probed_lists
                 for f in sorted(os.listdir(self._list_dir(l)))
                 if f.endswith(".parquet")]
        ds = read_parquet_clean(files, columns=[id_col, vec_col])
        ref = ray.put((qn, probe, self.centroids))

        def partial(batch: pa.Table) -> pa.Table:
            qm, pr, cent = ray.get(ref)
            vecs = list_to_matrix(batch.column(vec_col))
            ids = np.asarray(batch.column(id_col))
            lists = ivf_assign(vecs, cent)
            out_q, out_id, out_s = [], [], []
            for qrow in range(qm.shape[0]):
                mask = np.isin(lists, pr[qrow])
                if not mask.any():
                    continue
                tid, ts = cosine_topk_block(qm[qrow:qrow + 1], vecs[mask],
                                            ids[mask], k)
                out_q.extend([qrow] * tid.shape[1])
                out_id.extend(tid[0])
                out_s.extend(ts[0])
            return pa.table({
                "qrow": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(np.array(out_id, dtype=np.int64)),
                "score": pa.array(np.array(out_s, dtype=np.float64))})

        rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        out = []
        for qrow in range(len(qn)):
            g = rows[rows.qrow == qrow]
            if len(g) == 0:
                continue
            ids_m, sc_m = merge_topk([g["vec_id"].to_numpy()[None, :]],
                                     [g["score"].to_numpy()[None, :]], k)
            for i in range(ids_m.shape[1]):
                out.append((int(query_ids[qrow]), int(ids_m[0, i]),
                            float(sc_m[0, i])))
        return (pd.DataFrame(out, columns=["qid", "vec_id", "score"]),
                metrics)

    # ----------------------------------------------------------------
    def _probed_files(self, probed_lists: list[int]) -> list[str]:
        return [os.path.join(self._list_dir(l), f)
                for l in probed_lists
                for f in sorted(os.listdir(self._list_dir(l)))
                if f.endswith(".parquet")]

    def search_pq(self, query_vecs: np.ndarray, k: int = 10,
                  num_probe: int | None = None, shortlist: int = 100,
                  query_ids: np.ndarray | None = None,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding"
                  ) -> tuple[pd.DataFrame, dict]:
        """IVF-PQ: the probed partitions are scanned through the
        CODES column only (m bytes/row; the float vector column never
        leaves storage for the scan), then the exact vectors of the
        per-query ADC shortlist are gathered with a second pruned +
        id-filtered read and re-ranked with true cosine.  Metrics
        report both the partition pruning and the scan payload."""
        if self.pq_books is None:
            raise ValueError("index built without pq_m")
        from dedup_restore_ray.functions.pq import pq_adc_scores
        from dedup_restore_ray.sources.io import read_parquet_clean
        cfg = PipelineConfig()
        num_probe = num_probe or cfg.ivf_num_probe
        qn = l2_normalize(np.asarray(query_vecs, dtype=np.float64))
        if query_ids is None:
            query_ids = np.arange(len(qn))
        probe = np.argsort(-(qn @ self.centroids.T),
                           axis=1)[:, :num_probe]
        probed_lists = sorted({int(l) for row in probe for l in row
                               if os.path.isdir(self._list_dir(int(l)))})
        m = self.pq_books.shape[0]
        metrics = {"partitions_read": len(probed_lists),
                   "partitions_total": self.num_lists,
                   "num_probe": num_probe,
                   "scan_bytes_per_row": m,
                   "full_bytes_per_row": 4 * self.centroids.shape[1]}
        if not probed_lists:
            return (pd.DataFrame(columns=["qid", "vec_id", "score"]),
                    metrics)
        files = self._probed_files(probed_lists)
        codes_ds = read_parquet_clean(files,
                                      columns=[id_col, "code", "lid"])
        ref = ray.put((qn.astype(np.float32), probe, self.pq_books))

        def scan(batch: pa.Table) -> pa.Table:
            qm, pr, books = ray.get(ref)
            codes = fixed_binary_to_matrix(batch.column("code"), m)
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            lids = np.asarray(batch.column("lid"), dtype=np.int64)
            scores = pq_adc_scores(qm, codes, books)
            out_q, out_id, out_s = [], [], []
            for qrow in range(len(qm)):
                mask = np.isin(lids, pr[qrow])
                if not mask.any():
                    continue
                sc = scores[qrow][mask]
                mids = ids[mask]
                r = min(shortlist, len(sc))
                top = np.argpartition(-sc, r - 1)[:r]
                out_q.extend([qrow] * r)
                out_id.extend(mids[top])
                out_s.extend(sc[top])
            return pa.table({
                "qrow": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(np.array(out_id, dtype=np.int64)),
                "adc": pa.array(np.array(out_s, dtype=np.float32))})

        parts = codes_ds.map_batches(scan,
                                     batch_format="pyarrow").to_pandas()
        per_q: dict[int, np.ndarray] = {}
        want: set[int] = set()
        for qrow in range(len(qn)):
            g = parts[parts.qrow == qrow].sort_values(
                ["adc", "vec_id"], ascending=[False, True]).head(shortlist)
            per_q[qrow] = g["vec_id"].to_numpy()
            want.update(int(v) for v in per_q[qrow])
        if not want:
            return (pd.DataFrame(columns=["qid", "vec_id", "score"]),
                    metrics)
        want_arr = np.sort(np.fromiter(want, dtype=np.int64))
        wref = ray.put(want_arr)
        vec_ds = read_parquet_clean(files, columns=[id_col, vec_col])

        def gather(batch: pa.Table) -> pa.Table:
            w = ray.get(wref)
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            pos = np.searchsorted(w, ids)
            pos[pos >= len(w)] = 0
            return batch.filter(pa.array(w[pos] == ids))

        exact = vec_ds.map_batches(gather,
                                   batch_format="pyarrow").to_pandas()
        vecs = l2_normalize(np.stack(exact[vec_col].to_numpy())
                            .astype(np.float64))
        id_to_row = {int(v): i
                     for i, v in enumerate(exact[id_col].to_numpy())}
        out = []
        for qrow in range(len(qn)):
            cand = per_q[qrow]
            if len(cand) == 0:
                continue
            rows_ = np.array([id_to_row[int(v)] for v in cand],
                             dtype=np.int64)
            sc = vecs[rows_] @ qn[qrow]
            order = np.lexsort((cand, -sc))[:k]
            for i in order:
                out.append((int(query_ids[qrow]), int(cand[i]),
                            float(sc[i])))
        return (pd.DataFrame(out, columns=["qid", "vec_id", "score"]),
                metrics)
