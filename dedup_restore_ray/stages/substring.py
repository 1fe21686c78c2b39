"""Substring-dedup pass: winnowed-fingerprint shuffle (global) and the
per-partition suffix-array operator.

The exact-long-match capability (north_rule 'suffix-array substring
pass'; reference heritage: rolling-window chunker src/chunk.c finds
byte-identical regions).  Two formulations:

- ``fingerprint_pairs`` (default, scale path): every doc emits its
  winnowed k-gram fingerprints (computed in the signature stage);
  ``groupby(fingerprint)`` brings docs sharing any fingerprint
  together — pairs via the same skew-capped strategy as LSH buckets.
  Detects any shared run >= winnow_kgram + window - 1 =
  substring_min_len chars, globally, as one shuffle.
- ``suffix_array_pairs``: per input block, an exact generalized
  suffix array finds all in-block pairs sharing >= min_len chars
  (functions/suffix.py).  Partitioning assumption: only pairs
  co-resident in a block are found — use after a locality-creating
  repartition, or for verification at test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.suffix import substring_pairs
from dedup_restore_ray.stages.groups import bucket_pairs, distinct_rows


def fingerprint_pairs(signatures: "ray.data.Dataset",
                      cfg: PipelineConfig | None = None) -> "ray.data.Dataset":
    """signatures (doc_id, fingerprints) -> distinct (u, v) pairs of
    docs sharing a winnowed substring fingerprint."""
    cfg = cfg or PipelineConfig()

    def expand(batch: pa.Table) -> pa.Table:
        fps = batch.column("fingerprints").combine_chunks()
        flat = fps.flatten()
        offs = np.asarray(fps.offsets)
        counts = np.diff(offs)
        idx = np.repeat(np.arange(len(batch)), counts)
        return pa.table({
            "bucket_key": pa.array(np.asarray(flat, dtype=np.uint64), pa.uint64()),
            "doc_id": batch.column("doc_id").take(pa.array(idx)),
        })

    rows = signatures.map_batches(expand, batch_format="pyarrow")
    return bucket_pairs(rows, cfg.max_bucket_pairs, cfg.num_salts)


class SuffixArrayPairs:
    """Per-block exact substring pairs via generalized suffix array.

    Emits (u, v, source='suffix') for docs in the same block sharing an
    exact run >= min_len normalized chars.  Blocks larger than the
    memory budget are split into character-bounded slices (adjacent
    slices overlap by min_len so runs on the boundary aren't lost
    within a slice group).
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 id_col: str = "doc_id", text_col: str = "norm_text"):
        self.cfg = cfg or PipelineConfig()
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        budget = cfg.suffix_max_partition_chars
        # greedy char-bounded grouping of docs
        groups: list[list[int]] = []
        cur: list[int] = []
        cur_chars = 0
        for i, t in enumerate(texts):
            tl = len(t or "")
            if cur and cur_chars + tl > budget:
                groups.append(cur)
                cur, cur_chars = [], 0
            cur.append(i)
            cur_chars += tl
        if cur:
            groups.append(cur)
        us, vs = [], []
        for g in groups:
            sub_pairs = substring_pairs([texts[i] or "" for i in g],
                                        cfg.substring_min_len)
            for a, b in sub_pairs:
                ia, ib = ids[g[a]], ids[g[b]]
                if ib < ia:
                    ia, ib = ib, ia
                us.append(ia)
                vs.append(ib)
        id_type = batch.schema.field(self.id_col).type
        return pa.table({"u": pa.array(us, id_type), "v": pa.array(vs, id_type)})


def suffix_array_pairs(docs: "ray.data.Dataset",
                       cfg: PipelineConfig | None = None,
                       id_col: str = "doc_id",
                       text_col: str = "norm_text") -> "ray.data.Dataset":
    cfg = cfg or PipelineConfig()
    pairs = docs.map_batches(
        SuffixArrayPairs(cfg, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", batch_size=8192, num_cpus=1)
    return distinct_rows(pairs, ["u", "v"])


def lgram_table(docs: "ray.data.Dataset",
                cfg: PipelineConfig | None = None,
                id_col: str = "doc_id",
                text_col: str = "text") -> "ray.data.Dataset":
    """(id, shingles = sorted-unique uint64 hashes of every
    substring_min_len-CHAR gram of the normalized text).

    Character-exact (UTF-32 stream, functions/fingerprint.py
    batch_lgram_hashes): two docs share an L-char normalized run iff
    their gram sets intersect, which is the exact membership test SQL
    ``substr(norm, i, L)`` computes — so the verified pair set is
    hash-checkable against a DuckDB L-gram self-join oracle.
    """
    cfg = cfg or PipelineConfig()
    L = cfg.substring_min_len

    def grams(batch: pa.Table) -> pa.Table:
        from dedup_restore_ray.functions.fingerprint import batch_lgram_hashes
        from dedup_restore_ray.functions.shingle import normalize_text
        norm = [normalize_text(t)
                for t in batch.column(text_col).to_pylist()]
        gs = batch_lgram_hashes(norm, L)
        offs = np.zeros(len(gs) + 1, dtype=np.int64)
        offs[1:] = np.cumsum([len(g) for g in gs])
        flat = (np.concatenate(gs) if gs
                else np.empty(0, dtype=np.uint64))
        lst = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(flat, pa.uint64()))
        return pa.table({"doc_id": batch.column(id_col), "shingles": lst})

    return docs.map_batches(grams, batch_format="pyarrow")


def verified_substring_pairs(docs: "ray.data.Dataset",
                             cfg: PipelineConfig | None = None,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             strategy: str = "broadcast"
                             ) -> "ray.data.Dataset":
    """Exact substring-dedup pairs: docs sharing a normalized run of
    >= substring_min_len chars.  Candidates from the winnowed-
    fingerprint shuffle (guaranteed superset — winnowing detects every
    shared run >= winnow_kgram + window - 1 = substring_min_len);
    verification = L-gram hash-set intersection via the same pair
    machinery as Jaccard verify (threshold epsilon: any non-empty
    intersection passes).  strategy='scatter' is the fully distributed
    form for corpora beyond the broadcast pack limit.
    """
    import dataclasses

    from dedup_restore_ray.stages.signatures import SignatureStage
    from dedup_restore_ray.stages.verify import verify_pairs

    cfg = cfg or PipelineConfig()
    # ONE corpus pass: the signature stage tokenizes/normalizes once and
    # emits both the winnowed fingerprints (candidate source) and the
    # L-gram hash sets (verify payload); materialized so the two
    # consumers below don't re-execute the scan
    sigs = docs.map_batches(
        SignatureStage(cfg, id_col=id_col, text_col=text_col,
                       emit_minhash=False, emit_bucket_keys=False,
                       emit_lgrams=True),
        batch_format="pyarrow", batch_size=cfg.batch_size
    ).select_columns(["doc_id", "fingerprints", "lgrams"]).materialize()
    cands = fingerprint_pairs(
        sigs.select_columns(["doc_id", "fingerprints"]), cfg)
    grams = sigs.select_columns(["doc_id", "lgrams"]) \
                .rename_columns({"lgrams": "shingles"})
    # jaccard>0 <=> shared L-gram; smallest positive jaccard is
    # 1/(|A|+|B|) so any epsilon below that keeps exactly the hits
    eps_cfg = dataclasses.replace(cfg, jaccard_threshold=1e-12)
    out = verify_pairs(cands, grams, eps_cfg, strategy=strategy)
    return out.select_columns(["u", "v"])
