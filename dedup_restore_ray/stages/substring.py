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
