"""Deterministic hash-based dataset splitting / sampling.

Training-data pipelines need reproducible train/val/test assignment
and subsampling that (a) is stable across runs, re-partitioning and
cluster sizes, (b) never requires a shuffle or driver state, and
(c) can be re-derived by any other engine from the key alone.  Both
operators here are pure per-row functions of md5(salt + key) — one
embarrassingly-parallel map_batches pass, no coordination — and are
bit-reproducible in SQL (DuckDB: ``('0x' || substr(md5(k),1,8))::
UBIGINT``), which is what makes them oracle-checkable.

(The reference engine has no sampling/splitting; this fills the
SURVEY §2.7 'sampling' gap for the training-data target.)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

#: bucket basis: fractions are expressed in 1/10000ths (0.01 % grain)
BASIS = 10_000


def _buckets(keys: list, salt: str) -> np.ndarray:
    """bucket in [0, BASIS) per key: first 8 md5 hex digits of
    salt + str(key), mod BASIS.  str(key) (not bytes) so int64 and
    string keys hash identically to SQL CAST(k AS VARCHAR)."""
    enc = salt.encode()
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        h = hashlib.md5(enc + str(k).encode()).hexdigest()
        out[i] = int(h[:8], 16) % BASIS
    return out


def hash_split(ds: "ray.data.Dataset",
               key_col: str = "doc_id",
               fractions: dict[str, float] | None = None,
               salt: str = "") -> "ray.data.Dataset":
    """Append a ``split`` column assigning each row to a named split by
    hashed key.  fractions: {name: fraction}, summing to <= 1.0; any
    remainder goes to the LAST name.  Order of dict insertion defines
    the bucket ranges, so the assignment is fully deterministic.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(fractions)
    cuts = np.cumsum([int(round(f * BASIS)) for f in fractions.values()])
    cuts[-1] = BASIS  # remainder -> last split

    def assign(batch: pa.Table) -> pa.Table:
        b = _buckets(batch.column(key_col).to_pylist(), salt)
        idx = np.searchsorted(cuts, b, side="right")
        split = pa.array([names[i] for i in idx], pa.string())
        return batch.append_column("split", split)

    return ds.map_batches(assign, batch_format="pyarrow")


def cross_split_contamination(ds: "ray.data.Dataset",
                              key_col: str = "doc_id",
                              text_col: str = "text",
                              k: int = 8,
                              train_cut: int = 8000,
                              test_cut: int = 9000,
                              salt: str = "",
                              seed: int = 0) -> "ray.data.Dataset":
    """Benchmark-decontamination: train-split docs sharing at least one
    token ``k``-gram with ANY test-split doc, with the count of shared
    distinct grams.  Splits are the deterministic md5 buckets of
    ``hash_split`` (train: bucket < train_cut, test: bucket >=
    test_cut; the val band in between takes no part).

    Shape: ONE corpus pass emits (gram_hash, doc_id, is_test) rows —
    distinct grams per doc, docs with < k tokens emit nothing — then
    one sort on gram_hash groups every gram's holders; a per-block
    kernel (residual pass for block-split grams) emits the train rows
    of groups that contain a test row, and a grouped count yields
    n_shared per contaminated doc.  No driver-side gram set: the test
    side rides the same shuffle as the train side, so the operator
    holds even when the "benchmark" split is itself huge.
    """
    from dedup_restore_ray.functions.shingle import (ShingleEncoder,
                                                     arrow_token_hashes)
    from dedup_restore_ray.stages.groups import (flatten_blocks,
                                                 group_bounds,
                                                 grouped_aggregate,
                                                 sorted_split)

    enc = ShingleEncoder(k=k, seed=seed)

    def gram_rows(batch: pa.Table) -> pa.Table:
        # Arrow-path tokenization + batched CSR k-gram combine (the
        # signature-stage kernels; per-doc sorted-unique output
        # identical to the shingle_hashes_for_tokens reference)
        keys = batch.column(key_col).to_pylist()
        b = _buckets(keys, salt)
        sel = np.flatnonzero((b < train_cut) | (b >= test_cut))
        if len(sel) == 0:
            return pa.table({"g": pa.array([], pa.uint64()),
                             key_col: pa.array([], pa.int64()),
                             "is_test": pa.array([], pa.int8())})
        sub = batch.take(pa.array(sel))
        wh, counts = arrow_token_hashes(sub.column(text_col),
                                        enc.hasher)
        flat, offs = enc.encode_word_hashes(wh, counts)
        n_sh = np.diff(offs)
        # < k tokens -> no k-gram (SQL emits nothing for short docs)
        occ_keep = np.repeat(counts >= k, n_sh)
        row_idx = np.repeat(np.arange(len(sel), dtype=np.int64),
                            n_sh)[occ_keep]
        tags = (b[sel] >= test_cut).astype(np.int8)[row_idx]
        return pa.table({
            "g": pa.array(flat[occ_keep], pa.uint64()),
            key_col: sub.column(key_col).combine_chunks()
                        .take(pa.array(row_idx)),
            "is_test": pa.array(tags)})

    rows = ds.map_batches(gram_rows, batch_format="pyarrow")
    interior, edge = sorted_split(rows, ["g"])
    empty = pa.table({key_col: pa.array([], pa.int64())})

    def hit_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        starts, ends = group_bounds(b, ["g"])
        tag = np.asarray(b.column("is_test"))
        has_test = np.maximum.reduceat(tag, starts) == 1
        mask = np.repeat(has_test, ends - starts) & (tag == 0)
        return pa.table({key_col: pa.array(
            np.asarray(b.column(key_col))[mask])})

    hits = (interior.map_batches(hit_rows, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(["g"]).map_groups(
                hit_rows, batch_format="pyarrow")))
    return grouped_aggregate(flatten_blocks(hits), [key_col], {},
                             count_alias="n_shared")


def hash_sample(ds: "ray.data.Dataset",
                fraction: float,
                key_col: str = "doc_id",
                salt: str = "") -> "ray.data.Dataset":
    """Deterministic Bernoulli-style sample: keep rows whose hashed key
    lands below ``fraction`` of the bucket space.  Stable across runs
    and partitionings (unlike ``Dataset.random_sample``), and nested:
    hash_sample(0.1) ⊂ hash_sample(0.2) for the same salt."""
    cut = int(round(fraction * BASIS))

    def keep(batch: pa.Table) -> pa.Table:
        b = _buckets(batch.column(key_col).to_pylist(), salt)
        return batch.filter(pa.array(b < cut))

    return ds.map_batches(keep, batch_format="pyarrow")
