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
