"""Distributed key joins on the sort-scatter machinery.

Public wrappers over the co-sort kernels of stages/cluster.py (which
avoid ``Dataset.join`` — it rejects list payloads and fails on
union-produced block layouts) for the relational shapes the query
layer needs: semi join, anti join, left lookup with default.  All are
one sort shuffle of (refs ∪ keys); NO driver-side key-set
materialization (the big side never streams to the driver).

Reference analogue: the fingerprint-index lookup (src/dedup.c:120-146)
— a key-partitioned rendezvous of references with their single store
row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from dedup_restore_ray.stages.cluster import (_anti_by_key, _pa_schema,
                                              _scatter_lookup,
                                              scatter_lookup_split)


def semi_join(refs: "ray.data.Dataset", keys: "ray.data.Dataset",
              key_col: str) -> "ray.data.Dataset":
    """Rows of ``refs`` whose key appears in ``keys`` (IN-subquery
    shape).  ``keys`` need not be distinct."""
    out_cols = list(_pa_schema(refs).names)

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({key_col: b.column(key_col),
                         "__hit": pa.array(np.ones(b.num_rows, np.int8))})

    hit = _scatter_lookup(refs, keys.map_batches(tag, batch_format="pyarrow"),
                          key_col=key_col, payload_col="__hit",
                          out_cols=out_cols)
    return hit.drop_columns(["__hit"])


def anti_join(refs: "ray.data.Dataset", keys: "ray.data.Dataset",
              key_col: str) -> "ray.data.Dataset":
    """Rows of ``refs`` whose key does NOT appear in ``keys``
    (NOT-IN shape)."""
    return _anti_by_key(refs, keys.select_columns([key_col]), key_col)


def left_lookup(refs: "ray.data.Dataset", store: "ray.data.Dataset",
                key_col: str, payload_col: str,
                default) -> "ray.data.Dataset":
    """Left join of ``refs`` against single-row-per-key ``store``:
    matched rows get the payload, unmatched rows get ``default``.
    One sort-scatter pass; hit and miss kernels share the sorted run
    (scatter_lookup_split)."""
    out_cols = list(_pa_schema(refs).names)
    payload_type = _pa_schema(store).field(payload_col).type
    hit, miss = scatter_lookup_split(refs, store, key_col=key_col,
                                     payload_col=payload_col,
                                     out_cols=out_cols)
    miss = miss.map_batches(
        lambda b: b.append_column(
            payload_col, pa.array([default] * b.num_rows, payload_type)),
        batch_format="pyarrow")
    return hit.union(miss)
