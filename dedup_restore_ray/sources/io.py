"""Parquet read helpers.

``read_parquet_clean`` strips schema-level metadata right after the
read.  The testdata Parquet files carry pandas metadata that makes
``hash(pa.Schema)`` raise (pyarrow hashes the metadata dict), which
defeats Ray Data's schema-deduplication fast path in EVERY downstream
sort/union ("Failed to hash the schemas" warnings, plus the expensive
unify fallback).  The strip is a zero-copy table metadata replace and
fuses with the read task.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def _strip_meta(batch: pa.Table) -> pa.Table:
    return batch.replace_schema_metadata(None)


def read_parquet_clean(path, **kwargs) -> "rd.Dataset":
    return rd.read_parquet(path, **kwargs).map_batches(
        _strip_meta, batch_format="pyarrow")
