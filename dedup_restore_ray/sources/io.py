"""Parquet read helpers.

The testdata Parquet files carry pandas metadata that makes
``hash(pa.Schema)`` raise (pyarrow hashes the metadata dict), which
defeats Ray Data's schema-deduplication fast path in EVERY downstream
sort/union ("Failed to hash the schemas" warnings, plus the expensive
unify fallback).

``read_parquet_clean`` passes an explicitly metadata-free schema to
``read_parquet`` (one driver-side footer read), so blocks are clean at
the SOURCE — measured: 32 schema-hash warnings -> 0 on a
read+union+sort, and no extra map stage.  Falls back to a post-read
metadata strip when the footer can't be inspected (e.g. unusual path
types).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def _strip_meta(batch: pa.Table) -> pa.Table:
    return batch.replace_schema_metadata(None)


def _clean_schema(path, columns=None) -> "pa.Schema | None":
    import pyarrow.parquet as pq
    p = path[0] if isinstance(path, (list, tuple)) and path else path
    try:
        full = pq.read_schema(p)
    except Exception:
        return None
    by_name = {f.name: f for f in full}
    if columns is not None:
        if not all(c in by_name for c in columns):
            return None
        fields = [by_name[c] for c in columns]
    else:
        fields = list(full)
    return pa.schema([pa.field(f.name, f.type) for f in fields])


def _size_hint_blocks(path) -> "int | None":
    """Block-count override for SMALL local inputs only: Ray splits
    even a 100 KB file into ~2x-cpu blocks, and every downstream
    stage then pays per-block scheduling.  Returns ceil(file bytes /
    8 MiB) when that is below Ray's default width; None (no override)
    otherwise — large corpora keep Ray's own file-based splitting."""
    import os

    import ray
    paths = path if isinstance(path, (list, tuple)) else [path]
    total = 0
    for p in paths:
        try:
            p = os.fspath(p)
            if os.path.isdir(p):
                for root, _, files in os.walk(p):
                    total += sum(os.path.getsize(os.path.join(root, f))
                                 for f in files)
            else:
                total += os.path.getsize(p)
        except (OSError, TypeError):
            return None
    try:
        cpus = max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        cpus = 8
    # only tiny inputs (< ~1 MiB of file per cpu) get coalesced reads;
    # medium files keep Ray's default split — parquet DECODE is the
    # parallel work and wants all cpus (measured: a 40 MB lineitem
    # read got 3x slower at 5 blocks than at 64)
    if total >= cpus << 20:
        return None
    return max(1, -(-total // (1 << 20)))


def read_parquet_clean(path, **kwargs) -> "rd.Dataset":
    if "override_num_blocks" not in kwargs:
        hint = _size_hint_blocks(path)
        if hint is not None:
            kwargs["override_num_blocks"] = hint
    # A row filter may reference columns outside the projection, and
    # pyarrow validates it against the passed schema — use the
    # post-read strip for filtered reads.
    if "schema" not in kwargs and "filter" not in kwargs:
        schema = _clean_schema(path, kwargs.get("columns"))
        if schema is not None:
            return rd.read_parquet(path, schema=schema, **kwargs)
    return rd.read_parquet(path, **kwargs).map_batches(
        _strip_meta, batch_format="pyarrow")


def read_csv_clean(path, columns=None, **kwargs) -> "rd.Dataset":
    """CSV ingestion with the same contract as read_parquet_clean:
    metadata-free Arrow blocks, tiny-input block coalescing, optional
    column projection.  CSV has no footer to prune from, so the
    projection is a zero-copy post-read select — prefer Parquet for
    anything large; this reader exists for the ubiquitous
    CSV-at-the-boundary ingest step."""
    if "override_num_blocks" not in kwargs:
        hint = _size_hint_blocks(path)
        if hint is not None:
            kwargs["override_num_blocks"] = hint
    ds = rd.read_csv(path, **kwargs)

    def clean(b: pa.Table) -> pa.Table:
        t = b.select(columns) if columns is not None else b
        return t.replace_schema_metadata(None)

    return ds.map_batches(clean, batch_format="pyarrow")


def read_jsonl_clean(path, columns=None, **kwargs) -> "rd.Dataset":
    """JSON-Lines ingestion (the web-corpus interchange format —
    one document object per line, Common-Crawl/WET style): same
    clean-blocks contract.  Nested fields arrive as Arrow structs;
    project with ``columns`` to keep only the document payload."""
    if "override_num_blocks" not in kwargs:
        hint = _size_hint_blocks(path)
        if hint is not None:
            kwargs["override_num_blocks"] = hint
    ds = rd.read_json(path, **kwargs)

    def clean(b: pa.Table) -> pa.Table:
        t = b.select(columns) if columns is not None else b
        return t.replace_schema_metadata(None)

    return ds.map_batches(clean, batch_format="pyarrow")


def write_jsonl(ds: "rd.Dataset", out_dir: str) -> None:
    """Corpus export as JSON-Lines shards (one file per block) — the
    symmetric sink for read_jsonl_clean."""
    ds.write_json(out_dir)
