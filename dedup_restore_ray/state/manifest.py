"""Per-partition lineage manifests + resumable Parquet output.

The reference's global counters (reference: include/optsmr.h:26-37,
reported at src/optsmr.c:316-332) and append-only recipes become
*data*: every completed output partition writes a ``_manifest.json``
recording inputs, row counts, config hash and stage metrics.  On
resume, partitions whose manifest is complete are skipped
(north_rule: 'resumable from checkpoint with per-partition lineage +
metrics').

Atomicity: each partition writes to ``<dir>.tmp-<nonce>`` then renames
— a crash mid-write never yields a partition with a manifest.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_NAME = "_manifest.json"


def partition_dir(root: str, part_id: int | str) -> str:
    return os.path.join(root, f"part={part_id}")


def is_complete(root: str, part_id: int | str) -> bool:
    return os.path.exists(os.path.join(partition_dir(root, part_id), MANIFEST_NAME))


def completed_partitions(root: str) -> set[str]:
    if not os.path.isdir(root):
        return set()
    done = set()
    for name in os.listdir(root):
        if name.startswith("part=") and os.path.exists(
                os.path.join(root, name, MANIFEST_NAME)):
            done.add(name.split("=", 1)[1])
    return done


def write_partition(root: str, part_id: int | str, table: pa.Table,
                    config_hash: str, inputs: list[str] | None = None,
                    metrics: dict | None = None) -> str:
    """Atomically write one output partition + its manifest.  Returns
    the partition directory.  Idempotent: an already-complete partition
    is left untouched (resume-skip)."""
    final = partition_dir(root, part_id)
    if is_complete(root, part_id):
        return final
    os.makedirs(root, exist_ok=True)
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    data_path = os.path.join(tmp, "data.parquet")
    # per-chunk compression is delegated to the Parquet codec
    # (reference M4 LZJB, src/lzjb.c) — but the RATIO counters the
    # reference reports (origin_len, include/metadata.h:22) are
    # first-class manifest fields
    pq.write_table(table, data_path, compression="zstd")
    stored = os.path.getsize(data_path)
    manifest = {
        "part_id": str(part_id),
        "rows": table.num_rows,
        "bytes": table.nbytes,
        "origin_bytes": table.nbytes,
        "stored_bytes": stored,
        "compress_ratio": round(table.nbytes / stored, 3) if stored else None,
        "config_hash": config_hash,
        "inputs": inputs or [],
        "metrics": metrics or {},
        "written_at": time.time(),
        "schema": [f"{f.name}:{f.type}" for f in table.schema],
    }
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    # rename into place; if a concurrent writer won, keep theirs
    try:
        os.rename(tmp, final)
    except OSError:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return final


def read_manifests(root: str) -> list[dict]:
    out = []
    for p in sorted(completed_partitions(root)):
        with open(os.path.join(partition_dir(root, p), MANIFEST_NAME)) as f:
            out.append(json.load(f))
    return out


def aggregate_metrics(root: str) -> dict:
    """Reduce per-partition metric dicts (the reference's final counter
    report src/optsmr.c:316-332, reborn)."""
    total: dict = {"partitions": 0, "rows": 0,
                   "origin_bytes": 0, "stored_bytes": 0}
    for m in read_manifests(root):
        total["partitions"] += 1
        total["rows"] += m.get("rows", 0)
        total["origin_bytes"] += m.get("origin_bytes", 0)
        total["stored_bytes"] += m.get("stored_bytes", 0)
        for k, v in (m.get("metrics") or {}).items():
            if isinstance(v, (int, float)):
                total[k] = total.get(k, 0) + v
    if total["stored_bytes"]:
        total["compress_ratio"] = round(
            total["origin_bytes"] / total["stored_bytes"], 3)
    return total
