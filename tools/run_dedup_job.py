#!/usr/bin/env python
"""Cluster job driver for the flagship near-dup pipeline.

The `ray job submit` entrypoint the north_rule asks for — on a real
cluster:

    ray job submit --working-dir . -- \
        python tools/run_dedup_job.py \
            --input  s3://bucket/pages/         \
            --output s3://bucket/assignments/   \
            --id-col url --text-col text --html-col html

The same command runs unchanged on an N-node and a 4N-node cluster:
the pipeline carries no driver-resident state, so parallelism is set
entirely by the cluster the job lands on.  Re-submitting with the same
--output resumes: partitions whose lineage manifest is complete (same
config hash) are skipped (state/manifest.py).

This script OWNS a Ray session (guarded init; `address` defaults to
$RAY_ADDRESS or "auto" under a job submission) — library code never
calls ray.init().  Prints one JSON line with counters, per-stage
timings and the write manifest summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="Parquet file/dir of web pages")
    p.add_argument("--output", required=True,
                   help="assignments output dir (resumable partitions)")
    p.add_argument("--id-col", default="url")
    p.add_argument("--text-col", default="text")
    p.add_argument("--html-col", default=None,
                   help="raw html column to extract text from (optional)")
    p.add_argument("--num-partitions", type=int, default=64)
    p.add_argument("--placement", default="hash",
                   choices=["hash", "near", "random", "cycle"])
    p.add_argument("--no-simhash", action="store_true")
    p.add_argument("--no-substring", action="store_true")
    args = p.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, logging_level="ERROR")

    from dedup_restore_ray.config import PipelineConfig
    from dedup_restore_ray.pipelines.dedup import (dedup_pipeline,
                                                   dedup_stats,
                                                   write_assignments)
    from dedup_restore_ray.sources.io import read_parquet_clean

    cfg = PipelineConfig()
    cols = [args.id_col, args.text_col]
    if args.html_col:
        cols.append(args.html_col)
    t0 = time.time()
    ds = read_parquet_clean(args.input, columns=cols)
    res = dedup_pipeline(ds, cfg, id_col=args.id_col,
                         text_col=args.text_col, html_col=args.html_col,
                         use_simhash=not args.no_simhash,
                         use_substring=not args.no_substring)
    manifest = write_assignments(res, args.output, cfg,
                                 num_partitions=args.num_partitions,
                                 placement=args.placement)
    if "dedup_ratio" in res.metrics:
        # counters fused into pipeline driver state — the write above
        # already consumed the assignments, no extra stats pass
        stats = {k: res.metrics[k]
                 for k in ("total", "dup", "unique", "dedup_ratio")}
    else:
        stats = dedup_stats(res.assignments)
    wall = time.time() - t0
    print(json.dumps({
        "stats": stats,
        "docs_per_sec": round(stats["total"] / wall, 1) if wall else None,
        "wall_sec": round(wall, 3),
        "stage_sec": {k: round(v, 3)
                      for k, v in res.metrics.get("stage_sec", {}).items()},
        "write": manifest,
        "config_hash": cfg.config_hash(),
        "output": args.output,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
