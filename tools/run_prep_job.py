#!/usr/bin/env python
"""Cluster job driver for the COMPLETE LLM data-prep chain
(pipelines/prep.prep_corpus): quality filter -> language filter ->
exact+near dedup (one survivor per duplicate cluster) -> optional
n-gram decontamination -> token counting -> contiguous shard packing.

    ray job submit --working-dir . -- \
        python tools/run_prep_job.py \
            --input  s3://bucket/docs/          \
            --output s3://bucket/prepped/       \
            --test-input s3://bucket/benchmarks/ \
            --target-lang en

Output layout: one Parquet directory per shard_id
(``shard_id=N/...``), so a downstream tokenizer consumes shards
independently.  A partitioned write into an EXISTING shards dir is
additive (stale files are never removed), so a re-run with the same
--output must pass --overwrite (which clears shards/ first) — a
non-empty shards dir is refused otherwise.  The stage-by-stage
survivor manifest lands next to the data as ``prep_manifest.json``
and is printed as one JSON line.

This script OWNS a Ray session (guarded init); library code never
calls ray.init().
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
                   help="Parquet file/dir of documents")
    p.add_argument("--output", required=True,
                   help="prepped-shard output dir")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--target-lang", default="en",
                   help="'none' keeps all languages")
    p.add_argument("--test-input", default=None,
                   help="Parquet of held-out benchmark docs; enables "
                        "n-gram decontamination")
    p.add_argument("--decontam-k", type=int, default=5)
    p.add_argument("--clean", default="none",
                   choices=["none", "substring", "passage"],
                   help="passage-level byte rewriting between dedup "
                        "and token counting")
    p.add_argument("--shard-capacity", type=int, default=1 << 20,
                   help="tokens per output shard")
    p.add_argument("--overwrite", action="store_true",
                   help="clear an existing shards/ dir before writing "
                        "(partitioned writes are additive otherwise)")
    args = p.parse_args()

    # fail BEFORE the expensive chain runs: an additive partitioned
    # write into a non-empty shards dir would silently duplicate rows
    shards_dir = os.path.join(args.output, "shards")
    if os.path.isdir(shards_dir) and os.listdir(shards_dir):
        if not args.overwrite:
            print(f"error: {shards_dir} exists and is non-empty; "
                  f"pass --overwrite to replace it (partitioned "
                  f"writes are additive)", file=sys.stderr)
            return 2
        import shutil
        shutil.rmtree(shards_dir)

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, logging_level="ERROR")

    from dedup_restore_ray.config import PipelineConfig
    from dedup_restore_ray.pipelines.prep import prep_corpus
    from dedup_restore_ray.sources.io import read_parquet_clean

    t0 = time.time()
    docs = read_parquet_clean(args.input,
                              columns=[args.id_col, args.text_col])
    test_docs = (read_parquet_clean(args.test_input,
                                    columns=[args.text_col])
                 if args.test_input else None)
    res = prep_corpus(
        docs, PipelineConfig(), id_col=args.id_col,
        text_col=args.text_col,
        target_lang=(None if args.target_lang.lower() == "none"
                     else args.target_lang),
        test_docs=test_docs, decontam_k=args.decontam_k,
        clean=(None if args.clean == "none" else args.clean),
        shard_capacity=args.shard_capacity)
    # data under shards/ so a plain read_parquet(output/shards) never
    # trips over the manifest file
    res.docs.write_parquet(shards_dir, partition_cols=["shard_id"])
    manifest = dict(res.manifest, wall_sec=round(time.time() - t0, 2),
                    output_dir=shards_dir)
    with open(os.path.join(args.output, "prep_manifest.json"),
              "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
