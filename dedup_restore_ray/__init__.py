"""dedup_restore_ray — a Ray-Data-native near-duplicate detection engine.

A from-scratch re-expression of the capabilities of the reference engine
``viccto/dedup_restore`` (single-threaded C "optsmr": content-defined
chunking + SHA-1 fingerprint index + duplicate-aware container storage +
grouped restore) as an idiomatic Ray Data pipeline over Parquet web-page
tables:

- exact dedup      = content-hash groupby, first-wins canonical
                     (reference: src/dedup.c:105-175 index lookup semantics)
- near-dup         = 5-gram shingles -> MinHash-128 -> LSH 16x8 banding
                     -> exact-Jaccard verify (new capability per north_rule)
- substring dedup  = winnowing fingerprints / per-partition suffix array
                     (heritage of the rolling Adler-32 chunker,
                     reference: src/chunk.c:31-127, src/adler32.c)
- clustering       = union-find via iterative groupby-min-label propagation
- lineage/metrics  = per-partition manifests (reference counters
                     include/optsmr.h:26-37 reborn as data)

Everything is built on ``ray.data.Dataset`` + ``map_batches`` over
zero-copy Arrow batches; stateful stages are actor pools.
"""

from dedup_restore_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
