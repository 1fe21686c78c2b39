"""Benchmark: headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

--scaling: runs the headline pipeline in two fresh processes
(num_cpus=8 and num_cpus=32) on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the
north_rule's two-cluster-size criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def run_benchmarks() -> dict:
    import ray.data as rd
    from dedup_restore_ray.config import PipelineConfig
    from dedup_restore_ray.pipelines.dedup import dedup_pipeline, dedup_stats
    from dedup_restore_ray import queries as Q

    _init_ray()
    timings: dict[str, float] = {}
    n_docs = 0

    # warm the OS page cache so we measure compute+shuffle, not cold disk
    rd.read_parquet(f"{SF_DIR}/documents.parquet").count()

    # --- headline: flagship near-dup pipeline over documents -----------
    t0 = time.time()
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    res = dedup_pipeline(ds, PipelineConfig(), id_col="doc_id",
                         text_col="text")
    stats = dedup_stats(res.assignments)
    n_docs = stats["total"]
    timings["flagship_dedup"] = time.time() - t0

    # --- individual operator benches ------------------------------------
    for name in ["exact_dedup_docs", "minhash_signatures_docs",
                 "near_dup_pairs_docs", "substring_pairs_docs",
                 "similarity_topk", "embedding_cosine_pairs",
                 "q1_lineitem", "grouped_restore", "events_hourly"]:
        fn = Q.QUERIES[name]
        t0 = time.time()
        out = fn(SF_DIR)
        # force execution
        if hasattr(out, "count"):
            out.count()
        timings[name] = time.time() - t0

    headline = timings["flagship_dedup"]
    return {
        "metric": "flagship_neardup_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": int(n_docs),
        "docs_per_sec": round(n_docs / headline, 1) if headline else None,
    }


def run_scaling() -> dict:
    """Same job, two parallelism levels, fresh processes (BASELINE.md
    two-cluster-size criterion stand-in)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "cpus_low": lo, "cpus_high": hi,
        "sec_low": t_lo, "sec_high": t_hi,
        "docs_per_sec_low": r_lo.get("docs_per_sec"),
        "docs_per_sec_high": r_hi.get("docs_per_sec"),
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_benchmarks()
        print(json.dumps(result))
        import ray
        ray.shutdown()
