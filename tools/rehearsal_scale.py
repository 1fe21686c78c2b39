"""100x-scale driver-memory rehearsal: run the flagship or the prep
chain over a 5M-doc synthetic page corpus (10x the scaling corpus)
with DEFAULT scale gates, recording wall time, peak driver RSS and
which gate decisions actually fired (scale_mode / cluster_strategy).

    python tools/rehearsal_scale.py flagship   # or: prep

Generates/caches the corpus at /tmp/pages_scaling_5000000 on first
use.  This script OWNS a Ray session (library code never inits)."""
import json, os, sys, threading, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

peak = {"rss_mb": 0.0}
def _rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0
def sampler():
    while True:
        peak["rss_mb"] = max(peak["rss_mb"], _rss_mb())
        time.sleep(0.5)
threading.Thread(target=sampler, daemon=True).start()

import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.pipelines.dedup import dedup_pipeline
from dedup_restore_ray.sources.io import read_parquet_clean

path = "/tmp/pages_scaling_5000000/pages.parquet"
if not os.path.exists(path):
    from dedup_restore_ray.sources.pages import write_pages
    write_pages("/tmp/pages_scaling_5000000", n_docs=5_000_000, seed=42)
stage = sys.argv[1] if len(sys.argv) > 1 else "flagship"
t0 = time.time()
if stage == "flagship":
    ds = read_parquet_clean(path, columns=["url", "text", "html"])
    # DEFAULT config: broadcast_limit=2M -> 5M docs trips scale_mode
    res = dedup_pipeline(ds, PipelineConfig(), id_col="url",
                         text_col="text", html_col="html")
    res.assignments.count()
    dt = time.time() - t0
    out = {"stage": "flagship_5m", "wall_sec": round(dt, 1),
           "docs_per_sec": round(5_000_000 / dt, 1),
           "peak_driver_rss_mb": round(peak["rss_mb"], 1),
           "scale_mode": res.metrics.get("scale_mode"),
           "cluster_strategy": res.metrics.get("cluster_strategy"),
           "verified_pairs": res.metrics.get("verified_pairs"),
           "candidate_pairs": res.metrics.get("candidate_pairs"),
           "stage_sec": res.metrics.get("stage_sec")}
else:
    from dedup_restore_ray.pipelines.prep import prep_corpus
    ds = read_parquet_clean(path, columns=["url", "text"])
    res = prep_corpus(ds, PipelineConfig(), id_col="url",
                      text_col="text", target_lang=None,
                      quality=False)
    dt = time.time() - t0
    out = {"stage": "prep_5m", "wall_sec": round(dt, 1),
           "docs_per_sec": round(5_000_000 / dt, 1),
           "peak_driver_rss_mb": round(peak["rss_mb"], 1),
           "manifest": {k: v for k, v in res.manifest.items()
                        if k != "dedup_metrics"}}
print(json.dumps(out))
ray.shutdown()
