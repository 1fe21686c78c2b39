"""Benchmark: headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

--scaling: runs the headline pipeline in two fresh processes at two
parallelism levels — num_cpus=1 vs 4 by default (env-overridable via
GRAFT_SCALING_LOW/HIGH; see run_scaling's rationale and BASELINE.md
for why 1-vs-4 and not 8-vs-32 on this host) — on the same input and
reports both throughputs + scaling efficiency (the sandbox stand-in
for the north_rule's two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
HEADLINE_REPEATS = int(os.environ.get("GRAFT_HEADLINE_REPEATS", "2"))


def _host_memband_mb_s() -> float:
    """Page-fault/first-touch bandwidth probe (alloc + fill 400 MB).
    The sandbox host's fault path varies >10x between days; this gives
    the denominator for interpreting wall-clock numbers across rounds
    (see BASELINE.md 'host variance')."""
    import numpy as np
    t0 = time.time()
    y = np.empty(50_000_000)
    y.fill(1.0)
    dt = time.time() - t0
    del y
    return round(400.0 / dt, 1)


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
    from dedup_restore_ray.sources.io import read_parquet_clean
    from dedup_restore_ray import queries as Q

    _init_ray()
    timings: dict[str, float] = {}
    n_docs = 0

    # warm the OS page cache so we measure compute+shuffle, not cold disk
    read_parquet_clean(f"{SF_DIR}/documents.parquet").count()

    # --- headline: flagship near-dup pipeline over documents -----------
    # best-of-N: the shared host's wall clock varies 2-10x between
    # runs (BASELINE.md), so a single sample mostly measures the host
    flagship_runs = []
    for _ in range(max(1, HEADLINE_REPEATS)):
        t0 = time.time()
        ds = read_parquet_clean(f"{SF_DIR}/documents.parquet",
                             columns=["doc_id", "text"])
        res = dedup_pipeline(ds, PipelineConfig(), id_col="doc_id",
                             text_col="text")
        if "dedup_ratio" in res.metrics:
            # fused counters; still consume the attached output once
            n_docs = res.metrics["total"]
            res.assignments.count()
        else:
            n_docs = dedup_stats(res.assignments)["total"]
        flagship_runs.append(time.time() - t0)
    timings["flagship_dedup"] = min(flagship_runs)

    # one-permutation-hashing signature option (scale path; default
    # stays "perm" — the north_rule's oracle config)
    t0 = time.time()
    ds = read_parquet_clean(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    dedup_stats(dedup_pipeline(ds, PipelineConfig(minhash_mode="oph"),
                               id_col="doc_id",
                               text_col="text").assignments)
    timings["flagship_dedup_oph"] = round(time.time() - t0, 3)

    # --- individual operator benches ------------------------------------
    for name in ["exact_dedup_docs", "minhash_signatures_docs",
                 "near_dup_pairs_docs", "substring_pairs_docs",
                 "similarity_topk", "embedding_cosine_pairs",
                 "q1_lineitem", "grouped_restore", "events_hourly",
                 "update_restore_docs", "windowed_restore_docs",
                 "ann_ivf", "sessionize_events",
                 "asof_join_events", "sliding_window_events",
                 "quality_filter_docs", "decontaminate_docs",
                 "revenue_by_nation", "simhash_pairs_docs",
                 "passage_dedup_docs", "boilerplate_docs",
                 "term_lookup_docs", "bm25_docs",
                 "source_overlap_docs", "order_rank_windows",
                 "zonemap_range_events", "clicks_before_error",
                 "event_paths", "waiting_orders_suppliers",
                 "dup_rate_by_source", "approx_quantile_nchars",
                 "pii_scrub_docs", "semdedup_embeddings",
                 "exact_substring_spans_docs", "dsir_weights_docs",
                 "soft_dedup_weights_docs", "ccnet_buckets_docs",
                 "ssjoin_docs", "graph_triangles", "pagerank_parts",
                 "skyline_parts", "volume_shipping", "product_profit",
                 "copurchase_parts", "pmi_collocations",
                 "unimax_alloc_docs", "bpe_merge_pairs_docs",
                 "snm_pairs_docs", "filter_funnel_docs",
                 "mutual_nn_embeddings", "badwords_filter_docs",
                 "char_entropy_docs", "source_kl_docs",
                 "zipf_slope_tokens", "top_supplier_revenue",
                 "weighted_neardup_pairs_docs",
                 "distinct_tokens_by_source_kmv",
                 "url_dedup_docs", "dedup_threshold_curve_docs",
                 "bbit_near_dup_pairs_docs", "bpe_train_docs",
                 "min_cost_supplier_parts", "funnel_events",
                 "mad_outlier_events", "corr_moments_lineitem",
                 "normalized_dedup_docs", "passage_neardup_docs",
                 "kmv_rollup_users", "bfs_copurchase_parts",
                 "incremental_agg_events", "source_venn_docs",
                 "densify_hourly_events",
                 "gap_percentiles_events", "user_event_signature",
                 "fk_audit", "peak_open_orders",
                 "weighted_median_nchars", "new_vs_returning_users",
                 "abc_classification_parts", "burst_hours_events",
                 "time_to_convert_events", "kmeans_embeddings",
                 "kcore_copurchase_parts", "assoc_rules_parts",
                 "cohort_retention_events", "precedence_matrix_events",
                 "media_phash_pairs", "term_lookup_append_docs",
                 "substring_search_append_docs", "bpe_encode_docs",
                 "winsorized_sum_events", "llm_prep_docs",
                 "order_reconciliation", "timed_conversion_events",
                 "leakage_free_split_docs", "llm_prep_clean_docs",
                 "cdc_chunks", "media_features", "frame_sample"]:
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
        "flagship_runs": [round(t, 3) for t in flagship_runs],
        "host_memband_mb_s": _host_memband_mb_s(),
    }


SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "500000"))
SCALING_LOW = int(os.environ.get("GRAFT_SCALING_LOW", "1"))
SCALING_HIGH = int(os.environ.get("GRAFT_SCALING_HIGH", "4"))


def _scaling_corpus() -> str:
    path = f"/tmp/pages_scaling_{SCALING_DOCS}"
    if not os.path.exists(os.path.join(path, "pages.parquet")):
        from dedup_restore_ray.sources.pages import write_pages
        write_pages(path, n_docs=SCALING_DOCS, seed=42)
    return os.path.join(path, "pages.parquet")


def run_scaling_child() -> dict:
    """One flagship run over the deterministic synthetic page corpus
    (north_rule input shape) at RAY_GRAFT_CPUS."""
    from dedup_restore_ray.config import PipelineConfig
    from dedup_restore_ray.pipelines.dedup import dedup_pipeline, dedup_stats
    from dedup_restore_ray.sources.io import read_parquet_clean
    path = _scaling_corpus()
    t_init = time.time()
    _init_ray()
    init_sec = time.time() - t_init
    t0 = time.time()
    ds = read_parquet_clean(path, columns=["url", "text", "html"])
    # broadcast_limit is a DRIVER-MEMORY gate (the verify shingle pack
    # is ~8 B x shingles per canonical — ~2 GB per million canonicals);
    # raise it for the scaling corpora so every corpus size exercises
    # the same (broadcast) pipeline shape on this 128 GiB host, instead
    # of flipping to the all-shuffle scale path right at 2M docs.
    cfg = PipelineConfig(
        broadcast_limit=max(4_000_000, SCALING_DOCS * 2),
        minhash_mode=os.environ.get("GRAFT_SCALING_MINHASH", "perm"))
    blocks_env = os.environ.get("GRAFT_SCALING_BLOCKS")
    res = dedup_pipeline(
        ds, cfg, id_col="url", text_col="text", html_col="html",
        verify_strategy=os.environ.get("GRAFT_SCALING_VERIFY",
                                       "broadcast"),
        num_blocks=int(blocks_env) if blocks_env is not None else None)
    t_stats = time.time()
    if "dedup_ratio" in res.metrics:
        # counters fused into the pipeline's own driver state — the
        # only remaining tail work is executing the (vectorized)
        # cluster-id attach once, which any real consumer pays anyway
        stats = {k: res.metrics[k]
                 for k in ("total", "dup", "unique", "dedup_ratio")}
        res.assignments.count()
    else:
        stats = dedup_stats(res.assignments)
    stats_sec = time.time() - t_stats
    dt = time.time() - t0
    return {"value": round(dt, 2), "n_docs": stats["total"],
            "docs_per_sec": round(stats["total"] / dt, 1),
            "num_cpus": NUM_CPUS, "ray_init_sec": round(init_sec, 2),
            "stats_sec": round(stats_sec, 2),
            "stage_sec": res.metrics.get("stage_sec", {})}


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes — the
    sandbox stand-in for the north_rule's N vs 4N cluster-size
    criterion.  Interleaved best-of-2 per level because the shared
    host's throughput varies ±2-3x between runs (see BASELINE.md).
    N=1 vs 4N=4: the shared host delivers only ~4-8 effective cores
    for memory-traffic-heavy work (measured: 32 procs of elementwise
    numpy reach ~7x one proc), so comparing 8-vs-32 Ray CPUs measures
    host contention, not the engine; 1-vs-4 stays inside the
    hardware's real parallel capacity."""
    _scaling_corpus()  # generate once, outside the timed runs

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child"],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    def fresh_probe() -> float:
        # first-touch bandwidth is only meaningful in a FRESH process
        # (a warm process reuses its freed pages fault-free)
        out = subprocess.run(
            [sys.executable, "-c",
             "import bench; print(bench._host_memband_mb_s())"],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return float(out.stdout.strip().splitlines()[-1])

    def parallel_roof() -> float:
        """The HARDWARE's own 1-vs-4-process scaling efficiency for
        memory-streaming numpy work in the CURRENT host window — the
        denominator for judging the engine's number (a shared host
        that delivers 2.9x for 4 plain numpy processes caps ANY
        engine at ~0.72; see BASELINE.md 'host variance')."""
        code = ("import numpy as np,time;n=40_000_000;"
                "a=np.random.rand(n);b=np.random.rand(n);"
                "t0=time.time()\n"
                "for _ in range(8): c=a*b+a\n"
                "print(time.time()-t0)")

        def run_k(k: int) -> float:
            ps = [subprocess.Popen([sys.executable, "-c", code],
                                   stdout=subprocess.PIPE)
                  for _ in range(k)]
            return max(float(p.communicate()[0]) for p in ps)

        t1, t4 = run_k(1), run_k(4)
        return round(t1 / t4, 3)

    probes = [fresh_probe()]
    roofs = [parallel_roof()]
    lo, hi = SCALING_LOW, SCALING_HIGH
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    runs = {lo: [], hi: []}
    stage_best: dict[int, dict] = {lo: {}, hi: {}}
    for _ in range(repeats):               # interleaved A/B, best-of-N
        for level in (lo, hi):
            r = run(level)
            runs[level].append(r["value"])
            if r["value"] == min(runs[level]):
                stage_best[level] = r.get("stage_sec", {})
        probes.append(fresh_probe())
    roofs.append(parallel_roof())
    t_lo, t_hi = min(runs[lo]), min(runs[hi])
    eff = (t_lo / t_hi) / (hi / lo)
    # per-stage efficiency of the two best repeats: which stages
    # scale and which are fixed-barrier-bound (tail evidence)
    per_stage_eff = {
        k: round((stage_best[lo][k] / stage_best[hi][k]) / (hi / lo), 3)
        for k in stage_best[lo]
        if stage_best[hi].get(k) and stage_best[lo][k] > 0}
    import statistics
    per_repeat = [round((a / b) / (hi / lo), 3)
                  for a, b in zip(runs[lo], runs[hi])]
    return {
        "metric": "scaling_efficiency",
        "cpus_low": lo, "cpus_high": hi,
        "sec_low": t_lo, "sec_high": t_hi,
        "runs_low": runs[lo], "runs_high": runs[hi],
        "n_docs": SCALING_DOCS,
        "docs_per_sec_low": round(SCALING_DOCS / t_lo, 1),
        "docs_per_sec_high": round(SCALING_DOCS / t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        # the north_rule robustness evidence: per-repeat pairings +
        # median, with the host first-touch-bandwidth probe between
        # every repeat (interpretation denominator, see BASELINE.md)
        "per_repeat_efficiency": per_repeat,
        "median_efficiency": round(statistics.median(per_repeat), 3),
        "stage_sec_low": stage_best[lo],
        "stage_sec_high": stage_best[hi],
        "per_stage_efficiency": per_stage_eff,
        "host_memband_probes_mb_s": probes,
        # hardware 1-vs-4-process numpy-streaming efficiency in the
        # same window (before / after): the ceiling any engine can
        # reach on this shared host — report engine eff NEXT TO it
        "host_parallel_roof": roofs,
        "efficiency_vs_roof": round(eff / max(roofs), 3),
    }


def run_kernel_child(n_docs: int = 100_000) -> float:
    """One in-process (NO Ray) pass of the flagship signature kernels
    over the first n_docs of the scaling corpus; returns seconds.
    Used by the kernel-scaling probe below."""
    import pyarrow.parquet as pq
    from dedup_restore_ray.config import PipelineConfig
    from dedup_restore_ray.pipelines.dedup import ExtractText
    from dedup_restore_ray.stages.signatures import SignatureStage
    tb = pq.read_table(_scaling_corpus(),
                       columns=["url", "text", "html"]).slice(0, n_docs)
    cfg = PipelineConfig()
    stage = SignatureStage(cfg, id_col="url", text_col="text",
                           emit_minhash=False, emit_bucket_keys=True)
    ex = ExtractText(html_col="html", text_col="text")
    t0 = time.time()
    for lo in range(0, n_docs, cfg.batch_size):
        stage(ex(tb.slice(lo, cfg.batch_size)))
    return time.time() - t0


def kernel_scaling(n_docs: int = 100_000) -> dict:
    """The ENGINE-COMPUTE half of the scaling story: the flagship's
    signature stage (the measured 65-70%% cost center) run as 1 vs 4
    plain processes with NO Ray — isolates the kernels' parallel
    efficiency from the single-box object-store/shuffle bandwidth that
    a real 4N-node cluster would not share.  Reported next to the
    end-to-end number and the numpy hardware roof in BASELINE.md."""
    code = (f"import bench; print(bench.run_kernel_child({n_docs}))")

    def run_k(k: int) -> float:
        ps = [subprocess.Popen([sys.executable, "-c", code],
                               stdout=subprocess.PIPE,
                               cwd=os.path.dirname(os.path.abspath(__file__)))
              for _ in range(k)]
        return max(float(p.communicate()[0].strip().splitlines()[-1])
                   for p in ps)

    t1, t4 = run_k(1), run_k(4)
    return {"metric": "signature_kernel_scaling", "n_docs": n_docs,
            "sec_1proc": round(t1, 2), "sec_4proc_max": round(t4, 2),
            "kernel_scaling_efficiency": round(t1 / t4, 3),
            "docs_per_sec_1proc": round(n_docs / t1, 1),
            "agg_docs_per_sec_4proc": round(4 * n_docs / t4, 1)}


if __name__ == "__main__":
    if "--kernel-scaling" in sys.argv:
        print(json.dumps(kernel_scaling()))
    elif "--scaling" in sys.argv:
        out = run_scaling()
        out["signature_kernel_scaling"] = kernel_scaling()
        print(json.dumps(out))
    elif "--scaling-child" in sys.argv:
        result = run_scaling_child()
        print(json.dumps(result))
        import ray
        ray.shutdown()
    else:
        result = run_benchmarks()
        print(json.dumps(result))
        import ray
        ray.shutdown()
