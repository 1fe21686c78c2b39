"""Worker-crash resilience: Ray Data re-executes map tasks whose
worker process dies mid-batch.  A 256-node run WILL lose workers; the
engine's answers must not change when that happens.  The crashing UDF
kills its own process (os._exit) exactly once per run, keyed by a
flag file — the retried task then completes, and results must be
byte-identical to an undisturbed run."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


class TestWorkerCrashRecovery:
    def test_map_batches_survives_worker_death(self, ray_session,
                                               tmp_path):
        n = 2000
        df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                           "v": np.arange(n, dtype=np.int64) % 97})
        flag = str(tmp_path / "crashed_once")

        class CrashOnce:
            """The FIRST batch processed anywhere kills its worker
            (simulated machine loss); every retry/other batch runs
            the real kernel.  Defined in-function so cloudpickle
            ships it by value to the workers."""

            def __call__(self, b: pa.Table) -> pa.Table:
                if not os.path.exists(flag):
                    try:
                        with open(flag, "x"):
                            pass
                    except FileExistsError:
                        pass
                    else:
                        os._exit(1)   # hard worker death
                v = np.asarray(b.column("v"), dtype=np.int64)
                return pa.table({"doc_id": b.column("doc_id"),
                                 "v2": pa.array(v * 2)})

        out = (rd.from_pandas(df).repartition(8)
               .map_batches(CrashOnce, batch_format="pyarrow",
                            concurrency=2)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        assert os.path.exists(flag), "crash branch never exercised"
        # exactly-once output despite the retry: no loss, no dupes
        assert len(out) == n
        assert (out["v2"].to_numpy()
                == (df["v"].to_numpy() * 2)).all()

    def test_flagship_survives_worker_death(self, ray_session,
                                            tmp_path):
        from dedup_restore_ray.config import PipelineConfig
        from dedup_restore_ray.pipelines.dedup import (dedup_pipeline,
                                                       dedup_stats)
        from dedup_restore_ray.sources.pages import generate_pages
        pages, _ = generate_pages(300, seed=42)
        flag = str(tmp_path / "crashed_once_flagship")

        class KillFirst:
            def __call__(self, b: pa.Table) -> pa.Table:
                if not os.path.exists(flag):
                    try:
                        with open(flag, "x"):
                            pass
                    except FileExistsError:
                        pass
                    else:
                        os._exit(1)
                return b

        ds = rd.from_arrow(pages).repartition(6).map_batches(
            KillFirst, batch_format="pyarrow", concurrency=2)
        res = dedup_pipeline(ds, PipelineConfig(), id_col="url",
                             text_col="text", html_col="html")
        st = dedup_stats(res.assignments)
        assert os.path.exists(flag)
        # same stats as every undisturbed 300-page run
        assert st["total"] == 310 and st["dedup_ratio"] > 1.9

    def test_prep_chain_survives_worker_death(self, ray_session,
                                              tmp_path):
        """The FULL curation chain (dedup -> clean -> token counts ->
        shard packing) under a mid-run worker loss: the manifest and
        per-doc output must match an undisturbed run exactly."""
        from dedup_restore_ray.pipelines.prep import prep_corpus
        from dedup_restore_ray.sources.pages import generate_pages
        pages, _ = generate_pages(250, seed=7)
        tbl = pa.table({"doc_id": pa.array(
            np.arange(pages.num_rows, dtype=np.int64)),
            "text": pages.column("text")})
        flag = str(tmp_path / "crashed_once_prep")

        class KillFirst:
            def __call__(self, b: pa.Table) -> pa.Table:
                if not os.path.exists(flag):
                    try:
                        with open(flag, "x"):
                            pass
                    except FileExistsError:
                        pass
                    else:
                        os._exit(1)
                return b

        def run(with_crash: bool):
            ds = rd.from_arrow(tbl).repartition(6)
            if with_crash:
                ds = ds.map_batches(KillFirst, batch_format="pyarrow",
                                    concurrency=2)
            res = prep_corpus(ds, quality=False, target_lang=None,
                              clean="substring")
            out = (res.docs.to_pandas().sort_values("doc_id")
                   .reset_index(drop=True))
            return res.manifest, out

        m_crash, out_crash = run(True)
        assert os.path.exists(flag), "crash branch never exercised"
        m_ref, out_ref = run(False)
        assert m_crash == m_ref
        pd.testing.assert_frame_equal(out_crash, out_ref)
