"""Filter-funnel attrition report (q_filter_funnel_docs)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
class TestFilterFunnel:
    def test_monotone_and_consistent(self, sf_dir):
        from dedup_restore_ray.queries import (q_exact_dedup_docs,
                                               q_filter_funnel_docs,
                                               q_quality_filter_docs)
        f = q_filter_funnel_docs(sf_dir)
        s = f["survivors"].to_numpy()
        assert list(f["stage"]) == list(range(8))
        # attrition is monotone non-increasing by construction
        assert (np.diff(s) <= 0).all()
        # stage 6 == the standalone Gopher filter's kept count
        kept = q_quality_filter_docs(sf_dir).to_pandas()["kept"].sum()
        assert s[6] == int(kept)
        # stage 0 == corpus size; dedup stage can't beat distinct texts
        asg = q_exact_dedup_docs(sf_dir).to_pandas()
        assert s[0] == len(asg)
        assert s[7] <= (~asg["is_dup"]).sum()

    def test_empty_corpus(self):
        import os
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        from dedup_restore_ray.queries import q_filter_funnel_docs
        t = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string()),
                      "lang": pa.array([], pa.string()),
                      "source": pa.array([], pa.string()),
                      "n_chars": pa.array([], pa.int64())})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            f = q_filter_funnel_docs(d)
        assert list(f["survivors"]) == [0] * 8
