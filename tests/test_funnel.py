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
