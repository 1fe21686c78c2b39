"""Soft deduplication weights (q_soft_dedup_weights_docs)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
class TestSoftDedupWeights:
    def test_weights_consistent_with_clusters(self, sf_dir):
        from dedup_restore_ray.queries import (q_dedup_clusters_docs,
                                               q_soft_dedup_weights_docs)
        w = q_soft_dedup_weights_docs(sf_dir).to_pandas()
        asg = q_dedup_clusters_docs(sf_dir).to_pandas()
        assert len(w) == len(asg)                       # every doc kept
        sizes = asg.groupby("cluster_id").size()
        for row in w.itertuples(index=False):
            sz = int(sizes[row.cluster_id])
            assert row.cluster_size == sz
            assert row.weight_micro == 1_000_000 // sz
        # each cluster contributes ~1e6 of sampling mass (floor slack)
        per_cluster = w.groupby("cluster_id").agg(
            m=("weight_micro", "sum"), n=("cluster_size", "first"))
        assert (per_cluster["m"]
                <= 1_000_000).all()
        assert (per_cluster["m"]
                > 1_000_000 - per_cluster["n"]).all()
