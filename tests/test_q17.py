"""TPC-H Q17-shaped small-quantity revenue (q_small_qty_revenue_parts)."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
class TestSmallQtyRevenue:
    def test_matches_pandas_reference(self, sf_dir):
        from dedup_restore_ray.queries import (q_small_qty_revenue_parts,
                                               round_half_up)
        out = q_small_qty_revenue_parts(sf_dir).to_pandas()
        assert list(out.columns) == ["n_small", "revenue_cents"]
        assert len(out) == 1
        part = pd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_brand"])
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_partkey", "l_quantity",
                                      "l_extendedprice"])
        keys = set(part.loc[part["p_brand"] == "Brand#1", "p_partkey"])
        b = li[li["l_partkey"].isin(keys)].copy()
        b["q"] = b["l_quantity"].astype(np.int64)
        g = b.groupby("l_partkey")["q"].agg(["sum", "count"])
        sq = b["l_partkey"].map(g["sum"]).to_numpy(np.int64)
        cnt = b["l_partkey"].map(g["count"]).to_numpy(np.int64)
        small = 5 * b["q"].to_numpy() * cnt < sq
        cents = round_half_up(
            b["l_extendedprice"].to_numpy()[small] * 100.0, 0)
        assert int(out["n_small"].iloc[0]) == int(small.sum())
        assert int(out["revenue_cents"].iloc[0]) == int(cents.sum())
        assert small.sum() > 0          # fixture exercises the filter

    def test_absent_brand_returns_zero_row(self, sf_dir):
        from dedup_restore_ray.queries import q_small_qty_revenue_parts
        out = q_small_qty_revenue_parts(
            sf_dir, brand="Brand#nope").to_pandas()
        assert len(out) == 1
        assert int(out["n_small"].iloc[0]) == 0
        assert int(out["revenue_cents"].iloc[0]) == 0
