"""TPC-H Q22-shaped idle-rich-customer rollup (q_idle_rich_customers)."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
class TestIdleRichCustomers:
    def test_matches_pandas_reference(self, sf_dir):
        from dedup_restore_ray.queries import (q_idle_rich_customers,
                                               round_half_up)
        out = (q_idle_rich_customers(sf_dir).to_pandas()
               .sort_values("c_nationkey").reset_index(drop=True))
        cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
        orders = pd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey", "o_orderpriority"])
        cents = round_half_up(
            cust["c_acctbal"].to_numpy() * 100.0, 0).astype(np.int64)
        pos = cents[cents > 0]
        s, n = int(pos.sum()), len(pos)
        urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT",
                                "o_custkey"])
        keep = (cents * n > s) & ~cust["c_custkey"].isin(urgent).to_numpy()
        assert keep.sum() > 0               # fixture is non-degenerate
        ref = (pd.DataFrame({"c_nationkey": cust["c_nationkey"][keep],
                             "cents": cents[keep]})
               .groupby("c_nationkey")
               .agg(acctbal_cents=("cents", "sum"),
                    n_cust=("cents", "size"))
               .reset_index().sort_values("c_nationkey")
               .reset_index(drop=True))
        assert (out["c_nationkey"].to_numpy()
                == ref["c_nationkey"].to_numpy()).all()
        assert (out["acctbal_cents"].to_numpy(np.int64)
                == ref["acctbal_cents"].to_numpy(np.int64)).all()
        assert (out["n_cust"].to_numpy(np.int64)
                == ref["n_cust"].to_numpy(np.int64)).all()
