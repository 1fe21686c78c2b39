"""KMV distinct-count sketch (functions/sketch.py)."""

import numpy as np
import pytest

from dedup_restore_ray.functions.sketch import (kmv_block_candidates,
                                                kmv_estimate, kmv_hash)


class TestKMV:
    def test_hash_matches_duckdb_md5_number_lower(self):
        import duckdb
        vals = ["42", "hello", "0", "-17", "abc def"]
        got = kmv_hash(vals)
        exp = [duckdb.sql(f"SELECT md5_number_lower('{v}')").fetchone()[0]
               for v in vals]
        assert got.tolist() == exp

    def test_exact_below_k(self):
        vals = [f"u{i}" for i in range(40)] * 3   # 40 distinct, k=64
        est = kmv_estimate(kmv_hash(vals), 64)
        assert est == 40.0

    def test_error_bound_above_k(self):
        # KMV relative error ~ 1/sqrt(k-2); allow 5 sigma
        n, k = 20_000, 256
        vals = [f"user-{i}" for i in range(n)]
        est = kmv_estimate(kmv_hash(vals), k)
        rel = abs(est - n) / n
        assert rel < 5.0 / np.sqrt(k - 2), (est, rel)

    def test_block_merge_equals_global(self):
        # merging per-block bottom-k candidates == sketching globally
        vals = [f"x{i}" for i in range(5000)]
        k = 128
        blocks = [vals[i:i + 700] for i in range(0, len(vals), 700)]
        cands = np.concatenate(
            [kmv_block_candidates(b, k) for b in blocks])
        assert kmv_estimate(cands, k) == kmv_estimate(kmv_hash(vals), k)

    def test_query_matches_oracle(self, ray_session, sf_dir):
        import duckdb
        from dedup_restore_ray.queries import ORACLE_SQL, QUERIES
        got = QUERIES["distinct_users_kmv"](sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
        exp = con.sql(ORACLE_SQL["distinct_users_kmv"]).df()
        assert got["est_distinct"].iloc[0] == exp["est_distinct"].iloc[0]
