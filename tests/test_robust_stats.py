"""Robust grouped statistics (q_mad_outlier_events): the doubled-scale
median trick must stay exact on adversarial inputs (exact halves,
even/odd group sizes), and the query must hash-match DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
class TestMadOutliers:
    def test_matches_duckdb_on_adversarial_values(self, tmp_path):
        rng = np.random.default_rng(11)
        n = 4001  # odd AND even group sizes below
        # values land on exact cents, exact half-cents and thirds
        raw = np.concatenate([
            rng.integers(0, 10_000, n) / 100.0,
            rng.integers(0, 10_000, n - 1) / 200.0,
            rng.integers(0, 10_000, n) / 300.0,
        ])
        types = np.concatenate([np.full(n, "a"), np.full(n - 1, "b"),
                                np.full(n, "c")])
        df = pd.DataFrame({"event_type": types, "value": raw,
                           "ts": pd.Timestamp("2024-01-01"),
                           "user_id": 0, "event_id": 0, "props": ""})
        p = tmp_path / "events.parquet"
        df.to_parquet(p)
        from dedup_restore_ray.queries import ORACLE_SQL, q_mad_outlier_events
        got = q_mad_outlier_events(str(tmp_path))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{p}'")
        want = (con.execute(ORACLE_SQL["mad_outlier_events"]).df()
                .sort_values("event_type").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({c: "int64" for c in got.columns[1:]}),
            want[got.columns].astype(
                {c: "int64" for c in got.columns[1:]}))
