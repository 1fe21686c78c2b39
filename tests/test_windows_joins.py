"""as-of join + sliding-window aggregates: parity vs pandas oracles
and block-layout independence (the residual-pass invariant)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _events_frame(n=600, n_users=13, seed=7):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 100_000, n)).astype("int64")
    rng.shuffle(ts)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "ts": ts,
        "value": np.round(rng.uniform(0, 100, n), 2),
    })


class TestAsofJoin:
    @pytest.mark.parametrize("num_blocks", [1, 7])
    def test_parity_vs_pandas_merge_asof(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.joins import asof_join
        df = _events_frame()
        left = df.iloc[::2][["event_id", "user_id", "ts"]]
        right = (df.iloc[1::2][["user_id", "ts", "value"]]
                 .groupby(["user_id", "ts"], as_index=False)["value"].max()
                 .rename(columns={"value": "payload"}))

        got = asof_join(
            rd.from_pandas(left).repartition(num_blocks),
            rd.from_pandas(right).repartition(max(1, num_blocks // 2)),
            key_col="user_id", ts_col="ts", payload_col="payload",
            out_cols=["event_id", "user_id", "ts"],
        ).to_pandas().sort_values("event_id").reset_index(drop=True)

        exp = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("ts"),
            on="ts", by="user_id", direction="backward",
            allow_exact_matches=True,
        ).sort_values("event_id").reset_index(drop=True)

        assert len(got) == len(left)
        pd.testing.assert_series_equal(got["payload"], exp["payload"],
                                       check_names=False)

    def test_inclusive_tie_and_no_match(self, ray_session):
        from dedup_restore_ray.stages.joins import asof_join
        left = pd.DataFrame({"event_id": [1, 2, 3],
                             "user_id": [0, 0, 1],
                             "ts": [10, 5, 10]})
        right = pd.DataFrame({"user_id": [0, 0], "ts": [10, 3],
                              "payload": [99.0, 7.0]})
        got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        key_col="user_id", ts_col="ts",
                        payload_col="payload",
                        out_cols=["event_id", "user_id", "ts"]
                        ).to_pandas().set_index("event_id")
        assert got.loc[1, "payload"] == 99.0   # equal ts matches (inclusive)
        assert got.loc[2, "payload"] == 7.0    # earlier right row
        assert np.isnan(got.loc[3, "payload"])  # user 1: no right rows


def _brute_window_count(df, key, ts, w):
    out = []
    for _, r in df.iterrows():
        grp = df[(df[key] == r[key]) & (df[ts] >= r[ts] - w)
                 & (df[ts] <= r[ts])]
        out.append(len(grp))
    return np.array(out)


class TestSlidingWindow:
    @pytest.mark.parametrize("num_blocks", [1, 5])
    def test_count_parity_vs_brute(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import sliding_window_count
        df = _events_frame(n=300)
        got = sliding_window_count(
            rd.from_pandas(df).repartition(num_blocks),
            key_col="user_id", ts_col="ts", window_seconds=5000,
            out_col="n_win", carry_cols=["event_id", "user_id"],
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        exp = _brute_window_count(df, "user_id", "ts", 5000)
        assert np.array_equal(
            got["n_win"].to_numpy(),
            exp[np.argsort(df["event_id"].to_numpy(), kind="stable")])

    def test_sum_parity_vs_brute(self, ray_session):
        from dedup_restore_ray.stages.windows import sliding_window_sum
        df = _events_frame(n=200)
        got = sliding_window_sum(
            rd.from_pandas(df), key_col="user_id", ts_col="ts",
            value_col="value", window_seconds=5000, out_col="w_sum",
            carry_cols=["event_id"],
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        exp = []
        for _, r in df.sort_values("event_id").iterrows():
            sel = df[(df.user_id == r.user_id)
                     & (df.ts >= r.ts - 5000) & (df.ts <= r.ts)]
            exp.append(sel.value.sum())
        assert np.allclose(got["w_sum"].to_numpy(), np.array(exp),
                           rtol=1e-9, atol=1e-9)

    def test_peers_included_on_equal_ts(self, ray_session):
        from dedup_restore_ray.stages.windows import sliding_window_count
        df = pd.DataFrame({"event_id": [0, 1, 2],
                           "user_id": [5, 5, 5],
                           "ts": [100, 100, 100]})
        got = sliding_window_count(
            rd.from_pandas(df), key_col="user_id", ts_col="ts",
            window_seconds=1, out_col="n_win",
            carry_cols=["event_id"]).to_pandas()
        assert (got["n_win"] == 3).all()   # RANGE-frame peer semantics


class TestLagLead:
    @pytest.mark.parametrize("num_blocks", [1, 7])
    def test_parity_vs_pandas_shift(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import lag_lead
        df = _events_frame(n=400)
        got = lag_lead(
            rd.from_pandas(df).repartition(num_blocks),
            key_col="user_id", order_cols=["ts", "event_id"],
            value_col="value", lag_col="prev", lead_col="next",
            carry_cols=["event_id"],
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        s = df.sort_values(["user_id", "ts", "event_id"])
        exp = pd.DataFrame({
            "event_id": s["event_id"],
            "prev": s.groupby("user_id")["value"].shift(1),
            "next": s.groupby("user_id")["value"].shift(-1),
        }).sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["event_id", "prev", "next"]],
                                      exp, check_dtype=False)

    def test_singleton_groups_null_both_ways(self, ray_session):
        from dedup_restore_ray.stages.windows import lag_lead
        df = pd.DataFrame({"user_id": [1, 2, 3], "ts": [5, 5, 5],
                           "value": [1.0, 2.0, 3.0]})
        got = lag_lead(rd.from_pandas(df), key_col="user_id",
                       order_cols=["ts"], value_col="value"
                       ).to_pandas()
        assert got["lag_value"].isna().all()
        assert got["lead_value"].isna().all()


class TestGroupedQuantile:
    @pytest.mark.parametrize("num_blocks", [1, 6])
    def test_parity_vs_duckdb_quantile_cont(self, ray_session, num_blocks):
        import duckdb
        from dedup_restore_ray.stages.groups import grouped_quantile
        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "k": rng.integers(0, 37, 900).astype(np.int64),
            "v": rng.uniform(0, 1000, 900),
        })
        got = grouped_quantile(
            rd.from_pandas(df).repartition(num_blocks),
            ["k"], "v", [0.5, 0.9], ["p50", "p90"], count_alias="n",
        ).to_pandas().sort_values("k").reset_index(drop=True)
        exp = duckdb.sql(
            "SELECT k, quantile_cont(v, 0.5) AS p50,"
            " quantile_cont(v, 0.9) AS p90, count(*) AS n"
            " FROM df GROUP BY k ORDER BY k").df()
        # bit-exact interpolation (verified formula) — no tolerance
        assert np.array_equal(got["p50"].to_numpy(), exp["p50"].to_numpy())
        assert np.array_equal(got["p90"].to_numpy(), exp["p90"].to_numpy())
        assert np.array_equal(got["n"].to_numpy(), exp["n"].to_numpy())

    def test_single_row_groups(self, ray_session):
        from dedup_restore_ray.stages.groups import grouped_quantile
        df = pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]})
        got = grouped_quantile(rd.from_pandas(df), ["k"], "v",
                               [0.5], ["p50"]).to_pandas().sort_values("k")
        assert np.array_equal(got["p50"].to_numpy(), [10.0, 20.0, 30.0])


class TestBandJoin:
    def test_band_join_parity_vs_brute(self, ray_session):
        from dedup_restore_ray.stages.joins import band_join_pairs
        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "id": np.arange(400, dtype=np.int64),
            "val": np.round(rng.uniform(0, 40, 400), 2),
        })
        eps = 0.25
        got = band_join_pairs(rd.from_pandas(df).repartition(5),
                              id_col="id", value_col="val", eps=eps
                              ).to_pandas()
        vals = df.set_index("id")["val"]
        exp = {(int(a), int(b))
               for i, a in enumerate(df.id)
               for b in df.id[i + 1:]
               if abs(vals[a] - vals[b]) <= eps}
        assert set(map(tuple, got[["u", "v"]].to_numpy())) == exp

    def test_band_join_tie_cluster(self, ray_session):
        from dedup_restore_ray.stages.joins import band_join_pairs
        df = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                           "val": [1.0, 1.0, 1.0, 5.0, 5.1, 9.9]})
        got = band_join_pairs(rd.from_pandas(df), id_col="id",
                              value_col="val", eps=0.1).to_pandas()
        exp = {(0, 1), (0, 2), (1, 2), (3, 4)}
        assert set(map(tuple, got[["u", "v"]].to_numpy())) == exp


class TestRunningTotals:
    @pytest.mark.parametrize("num_blocks", [1, 7])
    def test_parity_vs_pandas_cumsum(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import running_totals
        df = _events_frame(n=500)
        df["cents"] = np.round(df["value"] * 100).astype(np.int64)
        got = (running_totals(
                   rd.from_pandas(df).repartition(num_blocks),
                   "user_id", ["ts", "event_id"], "cents",
                   carry_cols=["event_id"])
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        sdf = df.sort_values(["user_id", "ts", "event_id"])
        sdf["running_sum"] = sdf.groupby("user_id")["cents"].cumsum()
        sdf["running_n"] = sdf.groupby("user_id").cumcount() + 1
        exp = (sdf[["event_id", "running_sum", "running_n"]]
               .sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)

    def test_single_row_groups(self, ray_session):
        from dedup_restore_ray.stages.windows import running_totals
        df = pd.DataFrame({"event_id": [1, 2], "user_id": [10, 20],
                           "ts": [5, 5], "cents": [7, 9]})
        got = (running_totals(rd.from_pandas(df), "user_id",
                              ["ts", "event_id"], "cents",
                              carry_cols=["event_id"])
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        assert got["running_sum"].tolist() == [7, 9]
        assert got["running_n"].tolist() == [1, 1]


class TestFullOuterLookup:
    def test_all_three_row_kinds(self, ray_session):
        from dedup_restore_ray.stages.joins import full_outer_lookup
        left = pa.table({"k": [1, 2, 3], "u": [10, 20, 30],
                         "a": [100, 200, 300]})
        right = pa.table({"k": [2, 3, 4], "u": [20, 30, 40],
                          "b": [7, 8, 9]})
        got = (full_outer_lookup(
                   rd.from_arrow(left).repartition(2),
                   rd.from_arrow(right).repartition(2),
                   key_col="k", left_payload="a", right_payload="b",
                   shared_cols=["u"], left_default=0, right_default=-1)
               .to_pandas().sort_values("u").reset_index(drop=True))
        exp = pd.DataFrame({"u": [10, 20, 30, 40],
                            "a": [100, 200, 300, 0],
                            "b": [-1, 7, 8, 9]})
        pd.testing.assert_frame_equal(got, exp)

    def test_empty_sides(self, ray_session):
        from dedup_restore_ray.stages.joins import full_outer_lookup
        left = pa.table({"k": pa.array([], pa.int64()),
                         "u": pa.array([], pa.int64()),
                         "a": pa.array([], pa.int64())})
        right = pa.table({"k": [5], "u": [50], "b": [1]})
        got = (full_outer_lookup(rd.from_arrow(left), rd.from_arrow(right),
                                 key_col="k", left_payload="a",
                                 right_payload="b", shared_cols=["u"],
                                 left_default=0, right_default=0)
               .to_pandas())
        assert got["u"].tolist() == [50]
        assert got["a"].tolist() == [0]


class TestRowsFrameSum:
    @pytest.mark.parametrize("num_blocks", [1, 7])
    def test_parity_vs_pandas_rolling(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import rows_frame_sum
        df = _events_frame(n=500)
        df["cents"] = np.round(df["value"] * 100).astype(np.int64)
        got = (rows_frame_sum(
                   rd.from_pandas(df).repartition(num_blocks),
                   "user_id", ["ts", "event_id"], "cents", 3,
                   carry_cols=["event_id"])
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        sdf = df.sort_values(["user_id", "ts", "event_id"])
        sdf["rows_sum"] = (sdf.groupby("user_id")["cents"]
                           .rolling(3, min_periods=1).sum()
                           .reset_index(level=0, drop=True)
                           .astype(np.int64))
        exp = (sdf[["event_id", "rows_sum"]]
               .sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)

    def test_frame_shorter_than_k(self, ray_session):
        from dedup_restore_ray.stages.windows import rows_frame_sum
        df = pd.DataFrame({"event_id": [1, 2], "user_id": [5, 5],
                           "ts": [1, 2], "cents": [10, 20]})
        got = (rows_frame_sum(rd.from_pandas(df), "user_id",
                              ["ts", "event_id"], "cents", 10,
                              carry_cols=["event_id"])
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        assert got["rows_sum"].tolist() == [10, 30]


class TestPathNgrams:
    @pytest.mark.parametrize("num_blocks", [1, 7])
    def test_parity_vs_pandas_shift(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import path_ngrams
        rng = np.random.default_rng(11)
        df = _events_frame(n=400)
        df["event_type"] = rng.choice(list("abcd"), len(df))
        got = sorted(path_ngrams(
            rd.from_pandas(df).repartition(num_blocks),
            "user_id", ["ts", "event_id"], "event_type", n=3)
            .to_pandas()["path"])
        sdf = df.sort_values(["user_id", "ts", "event_id"])
        g = sdf.groupby("user_id")["event_type"]
        exp = (sdf["event_type"] + ">" + g.shift(-1) + ">" + g.shift(-2))
        exp = sorted(exp.dropna())
        assert got == exp

    def test_groups_shorter_than_n(self, ray_session):
        from dedup_restore_ray.stages.windows import path_ngrams
        df = pd.DataFrame({"user_id": [1, 1, 2], "ts": [1, 2, 1],
                           "event_id": [1, 2, 3],
                           "event_type": ["a", "b", "c"]})
        got = path_ngrams(rd.from_pandas(df), "user_id",
                          ["ts", "event_id"], "event_type",
                          n=3).to_pandas()
        assert len(got) == 0
        got2 = sorted(path_ngrams(rd.from_pandas(df), "user_id",
                                  ["ts", "event_id"], "event_type",
                                  n=2).to_pandas()["path"])
        assert got2 == ["a>b"]


class TestPartitionTotals:
    @pytest.mark.parametrize("num_blocks", [1, 7])
    def test_parity_vs_groupby_transform(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import partition_totals
        df = _events_frame(n=500)
        df["cents"] = np.round(df["value"] * 100).astype(np.int64)
        got = (partition_totals(
                   rd.from_pandas(df[["event_id", "user_id", "cents"]])
                   .repartition(num_blocks),
                   ["user_id"], "cents",
                   carry_cols=["event_id", "user_id"])
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        exp = df[["event_id", "user_id", "cents"]].copy()
        exp["part_sum"] = (exp.groupby("user_id")["cents"]
                           .transform("sum").astype(np.int64))
        exp["part_n"] = (exp.groupby("user_id")["cents"]
                         .transform("size").astype(np.int64))
        exp = (exp[["event_id", "user_id", "part_sum", "part_n"]]
               .sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)

    def test_multi_key(self, ray_session):
        from dedup_restore_ray.stages.windows import partition_totals
        df = pd.DataFrame({"a": [1, 1, 2, 2], "b": [1, 1, 1, 2],
                           "v": [10, 20, 30, 40]})
        got = (partition_totals(rd.from_pandas(df).repartition(2),
                                ["a", "b"], "v")
               .to_pandas().sort_values(["a", "b", "v"])
               .reset_index(drop=True))
        assert got["part_sum"].tolist() == [30, 30, 30, 40]
        assert got["part_n"].tolist() == [2, 2, 1, 1]


class TestGapsIslands:
    @staticmethod
    def _brute(df):
        rows = []
        for u, g in df.groupby("user_id"):
            seq = sorted(set(g["day"]))
            runs, cur = [], 1
            for a, b in zip(seq, seq[1:]):
                if b == a + 1:
                    cur += 1
                else:
                    runs.append(cur)
                    cur = 1
            runs.append(cur)
            rows.append({"user_id": u, "n_islands": len(runs),
                         "longest_run": max(runs)})
        return (pd.DataFrame(rows).astype("int64")
                .sort_values("user_id").reset_index(drop=True))

    @pytest.mark.parametrize("num_blocks", [1, 7])
    def test_parity_vs_brute_force(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import gaps_islands
        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "user_id": rng.integers(0, 25, 800).astype(np.int64),
            "day": rng.integers(0, 40, 800).astype(np.int64),
        }).drop_duplicates()
        got = (gaps_islands(rd.from_pandas(df).repartition(num_blocks),
                            "user_id", "day")
               .to_pandas().astype("int64")
               .sort_values("user_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, self._brute(df))

    def test_single_runs_and_singletons(self, ray_session):
        from dedup_restore_ray.stages.windows import gaps_islands
        df = pd.DataFrame({"user_id": [1, 1, 1, 2, 3, 3],
                           "day": [5, 6, 7, 9, 1, 3]})
        got = (gaps_islands(rd.from_pandas(df), "user_id", "day")
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        assert got["n_islands"].tolist() == [1, 1, 2]
        assert got["longest_run"].tolist() == [3, 1, 1]


class TestIntervalCountJoin:
    @pytest.mark.parametrize("num_blocks", [1, 7])
    def test_parity_vs_brute_force(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import interval_count_join
        rng = np.random.default_rng(9)
        n = 600
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "ts": rng.integers(0, 5_000, n).astype(np.int64),
        })
        df["is_probe"] = rng.random(n) < 0.3
        df["is_build"] = rng.random(n) < 0.5
        W = 100
        got = (interval_count_join(
                   rd.from_pandas(df).repartition(num_blocks),
                   "user_id", "ts", "is_probe", "is_build", W,
                   carry_cols=["event_id"])
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        exp_rows = []
        for r in df[df["is_probe"]].itertuples():
            m = df[(df["user_id"] == r.user_id) & df["is_build"]
                   & (df["ts"] >= r.ts - W) & (df["ts"] <= r.ts)]
            exp_rows.append({"event_id": r.event_id,
                             "n_in_window": len(m)})
        exp = (pd.DataFrame(exp_rows).astype("int64")
               .sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)

    def test_row_both_probe_and_build_counts_itself(self, ray_session):
        from dedup_restore_ray.stages.windows import interval_count_join
        df = pd.DataFrame({"event_id": [1], "user_id": [5], "ts": [10],
                           "is_probe": [True], "is_build": [True]})
        got = interval_count_join(rd.from_pandas(df), "user_id", "ts",
                                  "is_probe", "is_build", 60,
                                  carry_cols=["event_id"]).to_pandas()
        assert got["n_in_window"].tolist() == [1]

    def test_no_probe_rows(self, ray_session):
        from dedup_restore_ray.stages.windows import interval_count_join
        df = pd.DataFrame({"event_id": [1, 2], "user_id": [5, 5],
                           "ts": [10, 20],
                           "is_probe": [False, False],
                           "is_build": [True, True]})
        got = interval_count_join(rd.from_pandas(df), "user_id", "ts",
                                  "is_probe", "is_build", 60).to_pandas()
        assert len(got) == 0


class TestGlobalRank:
    @pytest.mark.parametrize("num_blocks", [1, 9])
    def test_parity_vs_pandas(self, ray_session, num_blocks):
        from dedup_restore_ray.stages.windows import global_rank
        rng = np.random.default_rng(13)
        n = 700
        df = pd.DataFrame({"v": rng.integers(0, 50, n).astype(np.int64),
                           "id": np.arange(n, dtype=np.int64)})
        got = (global_rank(rd.from_pandas(df).repartition(num_blocks),
                           ["v", "id"], n_tiles=7)
               .to_pandas().sort_values("id").reset_index(drop=True))
        sdf = df.sort_values(["v", "id"]).reset_index(drop=True)
        sdf["rn"] = np.arange(1, n + 1, dtype=np.int64)
        base, rem = n // 7, n % 7
        cut = rem * (base + 1)
        rn0 = sdf["rn"] - 1
        sdf["tile"] = np.where(rn0 < cut, rn0 // (base + 1),
                               rem + (rn0 - cut) // base) + 1
        exp = (sdf[["v", "id", "rn", "tile"]].sort_values("id")
               .reset_index(drop=True))
        got = got[["v", "id", "rn", "tile"]] if "id" in got.columns \
            else got
        pd.testing.assert_frame_equal(
            got, exp.astype({"rn": "int64", "tile": "int64"}))

    def test_duplicate_values_need_tiebreak(self, ray_session):
        """All-equal values: the unique tiebreak still yields distinct
        block first-keys and a correct dense global numbering."""
        from dedup_restore_ray.stages.windows import global_rank
        df = pd.DataFrame({"v": np.zeros(40, dtype=np.int64),
                           "id": np.arange(40, dtype=np.int64)})
        got = (global_rank(rd.from_pandas(df).repartition(5),
                           ["v", "id"])
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert got["rn"].tolist() == list(range(1, 41))


@pytest.mark.usefixtures("ray_session")
class TestGlobalRunningSum:
    """stages/windows.global_running_sum: partition-free cumulative
    sum with block offsets — layout independence + frame modes."""

    def _df(self, n=200, seed=7):
        rng = np.random.default_rng(seed)
        return pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                             "v": rng.integers(0, 50, n).astype(np.int64)})

    def test_exclusive_inclusive_and_layout(self):
        import ray.data as rd
        from dedup_restore_ray.stages.windows import global_running_sum
        df = self._df()
        want_inc = df.v.cumsum().to_numpy()
        for nparts in (1, 7):
            src = rd.from_pandas(df.sample(frac=1.0, random_state=3))
            if nparts > 1:
                src = src.repartition(nparts)
            out = (global_running_sum(src, ["k"], "v",
                                      out_col="rs", exclusive=True)
                   .to_pandas().sort_values("k").reset_index(drop=True))
            assert (out.rs.to_numpy() == want_inc - df.v.to_numpy()).all()
            out2 = (global_running_sum(src, ["k"], "v", out_col="rs",
                                       exclusive=False)
                    .to_pandas().sort_values("k").reset_index(drop=True))
            assert (out2.rs.to_numpy() == want_inc).all()

    def test_nan_block_head_rejected(self):
        # the head guard is best-effort (block heads only, same
        # contract as global_rank): a NaN that IS a block head raises
        import ray.data as rd
        from dedup_restore_ray.stages.windows import global_running_sum
        df = pd.DataFrame({"k": [float("nan")] * 3, "v": [1, 2, 3]})
        with pytest.raises(ValueError, match="non-null"):
            global_running_sum(rd.from_pandas(df), ["k"], "v").count()


@pytest.mark.usefixtures("ray_session")
class TestRollingActiveUsers:
    """q_rolling_active_users: sweep-line == brute per-day distinct."""

    def test_brute_parity(self, tmp_path):
        rng = np.random.default_rng(11)
        n = 3000
        days = rng.integers(19000, 19060, n)
        ts = pd.to_datetime(days * 86400 + rng.integers(0, 86400, n),
                            unit="s")
        df = pd.DataFrame({"ts": ts,
                           "user_id": rng.integers(1, 40, n)})
        df.to_parquet(tmp_path / "events.parquet")
        from dedup_restore_ray.queries import QUERIES
        out = QUERIES["rolling_active_users"](str(tmp_path)).to_pandas()
        ed = pd.DataFrame({"day": days, "user": df.user_id})
        want = {d: ed[(ed.day >= d - 6) & (ed.day <= d)].user.nunique()
                for d in sorted(set(days))}
        assert dict(zip(out.day, out.rolling_users)) == want


@pytest.mark.usefixtures("ray_session")
class TestFunnelDepths:
    def _run(self, rows, override_num_blocks=1):
        from dedup_restore_ray.stages.windows import funnel_depths
        import pyarrow as pa
        t = pa.table({"k": [r[0] for r in rows],
                      "ts": pa.array([r[1] for r in rows],
                                     pa.timestamp("us")),
                      "et": [r[2] for r in rows]})
        ds = rd.from_arrow(t).repartition(override_num_blocks)
        out = funnel_depths(ds, "k", "ts", "et",
                            ["view", "click", "purchase"]).to_pandas()
        return dict(zip(out["k"], out["depth"]))

    def test_strict_order_semantics(self):
        rows = [
            (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
            # out of order: purchase before any view -> depth 1
            (2, 10, "purchase"), (2, 20, "view"),
            # click at SAME ts as earliest view: strictly-after fails
            (3, 10, "view"), (3, 10, "click"),
            # second click after view counts even if one click precedes
            (4, 10, "click"), (4, 20, "view"), (4, 30, "click"),
            # no qualifying purchase -> depth 2
            (5, 1, "view"), (5, 2, "click"), (5, 2, "signup"),
        ]
        d = self._run(rows)
        assert d == {1: 3, 2: 1, 3: 1, 4: 2, 5: 2}

    def test_block_layout_independent(self):
        import numpy as np
        rng = np.random.default_rng(7)
        types = ["view", "click", "purchase", "signup", "error"]
        rows = [(int(rng.integers(0, 40)), int(rng.integers(0, 1000)),
                 types[rng.integers(0, 5)]) for _ in range(2000)]
        a = self._run(rows, override_num_blocks=1)
        b = self._run(rows, override_num_blocks=13)
        assert a == b


class TestGroupedOrderedConcat:
    @pytest.mark.parametrize("num_blocks", [1, 9])
    def test_parity_vs_duckdb_string_agg(self, ray_session, num_blocks):
        import duckdb
        from dedup_restore_ray.stages.windows import grouped_ordered_concat
        rng = np.random.default_rng(23)
        n = 700
        df = pd.DataFrame({
            "k": rng.integers(0, 29, n).astype(np.int64),
            "ts": rng.integers(0, 500, n).astype(np.int64),
            "rid": np.arange(n, dtype=np.int64),
            "v": np.array(list("abcdefgh"))[rng.integers(0, 8, n)],
        })
        got = grouped_ordered_concat(
            rd.from_pandas(df).repartition(num_blocks), "k",
            ["ts", "rid"], "v", sep="-", out_col="agg",
        ).to_pandas().sort_values("k").reset_index(drop=True)
        exp = duckdb.sql(
            "SELECT k, string_agg(v, '-' ORDER BY ts, rid) AS agg "
            "FROM df GROUP BY 1 ORDER BY 1").df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_singleton_and_empty_sep(self, ray_session):
        from dedup_restore_ray.stages.windows import grouped_ordered_concat
        df = pd.DataFrame({"k": [1, 2, 2], "ts": [0, 1, 0],
                           "v": ["x", "b", "a"]})
        got = grouped_ordered_concat(
            rd.from_pandas(df), "k", ["ts"], "v",
        ).to_pandas().sort_values("k").reset_index(drop=True)
        assert list(got["agg"]) == ["x", "ab"]


class TestGroupedWeightedMedian:
    @pytest.mark.parametrize("num_blocks", [1, 8])
    def test_parity_vs_duckdb_window_form(self, ray_session, num_blocks):
        import duckdb
        from dedup_restore_ray.stages.groups import grouped_weighted_median
        rng = np.random.default_rng(31)
        n = 800
        df = pd.DataFrame({
            "k": rng.integers(0, 23, n).astype(np.int64),
            "v": rng.integers(0, 200, n).astype(np.int64),
            "w": rng.integers(0, 9, n).astype(np.int64),  # zeros included
            "rid": np.arange(n, dtype=np.int64),
        })
        got = grouped_weighted_median(
            rd.from_pandas(df).repartition(num_blocks), ["k"], "v", "w",
            "rid", out_col="wm", total_alias="tot",
        ).to_pandas().sort_values("k").reset_index(drop=True)
        exp = duckdb.sql("""
            WITH c AS (SELECT k, v,
                              sum(w) OVER (PARTITION BY k
                                           ORDER BY v, rid) cw,
                              sum(w) OVER (PARTITION BY k) tw
                       FROM df)
            SELECT k, min(v) FILTER (WHERE 2*cw >= tw) AS wm,
                   max(tw) AS tot
            FROM c GROUP BY 1 ORDER BY 1""").df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_all_zero_weight_group_picks_min_value(self, ray_session):
        from dedup_restore_ray.stages.groups import grouped_weighted_median
        df = pd.DataFrame({"k": [1, 1, 1], "v": [30, 10, 20],
                           "w": [0, 0, 0], "rid": [0, 1, 2]})
        got = grouped_weighted_median(
            rd.from_pandas(df), ["k"], "v", "w", "rid",
        ).to_pandas()
        assert list(got["wmedian"]) == [10]

    def test_heavy_tail_dominant_row(self, ray_session):
        from dedup_restore_ray.stages.groups import grouped_weighted_median
        # one row holds >half the weight -> IT is the weighted median
        df = pd.DataFrame({"k": [1]*5, "v": [1, 2, 3, 4, 1000],
                           "w": [1, 1, 1, 1, 100],
                           "rid": list(range(5))})
        got = grouped_weighted_median(
            rd.from_pandas(df), ["k"], "v", "w", "rid").to_pandas()
        assert list(got["wmedian"]) == [1000]
