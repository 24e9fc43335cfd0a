"""grouped_top_k / rolling_agg: distributed results must equal
single-frame pandas re-derivations (rank-filter; rolling windows)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tsfeatures_ray.functions import grouped_top_k, rolling_agg


def _frame(seed=0, n=500, n_keys=17):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, n_keys, n),
            "rid": np.arange(n),
            "v": rng.integers(0, 50, n),  # many ties
            "f": rng.normal(size=n),
        }
    )


class TestGroupedTopK:
    @pytest.mark.parametrize("descending", [True, False])
    def test_matches_rank_filter(self, ray_session, descending):
        df = _frame(3)
        got = (
            grouped_top_k(
                rd.from_pandas(df), "g", "v", k=3,
                descending=descending, tie_cols=["rid"], num_parts=5,
            )
            .to_pandas()
            .sort_values(["g", "rk"])
            .reset_index(drop=True)
        )
        want = df.sort_values(
            ["g", "v", "rid"], ascending=[True, not descending, True],
            kind="mergesort",
        )
        want = want.groupby("g", sort=False).head(3)
        want = want.sort_values(["g", "v", "rid"],
                                ascending=[True, not descending, True],
                                kind="mergesort").reset_index(drop=True)
        want["rk"] = want.groupby("g", sort=False).cumcount() + 1
        want = want.sort_values(["g", "rk"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["g", "rid", "v", "rk"]].astype("int64"),
            want[["g", "rid", "v", "rk"]].astype("int64"),
        )

    def test_multi_group_cols(self, ray_session):
        df = _frame(9)
        df["g2"] = df["rid"] % 3
        got = (
            grouped_top_k(rd.from_pandas(df), ["g", "g2"], "v", k=2,
                          tie_cols=["rid"], num_parts=4)
            .to_pandas()
        )
        want = (
            df.sort_values(["g", "g2", "v", "rid"],
                           ascending=[True, True, False, True])
            .groupby(["g", "g2"], sort=False).head(2)
        )
        assert len(got) == len(want)
        assert set(map(tuple, got[["g", "g2", "rid"]].to_numpy())) == set(
            map(tuple, want[["g", "g2", "rid"]].to_numpy())
        )

    def test_k_larger_than_group(self, ray_session):
        df = _frame(1, n=40, n_keys=30)
        got = grouped_top_k(rd.from_pandas(df), "g", "v", k=10,
                            tie_cols=["rid"]).to_pandas()
        assert len(got) == len(df)

    def test_bad_k(self, ray_session):
        with pytest.raises(ValueError):
            grouped_top_k(rd.from_pandas(_frame(1)), "g", "v", k=0)


class TestRollingAgg:
    def test_matches_pandas_rolling(self, ray_session):
        df = _frame(5)
        got = (
            rolling_agg(rd.from_pandas(df), key="g", order="rid",
                        cols=["v", "f"], window=4, num_parts=6)
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        base = df.sort_values(["g", "rid"], kind="mergesort")
        grouped = base.groupby("g", sort=False)
        want = base.copy()
        for c in ("v", "f"):
            r = grouped[c].rolling(4, min_periods=1)
            want[f"{c}_roll_sum"] = r.sum().to_numpy()
            want[f"{c}_roll_mean"] = r.mean().to_numpy()
            want[f"{c}_roll_min"] = r.min().to_numpy()
            want[f"{c}_roll_max"] = r.max().to_numpy()
        want = want.sort_values("rid").reset_index(drop=True)
        for c in ("v", "f"):
            for a in ("sum", "mean", "min", "max"):
                np.testing.assert_allclose(
                    got[f"{c}_roll_{a}"].to_numpy(dtype=float),
                    want[f"{c}_roll_{a}"].to_numpy(dtype=float),
                    rtol=1e-12, err_msg=f"{c}_roll_{a}",
                )

    def test_int_columns_exact(self, ray_session):
        df = _frame(8)
        got = rolling_agg(rd.from_pandas(df), key="g", order="rid",
                          cols=["v"], window=3).to_pandas()
        assert got["v_roll_sum"].dtype == np.int64
        assert got["v_roll_min"].dtype == np.int64
        assert got["v_roll_max"].dtype == np.int64

    def test_window_one_is_identity(self, ray_session):
        df = _frame(4)
        got = (
            rolling_agg(rd.from_pandas(df), key="g", order="rid",
                        cols=["v"], window=1)
            .to_pandas().sort_values("rid").reset_index(drop=True)
        )
        assert (got["v_roll_sum"].to_numpy() == got["v"].to_numpy()).all()
        assert (got["v_roll_mean"].to_numpy() == got["v"].to_numpy()).all()

    def test_bad_window(self, ray_session):
        with pytest.raises(ValueError):
            rolling_agg(rd.from_pandas(_frame(1)), key="g", order="rid",
                        cols=["v"], window=0)


class TestGroupedAgg:
    def test_matches_pandas(self, ray_session):
        from tsfeatures_ray.functions.grouped import grouped_agg

        df = _frame(7)
        got = (
            grouped_agg(
                rd.from_pandas(df), "g",
                {"v": ["sum", "min", "max", "count", "mean"],
                 "f": ["sum", "last"]},
                order_col="rid", num_parts=5,
            )
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        base = df.groupby("g")
        want = pd.DataFrame(
            {
                "v_sum": base["v"].sum(), "v_min": base["v"].min(),
                "v_max": base["v"].max(), "v_count": base["v"].count(),
                "v_mean": base["v"].sum() / base["v"].count(),
                "f_sum": base["f"].sum(),
                "f_last": df.loc[base["rid"].idxmax()].set_index("g")["f"],
            }
        ).reset_index().sort_values("g").reset_index(drop=True)
        for c in want.columns:
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
                rtol=1e-12, err_msg=c,
            )

    def test_multi_key(self, ray_session):
        from tsfeatures_ray.functions.grouped import grouped_agg

        df = _frame(2)
        df["g2"] = df["rid"] % 4
        got = grouped_agg(
            rd.from_pandas(df), ["g", "g2"], {"v": ["sum", "count"]}
        ).to_pandas()
        want = df.groupby(["g", "g2"])["v"].agg(["sum", "count"]).reset_index()
        got = got.sort_values(["g", "g2"]).reset_index(drop=True)
        want = want.sort_values(["g", "g2"]).reset_index(drop=True)
        assert (got["v_sum"].to_numpy() == want["sum"].to_numpy()).all()
        assert (got["v_count"].to_numpy() == want["count"].to_numpy()).all()

    def test_last_requires_order(self, ray_session):
        from tsfeatures_ray.functions.grouped import grouped_agg

        with pytest.raises(ValueError, match="order_col"):
            grouped_agg(rd.from_pandas(_frame(1)), "g", {"v": ["last"]})

    def test_unknown_agg(self, ray_session):
        from tsfeatures_ray.functions.grouped import grouped_agg

        with pytest.raises(ValueError, match="unknown agg"):
            grouped_agg(rd.from_pandas(_frame(1)), "g", {"v": ["median"]})


class TestPivotAgg:
    def _df(self, seed=0, n=800):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "u": rng.integers(0, 25, n),
                "t": rng.choice(["a", "b", "c", "zz"], n),
                "v": rng.normal(size=n).round(3),
            }
        )

    @pytest.mark.parametrize("agg", ["sum", "count", "min", "max"])
    def test_matches_pandas_pivot(self, ray_session, agg):
        from tsfeatures_ray.functions.grouped import pivot_agg

        df = self._df(3)
        got = (
            pivot_agg(rd.from_pandas(df), "u", "t", "v",
                      values=["a", "b", "c"], agg=agg, num_parts=4)
            .to_pandas().sort_values("u").reset_index(drop=True)
        )
        sub = df[df["t"].isin(["a", "b", "c"])]
        want = sub.pivot_table(index="u", columns="t", values="v",
                               aggfunc=agg, dropna=False)
        want = want.reindex(columns=["a", "b", "c"])
        if agg == "count":
            want = want.fillna(0).astype(np.int64)
        want.columns = [f"v_{c}" for c in want.columns]
        want = want.reset_index().sort_values("u").reset_index(drop=True)
        for c in ("v_a", "v_b", "v_c"):
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
                rtol=1e-9, equal_nan=True, err_msg=f"{agg}:{c}",
            )

    def test_unknown_values_dropped(self, ray_session):
        from tsfeatures_ray.functions.grouped import pivot_agg

        df = self._df(5)
        got = pivot_agg(rd.from_pandas(df), "u", "t", "v",
                        values=["a"]).to_pandas()
        assert list(got.columns) == ["u", "v_a"]

    def test_requires_values(self, ray_session):
        from tsfeatures_ray.functions.grouped import pivot_agg

        with pytest.raises(ValueError, match="values"):
            pivot_agg(rd.from_pandas(self._df(1)), "u", "t", "v", values=[])

    def test_block_without_matches(self, ray_session):
        from tsfeatures_ray.functions.grouped import pivot_agg

        # one block carries only unknown pivot values -> its partial is
        # an empty frame that must keep the shared schema
        a = pd.DataFrame({"u": [1, 2], "t": ["zz", "zz"], "v": [1.0, 2.0]})
        b = pd.DataFrame({"u": [1, 3], "t": ["a", "b"], "v": [5.0, 7.0]})
        ds = rd.from_pandas(a).union(rd.from_pandas(b))
        got = (
            pivot_agg(ds, "u", "t", "v", values=["a", "b"])
            .to_pandas().sort_values("u").reset_index(drop=True)
        )
        assert got["u"].tolist() == [1, 3]
        assert got["v_a"].tolist()[0] == 5.0
        assert got["v_b"].tolist()[1] == 7.0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


class TestAggProperties:
    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 10_000), n_keys=st.integers(1, 12),
           parts=st.integers(1, 8))
    def test_grouped_agg_randomized(self, ray_session, seed, n_keys, parts):
        from tsfeatures_ray.functions.grouped import grouped_agg

        df = _frame(seed, n=150, n_keys=n_keys)
        got = (
            grouped_agg(rd.from_pandas(df), "g",
                        {"v": ["sum", "count", "min", "max"]},
                        num_parts=parts)
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        want = df.groupby("g")["v"].agg(
            ["sum", "count", "min", "max"]).reset_index()
        want = want.sort_values("g").reset_index(drop=True)
        for a, b in (("v_sum", "sum"), ("v_count", "count"),
                     ("v_min", "min"), ("v_max", "max")):
            assert (got[a].to_numpy() == want[b].to_numpy()).all(), a

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 10_000), parts=st.integers(1, 6))
    def test_pivot_sum_randomized(self, ray_session, seed, parts):
        from tsfeatures_ray.functions.grouped import pivot_agg

        rng = np.random.default_rng(seed)
        df = pd.DataFrame({
            "u": rng.integers(0, 10, 200),
            "t": rng.choice(["a", "b", "c"], 200),
            "v": rng.integers(0, 100, 200).astype("int64"),
        })
        got = (
            pivot_agg(rd.from_pandas(df), "u", "t", "v",
                      values=["a", "b", "c"], num_parts=parts)
            .to_pandas().sort_values("u").reset_index(drop=True)
        )
        want = df.pivot_table(index="u", columns="t", values="v",
                              aggfunc="sum", dropna=False)
        want = want.reindex(columns=["a", "b", "c"])
        want.columns = [f"v_{c}" for c in want.columns]
        want = want.reset_index().sort_values("u").reset_index(drop=True)
        for c in ("v_a", "v_b", "v_c"):
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
                equal_nan=True, err_msg=c,
            )


class TestRollingCorr:
    def test_matches_per_window_brute(self, ray_session):
        """rolling_corr equals a brute per-window np.corrcoef with SQL's
        NULL gates (frame < 2 rows, constant column), at any partition
        count."""
        rng = np.random.default_rng(9)
        n = 400
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 9, n),
                "i": np.arange(n),
                "x": rng.integers(0, 6, n).astype(np.int64),  # ties/consts
                "y": rng.integers(0, 50, n).astype(np.float64),
            }
        )
        from tsfeatures_ray.functions import rolling_corr

        w = 4
        for parts in (1, 5):
            got = (
                rolling_corr(rd.from_pandas(df).repartition(parts),
                             key="g", order="i", x_col="x", y_col="y",
                             window=w)
                .to_pandas().sort_values(["g", "i"]).reset_index(drop=True)
            )
            want_c, want_n = [], []
            for _, sub in df.sort_values(["g", "i"]).groupby("g", sort=True):
                xv, yv = sub["x"].to_numpy(float), sub["y"].to_numpy(float)
                for j in range(len(sub)):
                    lo = max(0, j - w + 1)
                    xs, ys = xv[lo:j + 1], yv[lo:j + 1]
                    want_n.append(len(xs))
                    if len(xs) < 2 or xs.std() == 0 or ys.std() == 0:
                        want_c.append(np.nan)
                    else:
                        want_c.append(float(np.corrcoef(xs, ys)[0, 1]))
            assert got["n_w"].tolist() == want_n
            np.testing.assert_allclose(got["corr"], want_c, rtol=1e-9)


class TestLaggedCorr:
    def test_matches_per_key_brute(self, ray_session):
        """lagged_corr equals a brute per-key pairwise-complete CCF
        (NaN/None rows skipped per position, SQL constant/n<2 gates),
        at any partition count; every (key, lag) emits a row."""
        rng = np.random.default_rng(11)
        n = 400
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 11, n),
                "i": np.arange(n),
                "x": rng.integers(0, 6, n).astype(np.float64),
                "y": rng.integers(0, 50, n).astype(np.float64),
            }
        )
        # nulls on both sides (pairwise-complete semantics)
        df.loc[rng.choice(n, 40, replace=False), "x"] = np.nan
        df.loc[rng.choice(n, 40, replace=False), "y"] = np.nan
        # a constant-x key and a length-1 key
        df.loc[df["g"] == 3, "x"] = 7.0
        df = df[(df["g"] != 5) | (df["i"] == df.loc[df["g"] == 5, "i"].min())]
        from tsfeatures_ray.functions import lagged_corr

        lags = (0, 1, 3)
        for parts in (1, 6):
            got = (
                lagged_corr(rd.from_pandas(df).repartition(parts),
                            key="g", order="i", x_col="x", y_col="y",
                            lags=lags)
                .to_pandas().sort_values(["g", "lag"]).reset_index(drop=True)
            )
            rows = []
            for gk, sub in df.sort_values(["g", "i"]).groupby("g", sort=True):
                xv = sub["x"].to_numpy()
                yv = sub["y"].to_numpy()
                for k in sorted(lags):
                    xs = xv[: len(xv) - k] if k else xv
                    ys = yv[k:]
                    m = ~(np.isnan(xs) | np.isnan(ys))
                    xs, ys = xs[m], ys[m]
                    if len(xs) < 2 or xs.std() == 0 or ys.std() == 0:
                        c = np.nan
                    else:
                        c = float(np.corrcoef(xs, ys)[0, 1])
                    rows.append((gk, k, len(xs), c))
            want = pd.DataFrame(rows, columns=["g", "lag", "n_pairs", "corr"])
            assert got["g"].tolist() == want["g"].tolist()
            assert got["lag"].tolist() == want["lag"].tolist()
            assert got["n_pairs"].tolist() == want["n_pairs"].tolist()
            np.testing.assert_allclose(got["corr"], want["corr"], rtol=1e-9)

    def test_lag0_equals_grouped_corr_semantics(self, ray_session):
        """lag 0 is plain per-key Pearson correlation."""
        rng = np.random.default_rng(12)
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 5, 200),
                "i": np.arange(200),
                "x": rng.normal(size=200),
                "y": rng.normal(size=200),
            }
        )
        from tsfeatures_ray.functions import lagged_corr

        got = (
            lagged_corr(rd.from_pandas(df).repartition(3), key="g",
                        order="i", x_col="x", y_col="y", lags=[0])
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        want = (
            df.groupby("g")[["x", "y"]]
            .corr().iloc[0::2, -1].to_numpy()
        )
        np.testing.assert_allclose(got["corr"], want, rtol=1e-9)

    def test_rejects_negative_lag(self, ray_session):
        from tsfeatures_ray.functions import lagged_corr

        with pytest.raises(ValueError):
            lagged_corr(rd.from_items([{"g": 1, "i": 1, "x": 1.0, "y": 1.0}]),
                        key="g", order="i", x_col="x", y_col="y", lags=[-1])


class TestRollingZscore:
    def test_matches_per_row_brute(self, ray_session):
        """rolling_zscore equals a brute per-row prior-window
        mean/std_samp recompute with SQL's NULL gates (prior n<2,
        constant frame, null current value), at any partition count."""
        rng = np.random.default_rng(21)
        n = 500
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 9, n),
                "i": np.arange(n),
                "x": rng.integers(0, 20, n).astype(np.float64),
            }
        )
        df.loc[rng.choice(n, 50, replace=False), "x"] = np.nan
        df.loc[df["g"] == 2, "x"] = 5.0  # constant key -> all-NaN z
        from tsfeatures_ray.functions import rolling_zscore

        w = 6
        for parts in (1, 5):
            got = (
                rolling_zscore(rd.from_pandas(df).repartition(parts),
                               key="g", order="i", col="x", window=w,
                               threshold=1.5)
                .to_pandas().sort_values(["g", "i"]).reset_index(drop=True)
            )
            want_z, want_n, want_f = [], [], []
            for _, sub in df.sort_values(["g", "i"]).groupby("g", sort=True):
                xv = sub["x"].to_numpy()
                for j in range(len(sub)):
                    prior = xv[max(0, j - w):j]
                    prior = prior[~np.isnan(prior)]
                    want_n.append(len(prior))
                    if (len(prior) < 2 or prior.std(ddof=1) == 0
                            or np.isnan(xv[j])):
                        want_z.append(np.nan)
                        want_f.append(np.nan)
                    else:
                        z = (xv[j] - prior.mean()) / prior.std(ddof=1)
                        want_z.append(z)
                        want_f.append(float(abs(z) > 1.5))
            assert got["n_w"].tolist() == want_n
            np.testing.assert_allclose(got["z"], want_z, rtol=1e-9)
            np.testing.assert_allclose(got["is_anomaly"], want_f)

    def test_spike_detected_and_excluded_from_own_frame(self, ray_session):
        """A single large spike is flagged; because the frame is PRIOR
        rows only, the spike does not inflate the std used to judge
        itself (self-masking)."""
        x = np.full(30, 10.0)
        x += np.tile([0.0, 1.0, -1.0], 10)  # benign jitter
        x[20] = 100.0
        df = pd.DataFrame({"g": 0, "i": np.arange(30), "x": x})
        from tsfeatures_ray.functions import rolling_zscore

        got = (
            rolling_zscore(rd.from_pandas(df), key="g", order="i",
                           col="x", window=8, threshold=3.0)
            .to_pandas().sort_values("i").reset_index(drop=True)
        )
        assert got.loc[20, "is_anomaly"] == 1.0
        assert (got.loc[5:19, "is_anomaly"] == 0.0).all()

    def test_rejects_bad_window(self, ray_session):
        from tsfeatures_ray.functions import rolling_zscore

        with pytest.raises(ValueError):
            rolling_zscore(rd.from_items([{"g": 1, "i": 1, "x": 1.0}]),
                           key="g", order="i", col="x", window=0)


class TestSeasonalNaiveError:
    def test_matches_brute(self, ray_session):
        """seasonal_naive_error equals a brute per-key positional-LAG
        recompute (pairwise-complete, one-step-naive MASE denominator,
        NULL gates), at any partition count; short-series keys
        (length <= season) emit a row with n_fc=0 and NaN metrics."""
        rng = np.random.default_rng(41)
        n = 500
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 9, n),
                "i": np.arange(n),
                "x": rng.integers(0, 30, n).astype(np.float64),
            }
        )
        df.loc[rng.choice(n, 40, replace=False), "x"] = np.nan
        df.loc[df["g"] == 3, "x"] = 4.0  # constant: mase NaN (denom 0)
        # a key shorter than the season
        df = df[(df["g"] != 5) | (df["i"].isin(
            df.loc[df["g"] == 5, "i"].to_numpy()[:3]))]
        from tsfeatures_ray.functions import seasonal_naive_error

        m = 7
        for parts in (1, 6):
            got = (
                seasonal_naive_error(rd.from_pandas(df).repartition(parts),
                                     key="g", order="i", col="x", season=m)
                .to_pandas().sort_values("g").reset_index(drop=True)
            )
            rows = []
            for gk, sub in df.sort_values(["g", "i"]).groupby("g", sort=True):
                xv = sub["x"].to_numpy()

                def errs(k):
                    if len(xv) <= k:
                        return np.array([])
                    cur, prev = xv[k:], xv[:-k]
                    ok = ~(np.isnan(cur) | np.isnan(prev))
                    return np.abs(cur[ok] - prev[ok])

                e, e1 = errs(m), errs(1)
                mae = e.mean() if len(e) else np.nan
                rmse = np.sqrt((e * e).mean()) if len(e) else np.nan
                mase = (
                    mae / e1.mean()
                    if len(e) and len(e1) and e1.mean() > 0 else np.nan
                )
                rows.append((gk, len(e), mae, rmse, mase))
            want = pd.DataFrame(
                rows, columns=["g", "n_fc", "mae", "rmse", "mase"])
            assert got["g"].tolist() == want["g"].tolist()
            assert got["n_fc"].tolist() == want["n_fc"].tolist()
            for c in ("mae", "rmse", "mase"):
                np.testing.assert_allclose(got[c], want[c], rtol=1e-9,
                                           err_msg=c)

    def test_perfect_seasonality_zero_error(self, ray_session):
        """A perfectly periodic series has zero seasonal-naive error
        and mase 0 (the one-step naive still errs)."""
        x = np.tile([1.0, 5.0, 3.0, 9.0], 10)
        df = pd.DataFrame({"g": 0, "i": np.arange(40), "x": x})
        from tsfeatures_ray.functions import seasonal_naive_error

        got = seasonal_naive_error(rd.from_pandas(df), key="g", order="i",
                                   col="x", season=4).to_pandas()
        assert got.loc[0, "mae"] == 0.0
        assert got.loc[0, "rmse"] == 0.0
        assert got.loc[0, "mase"] == 0.0
        assert got.loc[0, "n_fc"] == 36

    def test_rejects_bad_season(self, ray_session):
        from tsfeatures_ray.functions import seasonal_naive_error

        with pytest.raises(ValueError):
            seasonal_naive_error(
                rd.from_items([{"g": 1, "i": 1, "x": 1.0}]),
                key="g", order="i", col="x", season=0)


class TestInterpolateGaps:
    def test_matches_brute(self, ray_session):
        """interpolate_gaps equals a brute per-key anchor scan: interior
        nulls lerp between nearest non-null anchors on the t axis,
        leading/trailing nulls stay NaN, non-null rows pass through,
        at any partition count (incl. irregular t spacing)."""
        rng = np.random.default_rng(61)
        n = 400
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 8, n),
                "i": np.arange(n),
                "t": np.sort(rng.choice(10_000, n, replace=False)).astype(
                    np.float64),
                "x": rng.integers(0, 50, n).astype(np.float64),
            }
        )
        df.loc[rng.choice(n, 120, replace=False), "x"] = np.nan
        df.loc[df["g"] == 2, "x"] = np.nan  # all-null key
        from tsfeatures_ray.functions import interpolate_gaps

        for parts in (1, 5):
            got = (
                interpolate_gaps(rd.from_pandas(df).repartition(parts),
                                 key="g", order="i", col="x", t_col="t")
                .to_pandas().sort_values(["g", "i"]).reset_index(drop=True)
            )
            want = []
            for _, sub in df.sort_values(["g", "i"]).groupby("g", sort=True):
                xv = sub["x"].to_numpy()
                tv = sub["t"].to_numpy()
                vp = np.flatnonzero(~np.isnan(xv))
                for j in range(len(sub)):
                    if not np.isnan(xv[j]):
                        want.append(xv[j])
                        continue
                    lo = vp[vp < j]
                    hi = vp[vp > j]
                    if len(lo) and len(hi):
                        p, q = lo[-1], hi[0]
                        want.append(
                            xv[p] + (xv[q] - xv[p])
                            * ((tv[j] - tv[p]) / (tv[q] - tv[p]))
                        )
                    else:
                        want.append(np.nan)
            np.testing.assert_allclose(got["x_interp"], want, rtol=1e-12)
            # originals pass through untouched
            base = df.sort_values(["g", "i"])["x"].to_numpy()
            np.testing.assert_array_equal(
                np.isnan(got["x_interp"].to_numpy()) & ~np.isnan(base),
                np.zeros(len(base), dtype=bool),
            )

    def test_midpoint_exact(self, ray_session):
        """A gap exactly halfway between integer anchors lerps to the
        exact midpoint."""
        df = pd.DataFrame(
            {"g": 0, "i": [0, 1, 2], "t": [0.0, 5.0, 10.0],
             "x": [10.0, np.nan, 20.0]}
        )
        from tsfeatures_ray.functions import interpolate_gaps

        got = interpolate_gaps(rd.from_pandas(df), key="g", order="i",
                               col="x", t_col="t").to_pandas()
        got = got.sort_values("i").reset_index(drop=True)
        assert got.loc[1, "x_interp"] == 15.0


def test_grouped_trimmed_mean_hand_and_brute(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.grouped import grouped_trimmed_mean

    # hand case: 10 values, trim 0.1 drops exactly min and max
    df = pd.DataFrame(
        {
            "g": ["a"] * 10,
            "v": [100.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, -50.0],
        }
    )
    got = grouped_trimmed_mean(
        rd.from_pandas(df), "g", "v"
    ).to_pandas()
    assert got.loc[0, "n"] == 10 and got.loc[0, "n_trimmed"] == 8
    assert got.loc[0, "trimmed_mean"] == 4.5  # mean of 1..8
    # brute parity on random groups (ties included via rounding)
    rng = np.random.RandomState(91)
    big = pd.DataFrame(
        {
            "g": rng.choice(list("xyz"), 900),
            "v": np.round(rng.gamma(2, 20, 900), 1),
        }
    )
    out = grouped_trimmed_mean(
        rd.from_pandas(big), "g", "v", trim=0.2
    ).to_pandas().set_index("g")
    for g, gg in big.groupby("g"):
        c = np.sort(np.rint(gg["v"].to_numpy() * 100).astype(np.int64))
        cut = int(np.floor(0.2 * len(c)))
        want = c[cut: len(c) - cut].sum() / (100 * (len(c) - 2 * cut))
        assert out.loc[g, "trimmed_mean"] == pytest.approx(want, abs=2e-6)
    from tsfeatures_ray.functions.grouped import grouped_trimmed_mean as f

    with pytest.raises(ValueError):
        f(None, "g", "v", trim=0.5)
