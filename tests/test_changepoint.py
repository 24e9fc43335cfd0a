"""cusum_changepoint: distributed max-|S| mean-shift scan must equal a
brute per-key recompute (earliest-argmax tie-break, SQL NULL gates),
detect a planted step shift at the right location, and be invariant to
partitioning."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tsfeatures_ray.functions import cusum_changepoint


def _brute(df):
    rows = []
    for k, sub in df.sort_values(["g", "i"]).groupby("g", sort=True):
        xv = sub["x"].to_numpy()
        iv = sub["i"].to_numpy()
        m = ~np.isnan(xv)
        xv, iv = xv[m], iv[m]
        n = len(xv)
        if n == 0:
            continue
        s = np.cumsum(xv - xv.mean())
        a = np.abs(s)
        j = int(np.argmax(a))  # numpy argmax takes the first max
        sd = xv.std(ddof=1) if n >= 2 else np.nan
        stat = a[j] / (sd * np.sqrt(n)) if n >= 2 and sd > 0 else np.nan
        rows.append({"g": k, "n": n, "cp_i": iv[j], "cusum_stat": stat})
    return pd.DataFrame(rows)


class TestCusumChangepoint:
    def test_matches_brute(self, ray_session):
        rng = np.random.default_rng(31)
        n = 600
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 13, n),
                "i": np.arange(n),
                "x": rng.integers(0, 40, n).astype(np.float64),
            }
        )
        df.loc[rng.choice(n, 40, replace=False), "x"] = np.nan
        df.loc[df["g"] == 4, "x"] = 9.0  # constant key: stat NaN, ties
        for parts in (1, 6):
            got = (
                cusum_changepoint(rd.from_pandas(df).repartition(parts),
                                  key="g", order="i", col="x")
                .to_pandas().sort_values("g").reset_index(drop=True)
            )
            want = _brute(df)
            assert got["g"].tolist() == want["g"].tolist()
            assert got["n"].tolist() == want["n"].tolist()
            assert got["cp_i"].tolist() == want["cp_i"].tolist()
            np.testing.assert_allclose(got["cusum_stat"], want["cusum_stat"],
                                       rtol=1e-9)

    def test_step_shift_located(self, ray_session):
        """A mean shift at position 40 of 80 puts max |S| exactly at the
        last pre-shift index (the CUSUM V-shape vertex)."""
        x = np.r_[np.full(40, 10.0), np.full(40, 14.0)]
        rng = np.random.default_rng(7)
        x += rng.integers(-1, 2, 80)  # small integer jitter
        df = pd.DataFrame({"g": 0, "i": np.arange(80), "x": x})
        got = (
            cusum_changepoint(rd.from_pandas(df), key="g", order="i",
                              col="x")
            .to_pandas()
        )
        assert abs(int(got.loc[0, "cp_i"]) - 39) <= 2
        assert got.loc[0, "cusum_stat"] > 1.0  # strong shift signal

    def test_constant_series_earliest_tie(self, ray_session):
        """Constant series: every |S| is exactly 0, the earliest order
        value wins, and the statistic is NaN (zero variance)."""
        df = pd.DataFrame({"g": "c", "i": [3, 1, 2], "x": [5.0, 5.0, 5.0]})
        got = cusum_changepoint(rd.from_pandas(df), key="g", order="i",
                                col="x").to_pandas()
        assert int(got.loc[0, "cp_i"]) == 1
        assert np.isnan(got.loc[0, "cusum_stat"])
        assert got.loc[0, "n"] == 3

    def test_all_null_key_emits_nothing(self, ray_session):
        df = pd.DataFrame(
            {"g": ["a", "a", "b"], "i": [1, 2, 1],
             "x": [1.0, 2.0, np.nan]}
        )
        got = cusum_changepoint(rd.from_pandas(df), key="g", order="i",
                                col="x").to_pandas()
        assert set(got["g"]) == {"a"}
