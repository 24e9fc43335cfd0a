"""asof_join / range_join: distributed results must equal single-frame
pandas re-derivations (merge_asof / brute inequality join) on randomized
panels, including keys missing from either side, ties, and empties."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tsfeatures_ray.functions import asof_join, range_join


def _mk(seed=0, n_left=400, n_right=300, n_keys=13):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us")
    left = pd.DataFrame(
        {
            "l_id": np.arange(n_left),
            "ts": base + rng.integers(0, 3_600_000_000, n_left).astype("timedelta64[us]"),
            "uid": rng.integers(0, n_keys, n_left),
            "lv": rng.normal(size=n_left),
        }
    )
    right = pd.DataFrame(
        {
            "r_id": np.arange(n_right),
            "rts": base + rng.integers(0, 3_600_000_000, n_right).astype("timedelta64[us]"),
            # disjoint key tail: some right keys never occur on the left
            "ruid": rng.integers(0, n_keys + 4, n_right),
            "rv": rng.integers(0, 1000, n_right),
        }
    )
    # de-dup (key, ts) on the right so backward-asof ties are impossible
    right = right.drop_duplicates(["ruid", "rts"]).reset_index(drop=True)
    return left, right


class TestAsofJoin:
    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_matches_merge_asof(self, ray_session, direction):
        left, right = _mk(3)
        got = (
            asof_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="ts", by="uid", right_on="rts", right_by="ruid",
                direction=direction, num_parts=5,
            )
            .to_pandas()
            .sort_values("l_id")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("rts"),
            left_on="ts", right_on="rts", left_by="uid", right_by="ruid",
            direction=direction,
        ).sort_values("l_id").reset_index(drop=True)
        for c in ("r_id", "rv"):
            want[c] = want[c].astype(np.float64)
        want["ruid"] = want["ruid"].astype(np.float64)
        pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)

    def test_tolerance(self, ray_session):
        left, right = _mk(7)
        tol = pd.Timedelta(minutes=5)
        got = (
            asof_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="ts", by="uid", right_on="rts", right_by="ruid",
                tolerance=tol, num_parts=4,
            )
            .to_pandas().sort_values("l_id").reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("rts"),
            left_on="ts", right_on="rts", left_by="uid", right_by="ruid",
            tolerance=tol,
        ).sort_values("l_id").reset_index(drop=True)
        assert got["r_id"].isna().equals(want["r_id"].isna())
        m = ~want["r_id"].isna()
        assert (got.loc[m, "r_id"].to_numpy()
                == want.loc[m, "r_id"].to_numpy()).all()

    def test_empty_right(self, ray_session):
        left, right = _mk(1)
        got = asof_join(
            rd.from_pandas(left), rd.from_pandas(right.iloc[:0]),
            on="ts", by="uid", right_on="rts", right_by="ruid",
        ).to_pandas()
        assert len(got) == len(left)
        assert got["r_id"].isna().all()

    def test_overlapping_names_raise(self, ray_session):
        left, right = _mk(1)
        with pytest.raises(ValueError, match="overlapping"):
            asof_join(
                rd.from_pandas(left), rd.from_pandas(left),
                on="ts", by="uid", right_on="ts", right_by="uid",
            )


class TestRangeJoin:
    def test_matches_brute(self, ray_session):
        left, right = _mk(11)
        lo, hi = pd.Timedelta(minutes=-10), pd.Timedelta(minutes=2)
        got = (
            range_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="ts", by="uid", right_on="rts", right_by="ruid",
                lo=lo, hi=hi, num_parts=6,
            )
            .to_pandas()
            .sort_values(["l_id", "r_id"])
            .reset_index(drop=True)
        )
        brute = left.merge(right, left_on="uid", right_on="ruid")
        brute = brute[
            (brute["rts"] >= brute["ts"] + lo) & (brute["rts"] <= brute["ts"] + hi)
        ].sort_values(["l_id", "r_id"]).reset_index(drop=True)
        assert len(got) == len(brute)
        assert (got["l_id"].to_numpy() == brute["l_id"].to_numpy()).all()
        assert (got["r_id"].to_numpy() == brute["r_id"].to_numpy()).all()
        assert (got["rv"].to_numpy() == brute["rv"].to_numpy()).all()

    def test_numeric_axis(self, ray_session):
        rng = np.random.default_rng(5)
        left = pd.DataFrame({"l_id": np.arange(50), "x": rng.integers(0, 100, 50),
                             "k": rng.integers(0, 4, 50)})
        right = pd.DataFrame({"r_id": np.arange(60), "rx": rng.integers(0, 100, 60),
                              "rk": rng.integers(0, 4, 60)})
        got = (
            range_join(rd.from_pandas(left), rd.from_pandas(right),
                       on="x", by="k", right_on="rx", right_by="rk",
                       lo=-5, hi=5, num_parts=3)
            .to_pandas().sort_values(["l_id", "r_id"]).reset_index(drop=True)
        )
        brute = left.merge(right, left_on="k", right_on="rk")
        brute = brute[(brute["rx"] - brute["x"]).abs() <= 5]
        assert len(got) == len(brute)

    def test_no_matches(self, ray_session):
        left, right = _mk(2)
        got = range_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="ts", by="uid", right_on="rts", right_by="ruid",
            lo=pd.Timedelta(days=400), hi=pd.Timedelta(days=401),
        ).to_pandas()
        assert len(got) == 0

    def test_bad_bounds_raise(self, ray_session):
        left, right = _mk(2)
        with pytest.raises(ValueError, match="lo must be"):
            range_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="ts", by="uid", right_on="rts", right_by="ruid",
                lo=pd.Timedelta(0), hi=pd.Timedelta(minutes=-1),
            )


class TestIntervalJoin:
    def _mk_intervals(self, seed=0, n_left=300, n_right=80, n_keys=9):
        rng = np.random.default_rng(seed)
        base = np.datetime64("2024-01-01", "us")
        left = pd.DataFrame(
            {
                "l_id": np.arange(n_left),
                "ts": base + rng.integers(0, 7_200_000_000, n_left).astype("timedelta64[us]"),
                "uid": rng.integers(0, n_keys, n_left),
            }
        )
        lo = rng.integers(0, 6_000_000_000, n_right)
        ln = rng.integers(1, 2_400_000_000, n_right)  # overlapping intervals
        right = pd.DataFrame(
            {
                "r_id": np.arange(n_right),
                "lo": base + lo.astype("timedelta64[us]"),
                "hi": base + (lo + ln).astype("timedelta64[us]"),
                "ruid": rng.integers(0, n_keys + 2, n_right),
            }
        )
        return left, right

    @pytest.mark.parametrize("band_min", [7, 60, 240])
    def test_matches_brute(self, ray_session, band_min):
        from tsfeatures_ray.functions import interval_join

        left, right = self._mk_intervals(21)
        got = (
            interval_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="ts", by="uid", right_lo="lo", right_hi="hi",
                right_by="ruid", band=pd.Timedelta(minutes=band_min),
                num_parts=5,
            )
            .to_pandas().sort_values(["l_id", "r_id"]).reset_index(drop=True)
        )
        brute = left.merge(right, left_on="uid", right_on="ruid")
        brute = brute[(brute["lo"] <= brute["ts"]) & (brute["ts"] <= brute["hi"])]
        brute = brute.sort_values(["l_id", "r_id"]).reset_index(drop=True)
        assert len(got) == len(brute)
        assert (got["l_id"].to_numpy() == brute["l_id"].to_numpy()).all()
        assert (got["r_id"].to_numpy() == brute["r_id"].to_numpy()).all()

    def test_max_bands_guard(self, ray_session):
        from tsfeatures_ray.functions import interval_join

        left, right = self._mk_intervals(2)
        with pytest.raises(Exception, match="max_bands"):
            interval_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="ts", by="uid", right_lo="lo", right_hi="hi",
                right_by="ruid", band=pd.Timedelta(milliseconds=1),
                max_bands=100,
            ).to_pandas()

    def test_no_matching_keys(self, ray_session):
        from tsfeatures_ray.functions import interval_join

        left, right = self._mk_intervals(3)
        right["ruid"] = right["ruid"] + 1000
        got = interval_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="ts", by="uid", right_lo="lo", right_hi="hi", right_by="ruid",
        ).to_pandas()
        assert len(got) == 0


from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st


class TestTemporalJoinProperties:
    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 10_000), n_keys=st.integers(1, 8))
    def test_asof_matches_merge_asof_randomized(self, ray_session, seed, n_keys):
        left, right = _mk(seed, n_left=120, n_right=90, n_keys=n_keys)
        got = (
            asof_join(rd.from_pandas(left), rd.from_pandas(right),
                      on="ts", by="uid", right_on="rts", right_by="ruid",
                      num_parts=3)
            .to_pandas().sort_values("l_id").reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("rts"),
            left_on="ts", right_on="rts", left_by="uid", right_by="ruid",
        ).sort_values("l_id").reset_index(drop=True)
        assert got["r_id"].isna().equals(want["r_id"].isna())
        m = ~want["r_id"].isna()
        assert (got.loc[m, "r_id"].to_numpy()
                == want.loc[m, "r_id"].to_numpy()).all()

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 10_000), mins=st.integers(1, 90))
    def test_range_matches_brute_randomized(self, ray_session, seed, mins):
        left, right = _mk(seed, n_left=100, n_right=80, n_keys=5)
        lo, hi = pd.Timedelta(minutes=-mins), pd.Timedelta(minutes=mins // 2)
        got = (
            range_join(rd.from_pandas(left), rd.from_pandas(right),
                       on="ts", by="uid", right_on="rts", right_by="ruid",
                       lo=lo, hi=hi, num_parts=3)
            .to_pandas()
        )
        brute = left.merge(right, left_on="uid", right_on="ruid")
        brute = brute[(brute["rts"] >= brute["ts"] + lo)
                      & (brute["rts"] <= brute["ts"] + hi)]
        assert len(got) == len(brute)
        assert set(zip(got["l_id"], got["r_id"])) == set(
            zip(brute["l_id"], brute["r_id"])
        )


class TestIntervalJoinSkewedBucket:
    def test_hot_key_wide_band_matches_brute(self, ray_session):
        """One hot (key, band) bucket holding ~10k points x ~1.5k
        intervals: the round-4 chunked sorted-stab path must return the
        exact brute pairs WITHOUT the old O(points x intervals) dense
        allocation (chunks are 4096 points; candidates pruned by lo/hi
        range per chunk). Also crosses several chunk boundaries."""
        from tsfeatures_ray.functions import interval_join

        rng = np.random.default_rng(5)
        base = np.datetime64("2024-01-01", "us")
        n_pts, n_iv = 10_000, 1_500
        # everything on ONE key inside ONE band (band = 1 day)
        left = pd.DataFrame(
            {
                "l_id": np.arange(n_pts),
                "ts": base + rng.integers(0, 3_600_000_000, n_pts)
                .astype("timedelta64[us]"),
                "uid": np.zeros(n_pts, dtype=np.int64),
            }
        )
        lo = rng.integers(0, 3_000_000_000, n_iv)
        ln = rng.integers(1, 600_000_000, n_iv)
        right = pd.DataFrame(
            {
                "r_id": np.arange(n_iv),
                "lo": base + lo.astype("timedelta64[us]"),
                "hi": base + (lo + ln).astype("timedelta64[us]"),
                "ruid": np.zeros(n_iv, dtype=np.int64),
            }
        )
        got = (
            interval_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="ts", by="uid", right_lo="lo", right_hi="hi",
                right_by="ruid", band=pd.Timedelta(days=1), num_parts=3,
            )
            .to_pandas().sort_values(["l_id", "r_id"]).reset_index(drop=True)
        )
        brute = left.merge(right, left_on="uid", right_on="ruid")
        brute = brute[(brute["lo"] <= brute["ts"]) & (brute["ts"] <= brute["hi"])]
        brute = brute.sort_values(["l_id", "r_id"]).reset_index(drop=True)
        assert len(got) == len(brute) and len(got) > 100_000
        assert (got["l_id"].to_numpy() == brute["l_id"].to_numpy()).all()
        assert (got["r_id"].to_numpy() == brute["r_id"].to_numpy()).all()


def test_asof_join_nearest(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.temporal_join import asof_join

    base = np.datetime64("2024-01-01T00:00:00", "us")
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "t": [base + np.timedelta64(m, "m") for m in (10, 29, 90, 5)],
            "lv": [1.0, 2.0, 3.0, 4.0],
        }
    )
    right = pd.DataFrame(
        {
            "rk": [1, 1, 2],
            "rt": [base + np.timedelta64(m, "m") for m in (0, 30, 60)],
            "rv": [100.0, 200.0, 300.0],
        }
    )
    got = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="t", by="k", right_on="rt", right_by="rk",
            direction="nearest",
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("t"), right.sort_values("rt"),
            left_on="t", right_on="rt", left_by="k", right_by="rk",
            direction="nearest",
        )
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert list(got["rv"]) == list(want["rv"])
    # t=10 -> nearest is rt=0 (10 vs 20 away); t=29 -> rt=30; t=90 -> rt=30;
    # k=2 t=5 -> only future rt=60 exists: nearest still matches FORWARD
    assert list(got["rv"]) == [100.0, 200.0, 200.0, 300.0]
