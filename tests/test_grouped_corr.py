"""grouped_corr: the distributed Chan-merge Pearson correlation must
equal a single-frame pandas re-derivation (pairwise-complete,
sample moments), including NULL-gate edge cases and regardless of how
rows split across batches/partitions."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tsfeatures_ray.functions import grouped_corr


def _panel(seed=0, n=2000, n_keys=23):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, n_keys, n)
    x = rng.normal(50.0, 5.0, n)
    # y correlated with x, large offset mean (the microsecond-latency
    # conditioning case the centered-moment design exists for)
    y = 3.6e9 + 40.0 * x + rng.normal(0.0, 100.0, n)
    y[rng.random(n) < 0.08] = np.nan  # incomplete pairs
    return pd.DataFrame({"g": g, "x": x, "y": y})


def _oracle(df):
    rows = []
    for k, sub in df.groupby("g", sort=True):
        m = sub.dropna(subset=["x", "y"])
        n = len(m)
        if n >= 2 and m["x"].var(ddof=1) > 0 and m["y"].var(ddof=1) > 0:
            c = float(np.corrcoef(m["x"], m["y"])[0, 1])
        else:
            c = np.nan
        rows.append({"g": k, "n_pairs": n, "corr": c})
    return pd.DataFrame(rows)


class TestGroupedCorr:
    def test_matches_pandas(self, ray_session):
        df = _panel(1)
        got = (
            grouped_corr(rd.from_pandas(df).repartition(7), "g", "x", "y")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        want = _oracle(df)
        assert got["n_pairs"].tolist() == want["n_pairs"].tolist()
        np.testing.assert_allclose(got["corr"], want["corr"], rtol=1e-9)
        assert got["n_pairs"].dtype == np.int64

    def test_batch_split_invariance(self, ray_session):
        """Moment merges across many tiny batches must be exact: run
        the same frame at 1 partition and at 16, compare bitwise-ish."""
        df = _panel(2, n=800, n_keys=5)
        a = (
            grouped_corr(rd.from_pandas(df).repartition(1), "g", "x", "y")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        b = (
            grouped_corr(rd.from_pandas(df).repartition(16), "g", "x", "y")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        assert a["n_pairs"].tolist() == b["n_pairs"].tolist()
        np.testing.assert_allclose(a["corr"], b["corr"], rtol=1e-12)

    def test_null_gates(self, ray_session):
        """n<2, zero variance, and all-incomplete groups emit NaN corr
        but still emit a row (SQL GROUP BY semantics)."""
        df = pd.DataFrame(
            {
                "g": ["one", "one", "const", "const", "const",
                      "solo", "allnan", "allnan", "anti", "anti", "anti"],
                "x": [1.0, 2.0, 5.0, 5.0, 5.0, 9.0, 1.0, 2.0, 1.0, 2.0, 3.0],
                "y": [10.0, np.nan, 1.0, 2.0, 3.0, 4.0,
                      np.nan, np.nan, 3.0, 2.0, 1.0],
            }
        )
        got = (
            grouped_corr(rd.from_pandas(df).repartition(3), "g", "x", "y")
            .to_pandas().set_index("g")
        )
        assert set(got.index) == {"one", "const", "solo", "allnan", "anti"}
        assert got.loc["one", "n_pairs"] == 1 and np.isnan(got.loc["one", "corr"])
        assert got.loc["const", "n_pairs"] == 3 and np.isnan(got.loc["const", "corr"])
        assert got.loc["solo", "n_pairs"] == 1 and np.isnan(got.loc["solo", "corr"])
        assert got.loc["allnan", "n_pairs"] == 0 and np.isnan(got.loc["allnan", "corr"])
        np.testing.assert_allclose(got.loc["anti", "corr"], -1.0, rtol=1e-12)
        assert got.loc["anti", "n_pairs"] == 3

class TestGroupedRegr:
    def test_matches_lstsq(self, ray_session):
        """grouped_regr equals per-group np.polyfit on complete pairs,
        under the large-offset-mean conditioning the Chan merge exists
        for."""
        from tsfeatures_ray.functions import grouped_regr

        df = _panel(3)
        got = (
            grouped_regr(rd.from_pandas(df).repartition(7), "g", "y", "x")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        rows = []
        for k, sub in df.groupby("g", sort=True):
            m = sub.dropna(subset=["x", "y"])
            xs, ys = m["y"].to_numpy(), m["x"].to_numpy()  # x_col=y, y_col=x
            slope, icept = np.polyfit(xs, ys, 1)
            r = np.corrcoef(xs, ys)[0, 1]
            rows.append({"g": k, "n_pairs": len(m), "slope": slope,
                         "intercept": icept, "r2": r * r})
        want = pd.DataFrame(rows)
        assert got["n_pairs"].tolist() == want["n_pairs"].tolist()
        np.testing.assert_allclose(got["slope"], want["slope"], rtol=1e-7)
        np.testing.assert_allclose(got["intercept"], want["intercept"],
                                   rtol=1e-7)
        np.testing.assert_allclose(got["r2"], want["r2"], rtol=1e-7)

    def test_duckdb_edge_semantics(self, ray_session):
        """Edge gates mirror the probed DuckDB regr_* behavior: constant
        x -> all NULL; constant y (x varying) -> slope 0 / r2 1; single
        row and all-incomplete -> NULL stats but a row still emitted."""
        from tsfeatures_ray.functions import grouped_regr

        df = pd.DataFrame(
            {
                "g": ["n", "n", "n", "cx", "cx", "cy", "cy",
                      "solo", "nan", "nan"],
                "x": [1.0, 2.0, 3.0, 5.0, 5.0, 1.0, 2.0, 1.0, 1.0, 2.0],
                "y": [2.0, 4.5, 6.0, 1.0, 2.0, 7.0, 7.0, 1.0,
                      np.nan, np.nan],
            }
        )
        got = (
            grouped_regr(rd.from_pandas(df).repartition(3), "g", "x", "y")
            .to_pandas().set_index("g")
        )
        np.testing.assert_allclose(got.loc["n", "slope"], 2.0, rtol=1e-12)
        np.testing.assert_allclose(got.loc["n", "intercept"], 1.0 / 6.0,
                                   rtol=1e-12)
        np.testing.assert_allclose(got.loc["n", "r2"], 0.9795918367346939,
                                   rtol=1e-12)
        for c in ("slope", "intercept", "r2"):
            assert np.isnan(got.loc["cx", c])
            assert np.isnan(got.loc["solo", c])
            assert np.isnan(got.loc["nan", c])
        assert got.loc["cy", "slope"] == 0.0
        assert got.loc["cy", "intercept"] == 7.0
        assert got.loc["cy", "r2"] == 1.0
        assert got.loc["nan", "n_pairs"] == 0

    def test_partition_invariance(self, ray_session):
        from tsfeatures_ray.functions import grouped_regr

        df = _panel(4, n=800, n_keys=5)
        a = (
            grouped_regr(rd.from_pandas(df).repartition(1), "g", "x", "y")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        b = (
            grouped_regr(rd.from_pandas(df).repartition(16), "g", "x", "y")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        assert a["n_pairs"].tolist() == b["n_pairs"].tolist()
        for c in ("slope", "intercept", "r2"):
            np.testing.assert_allclose(a[c], b[c], rtol=1e-9)


class TestGroupedQuantiles:
    def test_matches_pandas_linear(self, ray_session):
        """grouped_quantiles equals single-frame pandas groupby
        quantile (linear interpolation), incl. all-null groups, at any
        partition count."""
        from tsfeatures_ray.functions import grouped_quantiles

        rng = np.random.default_rng(51)
        n = 600
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 11, n),
                "v": np.round(rng.normal(50, 20, n), 2),
            }
        )
        df.loc[rng.choice(n, 50, replace=False), "v"] = np.nan
        df.loc[df["g"] == 7, "v"] = np.nan  # all-null group
        for parts in (1, 6):
            got = (
                grouped_quantiles(rd.from_pandas(df).repartition(parts),
                                  "g", "v", qs=(0.25, 0.5, 0.9))
                .to_pandas().sort_values("g").reset_index(drop=True)
            )
            base = df.groupby("g")["v"]
            want_n = base.count().astype(np.int64)
            assert got["n"].tolist() == want_n.tolist()
            for q, name in ((0.25, "q25"), (0.5, "q50"), (0.9, "q90")):
                np.testing.assert_allclose(
                    got[name],
                    base.quantile(q, interpolation="linear").to_numpy(),
                    rtol=1e-12, err_msg=name,
                )

    def test_rejects_bad_qs(self, ray_session):
        from tsfeatures_ray.functions import grouped_quantiles

        ds = rd.from_items([{"g": 1, "v": 1.0}])
        with pytest.raises(ValueError):
            grouped_quantiles(ds, "g", "v", qs=())
        with pytest.raises(ValueError):
            grouped_quantiles(ds, "g", "v", qs=(1.5,))
        with pytest.raises(ValueError):
            grouped_quantiles(ds, "g", "v", qs=(0.251, 0.252))


class TestWinsorize:
    def test_matches_pandas(self, ray_session):
        """winsorize equals single-frame pandas clip at per-group
        quantile_cont thresholds; nulls pass through; unclipped values
        are bit-identical to the input."""
        from tsfeatures_ray.functions import winsorize

        rng = np.random.default_rng(71)
        n = 500
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 7, n),
                "rid": np.arange(n),
                "v": np.round(rng.normal(0, 100, n), 2),
            }
        )
        df.loc[rng.choice(n, 30, replace=False), "v"] = np.nan
        for parts in (1, 5):
            got = (
                winsorize(rd.from_pandas(df).repartition(parts), "g", "v",
                          lo=0.1, hi=0.9)
                .to_pandas().sort_values("rid").reset_index(drop=True)
            )
            base = df.sort_values("rid").reset_index(drop=True)
            ql = base.groupby("g")["v"].transform(lambda s: s.quantile(0.1))
            qh = base.groupby("g")["v"].transform(lambda s: s.quantile(0.9))
            want = base["v"].clip(ql, qh)
            np.testing.assert_allclose(got["v_wins"], want, rtol=0,
                                       atol=0, equal_nan=True)
            # untouched interior values are BIT-identical
            inner = (base["v"] > ql) & (base["v"] < qh)
            assert (got.loc[inner.to_numpy(), "v_wins"].to_numpy()
                    == base.loc[inner, "v"].to_numpy()).all()

    def test_rejects_bad_bounds(self, ray_session):
        from tsfeatures_ray.functions import winsorize

        ds = rd.from_items([{"g": 1, "v": 1.0}])
        with pytest.raises(ValueError):
            winsorize(ds, "g", "v", lo=0.9, hi=0.1)
