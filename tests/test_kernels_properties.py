"""Property / degradation tests for the kernel library, mirroring the
reference's semantic tests (tests/test_small_ts.py, test_mutability.py,
test_sparsity.py, test_statistics.py) plus Arrow-immutability guards."""

import numpy as np
import pytest

from tsfeatures_ray.kernels import (
    ALL_FEATURES,
    DEFAULT_FEATURES,
    compute_features,
    scalets,
)
from tsfeatures_ray.kernels.golden import USAccDeaths, WWWusage
from tsfeatures_ray.kernels.stl import stl_decompose, stl_features

ALL = list(ALL_FEATURES.values())


@pytest.mark.parametrize("n", [1, 2])
def test_small_series_degrade_to_nan_not_crash(n):
    # reference tests/test_small_ts.py:13-36 - every kernel must run on
    # n=1 and n=2 without raising
    z = np.zeros(n)
    z[-1] = 1
    out = compute_features(z, 12, features=ALL, scale=False)
    assert isinstance(out, dict) and len(out) > 10


def test_feature_order_invariance():
    # reference tests/test_mutability.py:12-30 - same values regardless
    # of feature order (guards in-place input mutation)
    z = np.zeros(100)
    z[-1] = 1
    feats_a = [ALL_FEATURES["sparsity"]] + [f for f in DEFAULT_FEATURES]
    feats_b = [f for f in DEFAULT_FEATURES] + [ALL_FEATURES["sparsity"]]
    out_a = compute_features(z, 7, features=feats_a, scale=False)
    out_b = compute_features(z, 7, features=feats_b, scale=False)
    assert set(out_a) == set(out_b)
    for k in out_a:
        va, vb = out_a[k], out_b[k]
        assert (np.isnan(va) and np.isnan(vb)) or va == pytest.approx(vb)


def test_kernels_do_not_mutate_input():
    # Arrow buffers are immutable; kernels must never write their input.
    z = np.linspace(-1, 3, 60)
    z[7] = 0.0
    for f in ALL:
        arr = z.copy()
        arr.setflags(write=False)  # simulate a zero-copy Arrow view
        f(arr, 7)  # must not raise ValueError: assignment destination...
        assert np.array_equal(arr, z), f.__name__


def test_sparsity_scale_interaction():
    # reference tests/test_sparsity.py:8-24
    z = np.zeros(10)
    z[-1] = 1
    raw = compute_features(z, 7, features=[ALL_FEATURES["sparsity"]], scale=False)
    scaled = compute_features(z, 7, features=[ALL_FEATURES["sparsity"]], scale=True)
    assert raw["sparsity"] == pytest.approx(0.9)
    assert scaled["sparsity"] == 0.0


def test_statistics_scale_smoke():
    # reference tests/test_statistics.py
    z = np.zeros(10)
    z[-1] = 1
    for scale in (True, False):
        out = compute_features(z, 7, features=[ALL_FEATURES["statistics"]], scale=scale)
        assert len(out) == 12


def test_scalets():
    x = np.array(WWWusage, dtype=float)
    s = scalets(x)
    assert s.mean() == pytest.approx(0.0, abs=1e-12)
    assert s.std(ddof=1) == pytest.approx(1.0)


def test_stl_decomposition_identity_and_bounds():
    x = np.array(USAccDeaths, dtype=float)
    trend, seas, resid = stl_decompose(x, 12, 13)
    np.testing.assert_allclose(trend + seas + resid, x, rtol=0, atol=1e-8)
    out = stl_features(scalets(x), 12)
    assert 0.0 <= out["trend"] <= 1.0
    assert 0.0 <= out["seasonal_strength"] <= 1.0
    assert out["seasonal_strength"] > 0.5  # USAccDeaths is strongly seasonal
    assert 1 <= out["peak"] <= 12 and 1 <= out["trough"] <= 12
    assert out["nperiods"] == 1.0 and out["seasonal_period"] == 12.0


def test_stl_nonseasonal_supersmoother_path():
    x = scalets(np.array(WWWusage, dtype=float))
    out = stl_features(x, 1)
    assert out["nperiods"] == 0.0
    assert "seasonal_strength" not in out
    assert 0.0 <= out["trend"] <= 1.0
    assert out["trend"] > 0.9  # WWWusage is dominated by its trend


def test_stl_constant_series_trend_zero():
    # variance-guard path (reference tsfeatures.py:734-737)
    x = np.ones(48)
    out = stl_features(x, 12)
    assert out["trend"] == 0.0


def test_heterogeneity_reasonable():
    out = ALL_FEATURES["heterogeneity"](scalets(np.array(USAccDeaths, float)), 12)
    assert set(out) == {"arch_acf", "garch_acf", "arch_r2", "garch_r2"}
    assert np.isfinite(out["arch_acf"])
    assert 0 <= out["arch_r2"] <= 1


def test_hurst_known_behavior():
    # trending series -> high hurst; WWWusage measured ~0.998 by the
    # reference implementation (R/Python agree to ~0.05 per README)
    out = ALL_FEATURES["hurst"](np.array(WWWusage, dtype=float), 1)
    assert 0.9 < out["hurst"] <= 1.05


def test_default_output_width():
    # default set (reference tsfeatures.py:932-937): 42 features for
    # seasonal series (7 acf + 1 arch + 1 crossing + 1 entropy + 1 flat +
    # 4 het + 2 holt + 1 lump + 1 nonlin + 4 pacf + 11 stl + 1 stab +
    # 3 hw + 1 kpss + 1 pp + 1 len + 1 hurst), 37 for non-seasonal
    x = scalets(np.array(USAccDeaths, dtype=float))
    assert len(compute_features(x, 12, scale=False)) == 42
    y = scalets(np.array(WWWusage, dtype=float))
    assert len(compute_features(y, 1, scale=False)) == 37
