"""Golden-value kernel conformance, replicating the reference's own unit
tests at their tolerances (reference tsfeatures/tests/test_acf_features.py,
test_arch_stat.py, test_holt_parameters.py, test_pacf_features.py)."""

from math import isclose

import numpy as np

from tsfeatures_ray.kernels import (
    acf_features,
    arch_stat,
    holt_parameters,
    pacf_features,
)
from tsfeatures_ray.kernels.golden import USAccDeaths, WWWusage


def test_acf_features_seasonal():
    z = acf_features(np.array(USAccDeaths, dtype=float), 12)
    assert len(z) == 7
    assert isclose(z["x_acf1"], 0.70, abs_tol=0.01)
    assert isclose(z["x_acf10"], 1.20, abs_tol=0.01)
    assert isclose(z["diff1_acf1"], 0.023, abs_tol=0.01)
    assert isclose(z["diff1_acf10"], 0.27, abs_tol=0.01)
    assert isclose(z["diff2_acf1"], -0.48, abs_tol=0.01)
    assert isclose(z["diff2_acf10"], 0.74, abs_tol=0.01)
    assert isclose(z["seas_acf1"], 0.62, abs_tol=0.01)


def test_acf_features_non_seasonal():
    z = acf_features(np.array(WWWusage, dtype=float), 1)
    assert len(z) == 6
    assert isclose(z["x_acf1"], 0.96, abs_tol=0.01)
    assert isclose(z["x_acf10"], 4.19, abs_tol=0.01)
    assert isclose(z["diff1_acf1"], 0.79, abs_tol=0.01)
    assert isclose(z["diff1_acf10"], 1.40, abs_tol=0.01)
    assert isclose(z["diff2_acf1"], 0.17, abs_tol=0.01)
    assert isclose(z["diff2_acf10"], 0.33, abs_tol=0.01)


def test_arch_stat_seasonal():
    z = arch_stat(np.array(USAccDeaths, dtype=float), 12)
    assert len(z) == 1
    assert isclose(z["arch_lm"], 0.54, abs_tol=0.01)


def test_arch_stat_non_seasonal():
    z = arch_stat(np.array(WWWusage, dtype=float), 12)
    assert len(z) == 1
    assert isclose(z["arch_lm"], 0.98, abs_tol=0.01)


def test_holt_parameters_seasonal():
    z = holt_parameters(np.array(USAccDeaths, dtype=float), 12)
    assert len(z) == 2
    assert isclose(z["alpha"], 0.96, abs_tol=0.07)
    assert isclose(z["beta"], 0.00, abs_tol=0.1)


def test_holt_parameters_non_seasonal():
    z = holt_parameters(np.array(WWWusage, dtype=float), 1)
    assert len(z) == 2
    assert isclose(z["alpha"], 0.99, abs_tol=0.02)
    assert isclose(z["beta"], 0.99, abs_tol=0.02)


def test_pacf_features_seasonal_short():
    # reference tests/test_pacf_features.py: must not raise on a short
    # seasonal series (nlags >= n // 2 degrades to NaN internally)
    rng = np.random.RandomState(0)
    z = rng.normal(size=15)
    pacf_features(z, freq=7)
