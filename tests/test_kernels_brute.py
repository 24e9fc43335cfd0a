"""Cross-checks of the numerical primitives against independent
brute-force formulations (different code paths computing the same
definitions), so kernel parity does not rest on golden values alone."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsfeatures_ray.kernels import _math as m
from tsfeatures_ray.kernels.simple import (
    crossing_points,
    entropy,
    flat_spots,
    lumpiness,
    stability,
    unitroot_kpss,
)

series = st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
    min_size=16,
    max_size=120,
).filter(lambda v: np.std(v) > 1e-6)


@settings(max_examples=40, deadline=None)
@given(series)
def test_acf_matches_definition(v):
    x = np.array(v)
    got = m.acf(x, nlags=10)
    xm = x - x.mean()
    denom = np.dot(xm, xm) / len(x)
    for k in range(min(10, len(x) - 1) + 1):
        want = (xm[: len(x) - k] * xm[k:]).sum() / len(x) / denom
        assert got[k] == pytest.approx(want, rel=1e-9, abs=1e-12)


@settings(max_examples=30, deadline=None)
@given(series)
def test_pacf_ldb_matches_yule_walker_solve(v):
    """Levinson-Durbin pacf[k] must equal the last coefficient of the
    order-k Yule-Walker system solved directly with biased ACF."""
    x = np.array(v)
    nlags = min(8, len(x) // 2 - 1)
    if nlags < 2:
        return
    got = m.pacf_ldb(x, nlags)
    r = m.acf(x, nlags)
    for k in range(1, nlags + 1):
        R = np.array([[r[abs(i - j)] for j in range(k)] for i in range(k)])
        phi = np.linalg.solve(R, r[1 : k + 1])
        assert got[k] == pytest.approx(phi[-1], rel=1e-6, abs=1e-8)


@settings(max_examples=40, deadline=None)
@given(series)
def test_periodogram_preserves_variance(v):
    # Parseval: one-sided PSD (fs=1) sums to ~variance * n/(n) scaling
    x = np.array(v)
    psd = m.periodogram_psd(x)
    xd = x - x.mean()
    assert psd.sum() == pytest.approx(np.sum(xd**2), rel=1e-9)


def test_entropy_extremes():
    rng = np.random.RandomState(0)
    white = rng.randn(512)
    tone = np.sin(2 * np.pi * np.arange(512) / 16)
    e_white = entropy(white, 1)["entropy"]
    e_tone = entropy(tone, 1)["entropy"]
    assert e_tone < 0.3 < e_white  # pure tone low entropy, noise high


@settings(max_examples=30, deadline=None)
@given(series)
def test_kpss_brute(v):
    x = np.array(v)
    n = len(x)
    nlags = int(4 * (n / 100) ** 0.25)
    got = unitroot_kpss(x, 1)["unitroot_kpss"]
    e = x - x.mean()
    s = np.cumsum(e)
    eta = (s**2).sum() / n**2
    s2 = (e**2).sum() / n
    for i in range(1, nlags + 1):
        s2 += 2.0 * (1 - i / (nlags + 1)) * (e[i:] * e[:-i]).sum() / n
    assert got == pytest.approx(eta / s2, rel=1e-10)


@settings(max_examples=30, deadline=None)
@given(series)
def test_crossing_points_brute(v):
    x = np.array(v)
    med = np.median(x)
    ab = x <= med
    want = sum(1 for i in range(len(x) - 1) if ab[i] != ab[i + 1])
    assert crossing_points(x, 1)["crossing_points"] == want


@settings(max_examples=30, deadline=None)
@given(series, st.integers(min_value=1, max_value=12))
def test_tiled_stats_brute(v, freq):
    x = np.array(v)
    width = 10 if freq == 1 else freq
    nsegs = len(x) // width
    if len(x) < 2 * width:
        assert lumpiness(x, freq)["lumpiness"] == 0.0
        assert stability(x, freq)["stability"] == 0.0
        return
    vars_ = [np.var(x[i * width:(i + 1) * width], ddof=1) for i in range(nsegs)]
    means = [np.mean(x[i * width:(i + 1) * width]) for i in range(nsegs)]
    assert lumpiness(x, freq)["lumpiness"] == pytest.approx(
        np.var(vars_, ddof=1), rel=1e-9, abs=1e-12
    )
    assert stability(x, freq)["stability"] == pytest.approx(
        np.var(means, ddof=1), rel=1e-9, abs=1e-12
    )


def test_flat_spots_matches_pandas_cut():
    # replicate against actual pandas.cut on a deterministic grid of cases
    import itertools

    import pandas as pd

    rng = np.random.RandomState(7)
    cases = [rng.randn(50), np.ones(20), np.r_[np.zeros(30), 1.0],
             rng.exponential(2.0, 80), np.arange(25, dtype=float)]
    for x in cases:
        cut = pd.cut(x, bins=10, include_lowest=True, labels=False) + 1
        want = max(sum(1 for _ in g) for _, g in itertools.groupby(cut))
        assert flat_spots(x, 1)["flat_spots"] == want
