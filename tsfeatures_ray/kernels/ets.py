"""Exponential-smoothing kernels: Holt and Holt-Winters parameters.

Reimplements what the reference gets from statsmodels
``ExponentialSmoothing(...).fit()`` (reference tsfeatures.py:340-368
``holt_parameters``, :392-423 ``hw_parameters``): additive-trend (and
additive-seasonal) innovations recursions fit by SSE minimization under
the usual constraint region (0<alpha<1, 0<beta<alpha, 0<gamma<1-alpha),
with Hyndman's heuristic initial level/trend/seasonal states.

These are optimizer-backed features: even R vs Python reference
implementations diverge here (reference README.md:95-141), and the
reference's own unit tests use loose tolerances (0.02-0.1,
tests/test_holt_parameters.py). We match those tolerances.
"""

from __future__ import annotations

import numpy as np

__all__ = ["holt_parameters", "hw_parameters"]


def _holt_sse_fast(alpha: float, beta: float, l: float, b: float, y) -> float:
    """SSE of additive Holt: l_t = alpha*y_t + (1-alpha)(l+b);
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}.
    ``y`` should be a Python list (plain-float arithmetic is ~5x faster
    than numpy scalar indexing in this sequential loop)."""
    sse = 0.0
    one_a = 1.0 - alpha
    one_b = 1.0 - beta
    for v in y:
        f = l + b
        e = v - f
        sse += e * e
        l_new = alpha * v + one_a * f
        b = beta * (l_new - l) + one_b * b
        l = l_new
    return sse


def _holt_sse_grid(alphas: np.ndarray, betas: np.ndarray, l0: float, b0: float,
                   y: np.ndarray) -> np.ndarray:
    """Vectorized Holt SSE over K candidate (alpha, beta) pairs at once:
    the time recursion stays sequential but each step is a K-wide numpy
    op, so a whole grid costs ~one scalar pass."""
    K = len(alphas)
    l = np.full(K, l0)
    b = np.full(K, b0)
    sse = np.zeros(K)
    with np.errstate(over="ignore", invalid="ignore"):
        for t in range(len(y)):
            f = l + b
            e = y[t] - f
            sse += e * e
            l_new = alphas * y[t] + (1.0 - alphas) * f
            b = betas * (l_new - l) + (1.0 - betas) * b
            l = l_new
    return np.where(np.isfinite(sse), sse, np.inf)


def _heuristic_level_trend(y: np.ndarray) -> tuple[float, float]:
    """OLS line through the first min(10, n) observations."""
    k = min(10, len(y))
    t = np.arange(k, dtype=float)
    A = np.column_stack([np.ones(k), t])
    coef, _, _, _ = np.linalg.lstsq(A, y[:k], rcond=None)
    return float(coef[0]), float(coef[1])


def holt_parameters(x: np.ndarray, freq: int = 1) -> dict:
    """alpha / beta of an additive-trend Holt fit (reference
    tsfeatures.py:340-368). NaN when the fit cannot run (short series).

    Delegates to the lane-batched fit (_batch.py: coarse vectorized
    grid, two zoom rounds, then a batched Nelder-Mead polish over all 4
    params) with a single lane -- one optimizer implementation serves
    both the per-series API and the cross-series feature stage."""
    from ._batch import holt_parameters_batch

    y = np.asarray(x, dtype=float)
    try:
        out = holt_parameters_batch([y])
        params = {"alpha": float(out["alpha"][0]), "beta": float(out["beta"][0])}
    except Exception:
        params = {"alpha": np.nan, "beta": np.nan}
    return params


def _hw_sse_fast(
    alpha: float, beta: float, gamma: float, l: float, b: float, s, y
) -> float:
    """Scalar HW SSE; ``s``/``y`` as Python lists for loop speed."""
    m = len(s)
    s = list(s)
    sse = 0.0
    one_a = 1.0 - alpha
    one_b = 1.0 - beta
    one_g = 1.0 - gamma
    j = 0
    for v in y:
        si = s[j]
        f = l + b + si
        e = v - f
        sse += e * e
        l_new = alpha * (v - si) + one_a * (l + b)
        b = beta * (l_new - l) + one_b * b
        s[j] = gamma * (v - l_new) + one_g * si
        l = l_new
        j += 1
        if j == m:
            j = 0
    return sse


def _hw_sse_grid(alphas, betas, gammas, l0: float, b0: float, s0: np.ndarray,
                 y: np.ndarray) -> np.ndarray:
    """Vectorized HW SSE over K candidate (alpha, beta, gamma) triples:
    per-candidate seasonal state is a (K, m) matrix, each time step is a
    K-wide numpy op."""
    K = len(alphas)
    m = len(s0)
    s = np.tile(s0, (K, 1))
    l = np.full(K, l0)
    b = np.full(K, b0)
    sse = np.zeros(K)
    with np.errstate(over="ignore", invalid="ignore"):
        for t in range(len(y)):
            j = t % m
            si = s[:, j]
            f = l + b + si
            e = y[t] - f
            sse += e * e
            # standard additive-HW level update (same objective as
            # _hw_sse_fast): (1-a)*(l+b) -- the seasonal term belongs in
            # the forecast, not the level recursion
            l_new = alphas * (y[t] - si) + (1.0 - alphas) * (l + b)
            b = betas * (l_new - l) + (1.0 - betas) * b
            s[:, j] = gammas * (y[t] - l_new) + (1.0 - gammas) * si
            l = l_new
    return np.where(np.isfinite(sse), sse, np.inf)


def _heuristic_seasonal(y: np.ndarray, m: int) -> tuple[float, float, np.ndarray]:
    """Hyndman-style heuristic: centered-MA detrend over the first cycles ->
    seasonal indices (sum 0); level/trend line from the adjusted series."""
    n = len(y)
    ncycles = min(5, n // m)
    yy = y[: ncycles * m]
    # centered moving average of window m
    if m % 2 == 0:
        kernel = np.concatenate([[0.5], np.ones(m - 1), [0.5]]) / m
    else:
        kernel = np.ones(m) / m
    trend = np.convolve(yy, kernel, mode="valid")
    pad = (len(yy) - len(trend)) // 2
    detr = yy[pad : pad + len(trend)] - trend
    idx = (np.arange(pad, pad + len(trend))) % m
    s = np.zeros(m)
    for j in range(m):
        vals = detr[idx == j]
        s[j] = vals.mean() if len(vals) else 0.0
    s -= s.mean()
    adj = y - s[np.arange(n) % m]
    l0, b0 = _heuristic_level_trend(adj)
    return l0, b0, s


def hw_parameters(x: np.ndarray, freq: int = 1) -> dict:
    """alpha / beta / gamma of an additive Holt-Winters fit (reference
    tsfeatures.py:392-423). NaN when freq < 2 or fewer than two full
    seasonal cycles exist (statsmodels raises there -> reference except).

    Delegates to the lane-batched fit (_batch.py: coarse vectorized grid
    + one zoom round, then a batched Nelder-Mead polish) with a single
    lane -- one optimizer implementation for both execution shapes."""
    from ._batch import hw_parameters_batch

    y = np.asarray(x, dtype=float)
    try:
        out = hw_parameters_batch([y], np.array([int(freq)]))
        params = {
            "hw_alpha": float(out["hw_alpha"][0]),
            "hw_beta": float(out["hw_beta"][0]),
            "hw_gamma": float(out["hw_gamma"][0]),
        }
    except Exception:
        params = {"hw_alpha": np.nan, "hw_beta": np.nan, "hw_gamma": np.nan}
    return params
