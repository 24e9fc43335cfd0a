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

from ._optim import nelder_mead

__all__ = ["holt_parameters", "hw_parameters"]

_PENALTY = 1e12


def _holt_sse_fast(alpha: float, beta: float, l: float, b: float, y: np.ndarray) -> float:
    """SSE of additive Holt: l_t = alpha*y_t + (1-alpha)(l+b);
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}."""
    sse = 0.0
    for t in range(len(y)):
        f = l + b
        e = y[t] - f
        sse += e * e
        l_new = alpha * y[t] + (1.0 - alpha) * (l + b)
        b = beta * (l_new - l) + (1.0 - beta) * b
        l = l_new
    return sse


def _heuristic_level_trend(y: np.ndarray) -> tuple[float, float]:
    """OLS line through the first min(10, n) observations."""
    k = min(10, len(y))
    t = np.arange(k, dtype=float)
    A = np.column_stack([np.ones(k), t])
    coef, _, _, _ = np.linalg.lstsq(A, y[:k], rcond=None)
    return float(coef[0]), float(coef[1])


def holt_parameters(x: np.ndarray, freq: int = 1) -> dict:
    """alpha / beta of an additive-trend Holt fit (reference
    tsfeatures.py:340-368). NaN when the fit cannot run (short series)."""
    y = np.asarray(x, dtype=float)
    try:
        n = len(y)
        if n < 5 or not np.all(np.isfinite(y)) or np.std(y) == 0.0:
            raise ValueError("series too short, non-finite, or constant")
        l0, b0 = _heuristic_level_trend(y)

        # coarse grid over the constraint region, then simplex refinement
        best = (np.inf, 0.5, 0.1)
        for a in np.linspace(0.02, 0.98, 13):
            for bfrac in np.linspace(0.02, 0.98, 9):
                b = a * bfrac
                sse = _holt_sse_fast(a, b, l0, b0, y)
                if sse < best[0]:
                    best = (sse, a, b)

        def obj(p: np.ndarray) -> float:
            a, b, l, bb = p
            if not (1e-6 < a < 1 - 1e-6) or not (1e-6 < b <= a):
                return _PENALTY
            return _holt_sse_fast(a, b, l, bb, y)

        p, _ = nelder_mead(obj, np.array([best[1], best[2], l0, b0]), step=0.05)
        params = {"alpha": float(p[0]), "beta": float(p[1])}
    except Exception:
        params = {"alpha": np.nan, "beta": np.nan}
    return params


def _hw_sse_fast(
    alpha: float, beta: float, gamma: float, l: float, b: float, s: np.ndarray, y: np.ndarray
) -> float:
    m = len(s)
    s = s.copy()
    sse = 0.0
    for t in range(len(y)):
        si = s[t % m]
        f = l + b + si
        e = y[t] - f
        sse += e * e
        l_new = alpha * (y[t] - si) + (1.0 - alpha) * (l + b)
        b = beta * (l_new - l) + (1.0 - beta) * b
        s[t % m] = gamma * (y[t] - l_new) + (1.0 - gamma) * si
        l = l_new
    return sse


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
    seasonal cycles exist (statsmodels raises there -> reference except)."""
    y = np.asarray(x, dtype=float)
    m = int(freq)
    try:
        n = len(y)
        if m < 2 or n < 2 * m or n < 5 or not np.all(np.isfinite(y)) or np.std(y) == 0.0:
            raise ValueError("seasonal fit not identifiable")
        l0, b0, s0 = _heuristic_seasonal(y, m)

        best = (np.inf, 0.3, 0.05, 0.1)
        for a in np.linspace(0.05, 0.95, 7):
            for bfrac in (0.05, 0.3, 0.9):
                for gfrac in (0.05, 0.3, 0.9):
                    b = a * bfrac
                    g = (1.0 - a) * gfrac
                    sse = _hw_sse_fast(a, b, g, l0, b0, s0, y)
                    if sse < best[0]:
                        best = (sse, a, b, g)

        def obj(p: np.ndarray) -> float:
            a, b, g = p
            if (
                not (1e-6 < a < 1 - 1e-6)
                or not (1e-6 < b <= a)
                or not (1e-6 < g <= 1.0 - a)
            ):
                return _PENALTY
            return _hw_sse_fast(a, b, g, l0, b0, s0, y)

        p, _ = nelder_mead(obj, np.array([best[1], best[2], best[3]]), step=0.05)
        params = {
            "hw_alpha": float(p[0]),
            "hw_beta": float(p[1]),
            "hw_gamma": float(p[2]),
        }
    except Exception:
        params = {"hw_alpha": np.nan, "hw_beta": np.nan, "hw_gamma": np.nan}
    return params
