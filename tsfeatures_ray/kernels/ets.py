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
    tsfeatures.py:340-368). NaN when the fit cannot run (short series)."""
    y = np.asarray(x, dtype=float)
    try:
        n = len(y)
        if n < 5 or not np.all(np.isfinite(y)) or np.std(y) == 0.0:
            raise ValueError("series too short, non-finite, or constant")
        l0, b0 = _heuristic_level_trend(y)

        # coarse vectorized grid, two zoom rounds, then a short simplex
        # polish over all 4 params (initial states included)
        a_grid = np.linspace(0.02, 0.98, 13)
        f_grid = np.linspace(0.02, 0.98, 9)
        A, F = np.meshgrid(a_grid, f_grid, indexing="ij")
        alphas, betas = A.ravel(), (A * F).ravel()
        for _ in range(3):
            sse = _holt_sse_grid(alphas, betas, l0, b0, y)
            i = int(np.argmin(sse))
            a_c, b_c = alphas[i], betas[i]
            span_a = (alphas.max() - alphas.min()) * 0.15
            a_grid = np.clip(np.linspace(a_c - span_a, a_c + span_a, 7), 1e-4, 1 - 1e-4)
            b_grid = np.clip(np.linspace(b_c - span_a, b_c + span_a, 7), 1e-4, 1 - 1e-4)
            A, B = np.meshgrid(a_grid, b_grid, indexing="ij")
            keep = B <= A
            alphas, betas = A[keep], B[keep]

        y_list = y.tolist()

        def obj(p: np.ndarray) -> float:
            a, b, l, bb = p
            if not (1e-6 < a < 1 - 1e-6) or not (1e-6 < b <= a):
                return _PENALTY
            return _holt_sse_fast(float(a), float(b), float(l), float(bb), y_list)

        p, _ = nelder_mead(
            obj, np.array([a_c, b_c, l0, b0]), step=0.02, max_iter=100
        )
        params = {"alpha": float(p[0]), "beta": float(p[1])}
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
            l_new = alphas * (y[t] - si) + (1.0 - alphas) * f
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
    seasonal cycles exist (statsmodels raises there -> reference except)."""
    y = np.asarray(x, dtype=float)
    m = int(freq)
    try:
        n = len(y)
        if m < 2 or n < 2 * m or n < 5 or not np.all(np.isfinite(y)) or np.std(y) == 0.0:
            raise ValueError("seasonal fit not identifiable")
        l0, b0, s0 = _heuristic_seasonal(y, m)

        # coarse vectorized grid + one zoom round, then a short simplex
        a_g = np.linspace(0.05, 0.95, 7)
        bf_g = np.array([0.05, 0.3, 0.9])
        gf_g = np.array([0.05, 0.3, 0.9])
        A, BF, GF = np.meshgrid(a_g, bf_g, gf_g, indexing="ij")
        alphas = A.ravel()
        betas = (A * BF).ravel()
        gammas = ((1.0 - A) * GF).ravel()
        sse = _hw_sse_grid(alphas, betas, gammas, l0, b0, s0, y)
        i = int(np.argmin(sse))
        a_c, b_c, g_c = alphas[i], betas[i], gammas[i]
        # zoom: local grid around the winner
        a_g = np.clip(np.linspace(a_c - 0.1, a_c + 0.1, 5), 1e-4, 1 - 1e-4)
        b_g = np.clip(np.linspace(b_c - 0.1, b_c + 0.1, 5), 1e-4, 1 - 1e-4)
        g_g = np.clip(np.linspace(g_c - 0.1, g_c + 0.1, 5), 1e-4, 1 - 1e-4)
        A, B, G = np.meshgrid(a_g, b_g, g_g, indexing="ij")
        keep = (B <= A) & (G <= 1.0 - A)
        if keep.any():
            alphas, betas, gammas = A[keep], B[keep], G[keep]
            sse = _hw_sse_grid(alphas, betas, gammas, l0, b0, s0, y)
            i = int(np.argmin(sse))
            a_c, b_c, g_c = alphas[i], betas[i], gammas[i]

        y_list = y.tolist()
        s0_list = s0.tolist()

        def obj(p: np.ndarray) -> float:
            a, b, g = p
            if (
                not (1e-6 < a < 1 - 1e-6)
                or not (1e-6 < b <= a)
                or not (1e-6 < g <= 1.0 - a)
            ):
                return _PENALTY
            return _hw_sse_fast(float(a), float(b), float(g), l0, b0, s0_list, y_list)

        p, _ = nelder_mead(obj, np.array([a_c, b_c, g_c]), step=0.03, max_iter=50)
        params = {
            "hw_alpha": float(p[0]),
            "hw_beta": float(p[1]),
            "hw_gamma": float(p[2]),
        }
    except Exception:
        params = {"hw_alpha": np.nan, "hw_beta": np.nan, "hw_gamma": np.nan}
    return params
