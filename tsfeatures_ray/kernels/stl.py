"""STL decomposition features (reference tsfeatures.py:647-791).

Reimplements, in pure NumPy:

- STL (Cleveland et al. 1990) as exposed by statsmodels ``STL(x, period,
  seasonal=13).fit()`` with statsmodels' default secondary parameters:
  trend window = smallest odd int > 1.5*period/(1 - 1.5/seasonal),
  low-pass window = smallest odd int > period, all loess degrees 1,
  jumps 1, inner=2 / outer=0 iterations (non-robust defaults).
- Friedman's SuperSmoother (the ``supersmoother`` package used by the
  reference for the nonseasonal trend, tsfeatures.py:706): primary spans
  (0.05, 0.2, 0.5), cross-validated span selection smoothed with the
  midrange span, interpolation between bracketing primary smooths, final
  smooth at the tweeter span.

These are the reference's own building blocks re-derived from the public
algorithms; the reference pins no golden values for stl_features, and
its README (95-141) shows R/Python divergence here, so conformance is
structural (decomposition identity, strength bounds) plus fixture-level
stability.
"""

from __future__ import annotations

import numpy as np

from .simple import acf_features
from ._math import ols_fit, poly

__all__ = ["stl_features", "stl_decompose", "supersmoother_fit"]


# ---------------------------------------------------------------------------
# loess (local linear, tricube weights, evaluated at integer positions)
# ---------------------------------------------------------------------------

def _loess_grid(y: np.ndarray, q: int) -> np.ndarray:
    """Loess (degree 1) evaluated at every observed position 0..n-1.

    Fast path for the regular grid: with an ODD window q <= n, every
    interior position has the same symmetric distance pattern, so the
    tricube-weighted local-linear fit reduces to one fixed-kernel
    correlation (the slope term vanishes at the window center). Edge
    positions (and q > n) fall back to the general evaluator.
    """
    n = len(y)
    if q > n or q % 2 == 0 or n < 3:
        return _loess_at(y, q, np.arange(n, dtype=float))
    h = (q - 1) // 2
    if h == 0:
        return y.astype(float).copy()
    d = np.abs(np.arange(-h, h + 1, dtype=float))
    w = np.clip((1.0 - (d / h) ** 3) ** 3, 0.0, None) if h > 0 else np.ones(1)
    w = w / w.sum()
    out = np.empty(n)
    interior = np.correlate(y, w[::-1], mode="valid")  # length n - q + 1
    out[h : n - h] = interior
    # edges: every position < h shares the window [0, q) (the q nearest
    # points pin to the boundary), so both edges vectorize over a fixed
    # window just like the interior
    out[:h] = _loess_fixed_window(y[:q], np.arange(h, dtype=float), 0.0)
    out[n - h :] = _loess_fixed_window(
        y[n - q :], np.arange(n - h, n, dtype=float), float(n - q)
    )
    return out


def _loess_fixed_window(
    ywin: np.ndarray, eval_pos: np.ndarray, win_start: float
) -> np.ndarray:
    """Loess (degree 1, tricube) of a FIXED window of points at positions
    win_start..win_start+len(ywin)-1, evaluated at ``eval_pos`` --
    vectorized across eval positions."""
    qn = len(ywin)
    pos = win_start + np.arange(qn, dtype=float)
    d = np.abs(pos[None, :] - eval_pos[:, None])
    dmax = d.max(axis=1)
    dmax = np.where(dmax <= 0, 1.0, dmax)
    w = np.clip(1.0 - (d / dmax[:, None]) ** 3, 0.0, None) ** 3
    sw = w.sum(axis=1)
    w = w / np.where(sw > 0, sw, 1.0)[:, None]
    xbar = w @ pos
    ybar = w @ ywin
    dev = pos[None, :] - xbar[:, None]
    ssx = (w * dev**2).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (w * dev * ywin[None, :]).sum(axis=1) / ssx
    lin = ybar + slope * (eval_pos - xbar)
    use_lin = np.sqrt(np.maximum(ssx, 0.0)) > 1e-3 * np.maximum(dmax, 1.0)
    return np.where(use_lin & np.isfinite(lin), lin, ybar)


def _loess_at(y: np.ndarray, q: int, eval_pos: np.ndarray) -> np.ndarray:
    """Loess (degree 1) of y (observed at positions 0..n-1) evaluated at
    ``eval_pos`` (may include -1 / n for STL cycle-subseries extension).

    Window = q nearest observed points; when q > n all points are used
    and the max distance is inflated by (q - n) / 2 (Cleveland's rule).
    """
    n = len(y)
    pos = np.arange(n, dtype=float)
    out = np.empty(len(eval_pos))
    qq = min(q, n)
    if q >= n and n >= 1:
        # window == all points for every eval position: fully vectorized
        # across eval positions (the common case for short STL
        # cycle-subseries, where q=13 exceeds the subseries length)
        ep = np.asarray(eval_pos, dtype=float)
        d = np.abs(pos[None, :] - ep[:, None])
        dmax = d.max(axis=1) + (q - n) / 2.0
        dmax = np.where(dmax <= 0, 1.0, dmax)
        w = np.clip(1.0 - (d / dmax[:, None]) ** 3, 0.0, None) ** 3
        sw = w.sum(axis=1)
        w = w / np.where(sw > 0, sw, 1.0)[:, None]
        xbar = w @ pos
        ybar = w @ y
        dev = pos[None, :] - xbar[:, None]
        ssx = (w * dev**2).sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (w * dev * y[None, :]).sum(axis=1) / ssx
        lin = ybar + slope * (ep - xbar)
        use_lin = np.sqrt(np.maximum(ssx, 0.0)) > 1e-3 * np.maximum(dmax, 1.0)
        return np.where(use_lin & np.isfinite(lin), lin, ybar)
    for k, xe in enumerate(eval_pos):
        # nearest-q contiguous window around xe
        lo = int(np.clip(round(xe) - (qq - 1) // 2, 0, n - qq))
        # shift window so it truly holds the q nearest points
        while lo > 0 and xe - pos[lo - 1] < pos[lo + qq - 1] - xe:
            lo -= 1
        while lo + qq < n and pos[lo + qq] - xe < xe - pos[lo]:
            lo += 1
        w_pos = pos[lo : lo + qq]
        w_y = y[lo : lo + qq]
        d = np.abs(w_pos - xe)
        dmax = d.max()
        if q > n:
            dmax += (q - n) / 2.0
        if dmax <= 0:
            out[k] = w_y.mean()
            continue
        w = (1.0 - (d / dmax) ** 3) ** 3
        w = np.clip(w, 0.0, None)
        sw = w.sum()
        if sw <= 0:
            out[k] = w_y.mean()
            continue
        w /= sw
        xbar = np.dot(w, w_pos)
        ybar = np.dot(w, w_y)
        ssx = np.dot(w, (w_pos - xbar) ** 2)
        if np.sqrt(ssx) > 1e-3 * max(dmax, 1.0):
            slope = np.dot(w, (w_pos - xbar) * w_y) / ssx
            out[k] = ybar + slope * (xe - xbar)
        else:
            out[k] = ybar
    return out


def _moving_average(x: np.ndarray, w: int) -> np.ndarray:
    c = np.concatenate([[0.0], np.cumsum(x)])
    return (c[w:] - c[:-w]) / w


def _next_odd_gt(v: float) -> int:
    o = int(np.ceil(v))
    if o <= v:
        o += 1
    if o % 2 == 0:
        o += 1
    return o


def stl_decompose(x: np.ndarray, period: int, seasonal: int = 13):
    """STL inner loop (non-robust, statsmodels defaults). Returns
    (trend, seasonal_component, resid)."""
    y = np.asarray(x, dtype=float)
    n = len(y)
    m = int(period)
    if m < 2:
        raise ValueError("period must be >= 2")
    if n < 2 * m:
        raise ValueError("series must span at least 2 periods")
    n_s = seasonal
    n_t = _next_odd_gt(1.5 * m / (1.0 - 1.5 / n_s))
    n_l = _next_odd_gt(float(m))

    trend = np.zeros(n)
    season = np.zeros(n)
    for _ in range(2):  # inner iterations (non-robust default)
        detrended = y - trend
        # cycle-subseries smoothing, extended one period each side
        C = np.empty(n + 2 * m)
        for k in range(m):
            sub = detrended[k::m]
            n_k = len(sub)
            if n_s < n_k:
                # body via the vectorized grid smoother; the two
                # extension points use the boundary-pinned fixed windows
                qn = n_s
                sm = np.concatenate(
                    [
                        _loess_fixed_window(sub[:qn], np.array([-1.0]), 0.0),
                        _loess_grid(sub, n_s),
                        _loess_fixed_window(
                            sub[n_k - qn :], np.array([float(n_k)]), float(n_k - qn)
                        ),
                    ]
                )
            else:
                eval_pos = np.arange(-1, n_k + 1, dtype=float)
                sm = _loess_at(sub, n_s, eval_pos)
            # positions in C: index k + m*(j+1) corresponds to sub[j];
            # extension j=-1 -> index k, j=n_k -> index k + m*(n_k+1)
            idxs = k + m * np.arange(0, n_k + 2)
            keep = idxs < len(C)
            C[idxs[keep]] = sm[: keep.sum()]
        # low-pass filter: MA(m) x2, MA(3), then loess(n_l)
        L = _moving_average(_moving_average(_moving_average(C, m), m), 3)
        L = _loess_grid(L, n_l)
        season = C[m : n + m] - L
        deseason = y - season
        trend = _loess_grid(deseason, n_t)
    resid = y - trend - season
    return trend, season, resid


# ---------------------------------------------------------------------------
# SuperSmoother (Friedman 1984), for the nonseasonal (freq == 1) trend
# ---------------------------------------------------------------------------

def _linear_smooth_cv(y: np.ndarray, span_frac: float):
    """Fixed-size sliding-window linear smoother on equally spaced points.

    Returns (fit, |cv residual|) where the CV residual uses the
    leave-one-out identity r/(1 - h_ii) for linear smoothers.
    """
    n = len(y)
    k = max(3, int(span_frac * n))
    k = min(k, n)
    t = np.arange(n, dtype=float)
    lo = np.clip(np.arange(n) - (k - 1) // 2, 0, n - k)
    c1 = np.concatenate([[0.0], np.cumsum(t)])
    c2 = np.concatenate([[0.0], np.cumsum(t * t)])
    cy = np.concatenate([[0.0], np.cumsum(y)])
    cty = np.concatenate([[0.0], np.cumsum(t * y)])
    sx = c1[lo + k] - c1[lo]
    sxx = c2[lo + k] - c2[lo]
    sy = cy[lo + k] - cy[lo]
    sxy = cty[lo + k] - cty[lo]
    xbar = sx / k
    ybar = sy / k
    ssx = sxx - k * xbar**2
    sxy_c = sxy - k * xbar * ybar
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = np.where(ssx > 1e-12, sxy_c / np.where(ssx > 1e-12, ssx, 1.0), 0.0)
        fit = ybar + slope * (t - xbar)
        h = 1.0 / k + np.where(ssx > 1e-12, (t - xbar) ** 2 / np.where(ssx > 1e-12, ssx, 1.0), 0.0)
        cv = np.abs((y - fit) / np.maximum(1.0 - h, 1e-10))
    return fit, cv


def _fixed_smooth(y: np.ndarray, span_frac: float) -> np.ndarray:
    return _linear_smooth_cv(y, span_frac)[0]


def supersmoother_fit(y: np.ndarray) -> np.ndarray:
    """Friedman's SuperSmoother on equally spaced points (alpha = 0)."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    spans = np.array([0.05, 0.2, 0.5])
    if n < 6:
        # degenerate: fall back to the global line
        _, resid, fitted = ols_fit(np.arange(n, dtype=float), y)
        return fitted
    fits, cvs = [], []
    for s in spans:
        f, cv = _linear_smooth_cv(y, s)
        fits.append(f)
        cvs.append(_fixed_smooth(cv, 0.2))  # smooth |cv resid| at midrange
    fits = np.array(fits)
    cvs = np.array(cvs)
    best = np.argmin(cvs, axis=0)
    span_best = spans[best]
    span_sm = _fixed_smooth(span_best, 0.2)
    span_sm = np.clip(span_sm, spans[0], spans[-1])
    # interpolate between the bracketing primary fits
    out = np.empty(n)
    for i in range(n):
        s = span_sm[i]
        jhi = int(np.searchsorted(spans, s))
        if jhi == 0:
            out[i] = fits[0, i]
        elif jhi >= len(spans):
            out[i] = fits[-1, i]
        else:
            jlo = jhi - 1
            frac = (s - spans[jlo]) / (spans[jhi] - spans[jlo])
            out[i] = fits[jlo, i] * (1 - frac) + fits[jhi, i] * frac
    return _fixed_smooth(out, 0.05)


# ---------------------------------------------------------------------------
# the feature kernel
# ---------------------------------------------------------------------------

def stl_features(x: np.ndarray, freq: int = 1) -> dict:
    """STL-based features (reference tsfeatures.py:647-791)."""
    x = np.asarray(x, dtype=float)
    m = freq
    nperiods = int(m > 1)
    nan_out = {
        "nperiods": float(nperiods),
        "seasonal_period": float(m),
        "trend": np.nan,
        "spike": np.nan,
        "linearity": np.nan,
        "curvature": np.nan,
        "e_acf1": np.nan,
        "e_acf10": np.nan,
    }
    if m > 1:
        try:
            trend0, seasonal, remainder = stl_decompose(x, m, 13)
        except Exception:
            nan_out.update({"seasonal_strength": np.nan, "peak": np.nan, "trough": np.nan})
            return nan_out
    else:
        t = np.arange(len(x)) + 1
        try:
            if len(x) < 4:
                raise ValueError("too short for supersmoother")
            trend0 = supersmoother_fit(x)
        except Exception:
            return nan_out
        remainder = x - trend0
        seasonal = np.zeros(len(x))

    detrend = x - trend0
    deseason = x - seasonal
    n = len(x)
    varx = np.nanvar(x, ddof=1)
    vare = np.nanvar(remainder, ddof=1)
    vardeseason = np.nanvar(deseason, ddof=1)

    if varx < np.finfo(float).eps:
        trend_strength = 0.0
    elif vardeseason / varx < 1e-10:
        trend_strength = 0.0
    else:
        trend_strength = max(0.0, min(1.0, 1.0 - vare / vardeseason))

    if m > 1:
        denom = np.nanvar(remainder + seasonal, ddof=1)
        if varx < np.finfo(float).eps or denom < np.finfo(float).eps:
            season_strength = 0.0
        else:
            season_strength = max(0.0, min(1.0, 1.0 - vare / denom))
        peak = (int(np.argmax(seasonal)) + 1) % m
        peak = m if peak == 0 else peak
        trough = (int(np.argmin(seasonal)) + 1) % m
        trough = m if trough == 0 else trough

    d = (remainder - np.nanmean(remainder)) ** 2
    varloo = (vare * (n - 1) - d) / (n - 2)
    spike = float(np.nanvar(varloo, ddof=1))

    time = np.arange(n) + 1
    poly_m = poly(time, 2)
    coefs, _, _ = ols_fit(poly_m, trend0, add_intercept=True)
    linearity = float(coefs[1]) if len(coefs) > 1 else np.nan
    curvature = float(-coefs[2]) if len(coefs) > 2 else np.nan

    acfremainder = acf_features(remainder, m)
    output = {
        "nperiods": float(nperiods),
        "seasonal_period": float(m),
        "trend": float(trend_strength),
        "spike": spike,
        "linearity": linearity,
        "curvature": curvature,
        "e_acf1": acfremainder["x_acf1"],
        "e_acf10": acfremainder["x_acf10"],
    }
    if m > 1:
        output["seasonal_strength"] = float(season_strength)
        output["peak"] = float(peak)
        output["trough"] = float(trough)
    return output
