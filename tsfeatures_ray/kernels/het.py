"""Heterogeneity kernel (reference tsfeatures.py:278-338).

The reference uses the (long-removed) statsmodels ``AR(x).fit(maxlag,
ic='aic', trend='c')`` for pre-whitening and the ``arch`` package's
GARCH(1,1) (constant mean, normal errors, rescale=False) fit. Both are
reimplemented here in pure NumPy:

- AR-by-AIC: candidate lags 1..maxlag are fit by conditional OLS on the
  sample conditioned at maxlag (so every candidate sees the same
  observations), AIC = log(sigma2) + 2*(lag+1)/nobs; the winner is refit
  on its own full conditional sample and its residuals are the whitened
  series (matching the legacy AR 'cmle' behavior).
- GARCH(1,1): (mu, omega, alpha, beta) by Gaussian MLE (Nelder-Mead,
  backcast initialization like the arch package). Note the reference
  consumes ``garch_fit.resid`` which in the arch package is the MEAN
  model residual, i.e. x - mu -- not the standardized residual.

Optimizer-backed outputs: reference README.md:95-141 shows these diverge
even between R and the reference itself (garch_acf sum-abs-diff 5.53 on
100 series), so the conformance bar here is structural, not 1e-6.
"""

from __future__ import annotations

import numpy as np

from ._math import acf, embed
from ._optim import nelder_mead
from .simple import arch_stat

__all__ = ["heterogeneity"]


def _ar_by_aic_resid(x: np.ndarray) -> np.ndarray:
    """Whiten x with an AR(p) model, p chosen by AIC (trend='c')."""
    n = len(x)
    if not np.all(np.isfinite(x)):
        raise ValueError("non-finite input")
    maxlag = int(min(n - 1, np.floor(10 * np.log10(n))))
    if maxlag < 1:
        raise ValueError("series too short for AR fit")
    # candidate fits share the sample conditioned at maxlag
    mat = embed(x, maxlag + 1)  # rows: [x_t, x_{t-1}, ..., x_{t-maxlag}]
    y = mat[:, 0]
    nobs = len(y)
    best = (np.inf, 1)
    for lag in range(1, maxlag + 1):
        X = np.column_stack([np.ones(nobs), mat[:, 1 : lag + 1]])
        params, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ params
        sigma2 = float(np.sum(resid**2)) / nobs
        if sigma2 <= 0:
            continue
        aic = np.log(sigma2) + 2.0 * (lag + 1) / nobs
        if aic < best[0]:
            best = (aic, lag)
    lag = best[1]
    # refit the winner on its own full conditional sample
    mat = embed(x, lag + 1)
    y = mat[:, 0]
    X = np.column_stack([np.ones(len(y)), mat[:, 1 : lag + 1]])
    params, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    return y - X @ params


def _garch11_mean_resid(x: np.ndarray) -> np.ndarray:
    """Fit GARCH(1,1) with constant mean by Gaussian MLE; return x - mu
    (the arch package's ``.resid`` for a constant-mean model).

    Profile-likelihood split: conditional on the volatility path the MLE
    of mu is the closed-form 1/sigma^2-weighted mean, so we fit
    (omega, a, b) with mu fixed (3-param simplex over a likelihood whose
    squared-residual series is HOISTED out of the objective) and update
    mu in closed form -- same estimate as the joint 4-param search at a
    fraction of the cost. Only mu feeds the kernel's outputs.
    """
    import math

    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 10:
        raise ValueError("series too short for GARCH fit")
    mu = float(np.mean(x))
    var0 = float(np.var(x))
    if var0 <= 0:
        raise ValueError("zero variance")

    # arch-style exponentially weighted backcast of sigma^2
    tau = min(75, n)
    w = 0.94 ** np.arange(tau)
    w /= w.sum()
    l2pi = math.log(2 * math.pi)

    def make_nll(e2l: list, backcast: float):
        def nll(q: np.ndarray) -> float:
            # plain floats: numpy-scalar arithmetic in the loop is ~10x slower
            omega, a, b = float(q[0]), float(q[1]), float(q[2])
            if omega <= 0 or a < 0 or b < 0 or a + b >= 0.9999:
                return 1e12
            s_t = backcast
            prev_e2 = backcast
            ll = 0.0
            for e2t in e2l:
                s_t = omega + a * prev_e2 + b * s_t
                if s_t <= 0:
                    return 1e12
                ll += l2pi + math.log(s_t) + e2t / s_t
                prev_e2 = e2t
            return 0.5 * ll if math.isfinite(ll) else 1e12

        return nll

    q = np.array([var0 * 0.1, 0.1, 0.8])
    for _ in range(2):
        e2 = (x - mu) ** 2
        backcast = float(np.dot(w, e2[:tau]))
        q, _ = nelder_mead(make_nll(e2.tolist(), backcast), q, step=0.2, max_iter=60)
        omega, a, b = q
        if omega <= 0 or a < 0 or b < 0 or a + b >= 0.9999:
            break
        sigma2 = np.empty(n)
        s_prev = backcast
        prev_e2 = backcast
        e2l = e2
        for t in range(n):
            s_prev = omega + a * prev_e2 + b * s_prev
            sigma2[t] = s_prev
            prev_e2 = e2l[t]
        if np.any(sigma2 <= 0) or not np.all(np.isfinite(sigma2)):
            break
        wgt = 1.0 / sigma2
        mu = float(np.dot(wgt, x) / wgt.sum())
    return x - mu


def heterogeneity(x: np.ndarray, freq: int = 1) -> dict:
    """ARCH/GARCH heterogeneity features (reference tsfeatures.py:278-338)."""
    x = np.asarray(x, dtype=float)
    m = freq
    try:
        x_whitened = _ar_by_aic_resid(x)
    except Exception:
        return {
            "arch_acf": np.nan,
            "garch_acf": np.nan,
            "arch_r2": np.nan,
            "garch_r2": np.nan,
        }

    x_archtest = arch_stat(x_whitened, m)["arch_lm"]
    try:
        LBstat = float((acf(x_whitened**2, nlags=12)[1:] ** 2).sum())
    except Exception:
        LBstat = np.nan
    try:
        garch_resid = _garch11_mean_resid(x_whitened)
        x_garch_archtest = arch_stat(garch_resid, m)["arch_lm"]
        LBstat2 = float((acf(garch_resid**2, nlags=12)[1:] ** 2).sum())
    except Exception:
        x_garch_archtest = np.nan
        LBstat2 = np.nan

    return {
        "arch_acf": LBstat,
        "garch_acf": LBstat2,
        "arch_r2": x_archtest,
        "garch_r2": x_garch_archtest,
    }
