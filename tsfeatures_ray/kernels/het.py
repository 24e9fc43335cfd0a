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
    (the arch package's ``.resid`` for a constant-mean model)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 10:
        raise ValueError("series too short for GARCH fit")
    mu0 = float(np.mean(x))
    var0 = float(np.var(x))
    if var0 <= 0:
        raise ValueError("zero variance")

    # arch-style exponentially weighted backcast of sigma^2
    tau = min(75, n)
    w = 0.94 ** np.arange(tau)
    w /= w.sum()

    def nll(p: np.ndarray) -> float:
        mu, omega, a, b = p
        if omega <= 0 or a < 0 or b < 0 or a + b >= 0.9999:
            return 1e12
        e = x - mu
        e2 = e**2
        backcast = float(np.dot(w, e2[:tau]))
        if n <= 200:
            # short series: plain-float loop beats numpy overhead
            e2l = e2.tolist()
            s_prev = omega + (a + b) * backcast
            ll = 0.0
            log = np.log
            s_t = s_prev
            prev_e2 = backcast
            import math
            l2pi = math.log(2 * math.pi)
            ok = True
            for t in range(n):
                if t > 0:
                    s_t = omega + a * prev_e2 + b * s_t
                if s_t <= 0:
                    ok = False
                    break
                ll += l2pi + math.log(s_t) + e2l[t] / s_t
                prev_e2 = e2l[t]
            if not ok or not math.isfinite(ll):
                return 1e12
            return 0.5 * ll
        # closed-form unroll of s_t = omega + a*e2_{t-1} + b*s_{t-1}:
        #   s_t = b^t*(omega + (a+b)*backcast)
        #       + omega*(b^0+..+b^{t-1}) + a*sum_{k=0}^{t-2} b^k e2_{t-1-k}
        # computed with one convolution instead of a Python loop.
        bp = np.empty(n)
        bp[0] = 1.0
        if n > 1:
            bp[1:] = np.cumprod(np.full(n - 1, b))
        geo = np.concatenate([[0.0], np.cumsum(bp[:-1])])  # sum b^0..b^{t-1}
        if n <= 513:
            conv = np.convolve(e2[: n - 1], bp[: n - 1])[: n - 1] if n > 1 else np.empty(0)
        else:  # FFT convolution for long series (O(n log n))
            N = 1 << int(np.ceil(np.log2(2 * n)))
            conv = np.fft.irfft(
                np.fft.rfft(e2[: n - 1], N) * np.fft.rfft(bp[: n - 1], N), N
            )[: n - 1]
        sigma2 = np.empty(n)
        sigma2[0] = omega + (a + b) * backcast
        if n > 1:
            sigma2[1:] = (
                bp[1:] * sigma2[0] + omega * geo[1:] + a * conv
            )
        if np.any(sigma2 <= 0) or not np.all(np.isfinite(sigma2)):
            return 1e12
        ll = 0.5 * np.sum(np.log(2 * np.pi) + np.log(sigma2) + e2 / sigma2)
        return float(ll) if np.isfinite(ll) else 1e12

    p0 = np.array([mu0, var0 * 0.1, 0.1, 0.8])
    # only mu feeds the output (resid = x - mu); it converges far
    # earlier than the volatility params, so a short simplex suffices
    p, _ = nelder_mead(nll, p0, step=0.2, max_iter=80)
    mu = p[0]
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
