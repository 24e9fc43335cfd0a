"""Tiny derivative-free optimizers (scipy is not available).

``nelder_mead`` is a standard Nelder-Mead simplex implementation used by
the ETS (Holt / Holt-Winters) and GARCH kernels in place of
scipy.optimize / statsmodels' internal optimizers.
"""

from __future__ import annotations

import numpy as np


def nelder_mead(
    f,
    x0: np.ndarray,
    step: float = 0.1,
    max_iter: int = 400,
    xtol: float = 1e-6,
    ftol: float = 1e-10,
) -> tuple[np.ndarray, float]:
    """Minimize f: R^n -> R starting at x0. Returns (x_best, f_best)."""
    x0 = np.asarray(x0, dtype=float)
    n = len(x0)
    # initial simplex
    sim = [x0]
    for i in range(n):
        p = x0.copy()
        p[i] += step if p[i] == 0 else step * max(abs(p[i]), 1.0)
        sim.append(p)
    sim = np.array(sim)
    fs = np.array([f(p) for p in sim])

    alpha, gamma, rho, sigma = 1.0, 2.0, 0.5, 0.5
    for _ in range(max_iter):
        order = np.argsort(fs)
        sim, fs = sim[order], fs[order]
        if np.max(np.abs(sim[1:] - sim[0])) < xtol and abs(fs[-1] - fs[0]) < ftol:
            break
        centroid = sim[:-1].mean(axis=0)
        xr = centroid + alpha * (centroid - sim[-1])
        fr = f(xr)
        if fs[0] <= fr < fs[-2]:
            sim[-1], fs[-1] = xr, fr
        elif fr < fs[0]:
            xe = centroid + gamma * (centroid - sim[-1])
            fe = f(xe)
            if fe < fr:
                sim[-1], fs[-1] = xe, fe
            else:
                sim[-1], fs[-1] = xr, fr
        else:
            xc = centroid + rho * (sim[-1] - centroid)
            fc = f(xc)
            if fc < fs[-1]:
                sim[-1], fs[-1] = xc, fc
            else:
                for i in range(1, len(sim)):
                    sim[i] = sim[0] + sigma * (sim[i] - sim[0])
                    fs[i] = f(sim[i])
    best = int(np.argmin(fs))
    return sim[best], float(fs[best])
