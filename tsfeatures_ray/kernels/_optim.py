"""Tiny derivative-free optimizers (scipy is not available).

``nelder_mead`` is a standard Nelder-Mead simplex implementation used by
the ETS (Holt / Holt-Winters) and GARCH kernels in place of
scipy.optimize / statsmodels' internal optimizers. It is written with
plain-Python small-vector math: for the 2-4 dimensional objectives the
kernels use, numpy's per-op overhead would dominate the whole search.
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
    x0l = [float(v) for v in np.asarray(x0, dtype=float)]
    n = len(x0l)

    def call(p: list[float]) -> float:
        return float(f(np.asarray(p)))

    sim = [x0l]
    for i in range(n):
        p = list(x0l)
        p[i] += step if p[i] == 0 else step * max(abs(p[i]), 1.0)
        sim.append(p)
    fs = [call(p) for p in sim]

    alpha, gamma, rho, sigma = 1.0, 2.0, 0.5, 0.5
    for _ in range(max_iter):
        order = sorted(range(n + 1), key=fs.__getitem__)
        sim = [sim[i] for i in order]
        fs = [fs[i] for i in order]
        best, worst = sim[0], sim[-1]
        spread = max(
            abs(sim[j][i] - best[i]) for j in range(1, n + 1) for i in range(n)
        )
        if spread < xtol and abs(fs[-1] - fs[0]) < ftol:
            break
        centroid = [
            sum(sim[j][i] for j in range(n)) / n for i in range(n)
        ]
        xr = [centroid[i] + alpha * (centroid[i] - worst[i]) for i in range(n)]
        fr = call(xr)
        if fs[0] <= fr < fs[-2]:
            sim[-1], fs[-1] = xr, fr
        elif fr < fs[0]:
            xe = [centroid[i] + gamma * (centroid[i] - worst[i]) for i in range(n)]
            fe = call(xe)
            if fe < fr:
                sim[-1], fs[-1] = xe, fe
            else:
                sim[-1], fs[-1] = xr, fr
        else:
            xc = [centroid[i] + rho * (worst[i] - centroid[i]) for i in range(n)]
            fc = call(xc)
            if fc < fs[-1]:
                sim[-1], fs[-1] = xc, fc
            else:
                for j in range(1, n + 1):
                    sim[j] = [
                        best[i] + sigma * (sim[j][i] - best[i]) for i in range(n)
                    ]
                    fs[j] = call(sim[j])
    k = min(range(n + 1), key=fs.__getitem__)
    return np.asarray(sim[k]), float(fs[k])
