"""Distribution drift detection: PSI and Jensen-Shannon divergence of a
value distribution per key between two time windows.

Training-data-ops operator (no reference analog; the reference's
per-series kernels live in tsfeatures/tsfeatures.py): at 100 TB the
shape is one vectorized binning pass that collapses each batch to
(key, side, bin) count partials, one SMALL exchange over those partials
(keys x 2 x bins rows total), and a per-key map_groups that evaluates
the divergence formulas on dense histograms. Raw values never shuffle.

Pinned conventions (identical in the DuckDB oracle):
- equal-width bins over [lo, hi); bin = clip(floor((v - lo)/w), 0, bins-1)
  with w = (hi - lo)/bins evaluated once and shared as a literal;
- Laplace smoothing p_i = (c_i + 0.5) / (N + 0.5*bins);
- PSI = sum (p - q) ln(p/q); JSD = sum 0.5 p ln(2p/(p+q)) + 0.5 q ln(2q/(p+q))
  (natural log); outputs rounded with the boundary-safe ROUND(x+1e-7, 6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages._util import ts_to_us


def _round6(v: np.ndarray) -> np.ndarray:
    """The repo's shared engine<->oracle rounding: +1e-7 nudge, 6dp,
    half-away-from-zero (mirrors DuckDB ROUND)."""
    v = np.asarray(v, dtype=np.float64) + 1e-7
    return np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6


def distribution_drift(
    ds,
    key: str = "event_type",
    value: str = "value",
    ts: str = "ts",
    split_us: int = 0,
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 16,
):
    """Events Dataset -> one row per key: (key, n_before, n_after, psi,
    jsd) comparing the before-split vs after-split value histograms."""
    w = (hi - lo) / bins

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value].to_numpy(dtype="float64")
        ok = ~np.isnan(v)
        b = np.clip(
            np.floor((v[ok] - lo) / w), 0, bins - 1
        ).astype(np.int64)
        side = (
            ts_to_us(df[ts]).to_numpy()[ok] >= split_us
        ).astype(np.int64)
        out = (
            pd.DataFrame({key: df[key].to_numpy()[ok], "side": side, "bin": b})
            .groupby([key, "side", "bin"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([key, "side", "bin"])
        .sum("n")
    )

    def divergence(g: pd.DataFrame) -> pd.DataFrame:
        c0 = np.zeros(bins, dtype=np.float64)
        c1 = np.zeros(bins, dtype=np.float64)
        n = g["sum(n)"].to_numpy(dtype=np.float64)
        bi = g["bin"].to_numpy(dtype=np.int64)
        s = g["side"].to_numpy(dtype=np.int64)
        np.add.at(c0, bi[s == 0], n[s == 0])
        np.add.at(c1, bi[s == 1], n[s == 1])
        a0, a1 = c0 + 0.5, c1 + 0.5
        p, q = a0 / a0.sum(), a1 / a1.sum()
        psi = float(np.sum((p - q) * np.log(p / q)))
        m2 = p + q
        jsd = float(
            np.sum(0.5 * p * np.log(2 * p / m2) + 0.5 * q * np.log(2 * q / m2))
        )
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "n_before": np.array([c0.sum()], dtype=np.int64),
                "n_after": np.array([c1.sum()], dtype=np.int64),
                "psi": _round6(np.array([psi])),
                "jsd": _round6(np.array([jsd])),
            }
        )

    return counts.groupby(key).map_groups(divergence, batch_format="pandas")
