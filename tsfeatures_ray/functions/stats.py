"""Statistical data-quality audits: Benford first-digit analysis and a
chi-square test of independence between two categorical columns.

Data-ops operators (no reference analog; the reference's statistical
surface is per-series, tsfeatures/tsfeatures.py): both collapse each
batch to tiny categorical count partials inside map_batches, so the
exchanges are bounded by the category cardinality (9 digits; |A| x |B|
cells) regardless of row count -- the 100 TB shape for whole-table
audits. Formulas and rounding (+1e-7 nudge, 6dp) are pinned identically
in the DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _round6(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.float64) + 1e-7
    return np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6


def benford_audit(ds, col: str, scale: int = 100):
    """First-significant-digit distribution of ``col`` (converted to
    exact integers via the repo's cents convention: rint(x * scale))
    against Benford's law. One row per digit 1-9: observed n, expected
    count N * log10(1 + 1/d), and the chi-square contribution
    (n - e)^2 / e. Non-positive values are excluded (they have no
    Benford digit). Leading digits come from exact integer division
    (the oracle reads the first character of the integer's string), so
    no float log is involved in the digit itself."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        c = np.rint(v * scale).astype(np.int64)
        c = c[c > 0]
        while (c >= 10).any():
            big = c >= 10
            c[big] //= 10
        out = (
            pd.Series(c, name="digit")
            .value_counts()
            .rename("n")
            .rename_axis("digit")
            .reset_index()
        )
        out["digit"] = out["digit"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("digit")
        .sum("n")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("digit")
        n = df["sum(n)"].to_numpy(dtype=np.float64)
        d = df["digit"].to_numpy(dtype=np.float64)
        tot = n.sum()
        e = tot * np.log10(1.0 + 1.0 / d)
        return pd.DataFrame(
            {
                "digit": df["digit"].astype(np.int64),
                "n": df["sum(n)"].astype(np.int64),
                "expected": _round6(e),
                "chi2_contrib": _round6((n - e) ** 2 / e),
            }
        )

    # the merged frame is <= 9 rows; repartition(1) + batch_size=None
    # guarantees finish sees ALL digits in one batch (groupby output
    # block count tracks input blocks, so a bare map_batches could split)
    return merged.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )


def chi2_independence(ds, col_a: str, col_b: str):
    """Pearson chi-square test of independence between two categorical
    columns: ONE row (chi2, dof, n). Every (a, b) cell of the DENSE
    contingency table contributes (o - e)^2 / e with
    e = row_total * col_total / n (zero-observation cells included --
    they contribute e). dof = (|A| - 1) * (|B| - 1)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby([col_a, col_b], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([col_a, col_b])
        .sum("n")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(
            index=col_a, columns=col_b, values="sum(n)", fill_value=0,
            aggfunc="sum",
        ).sort_index(axis=0).sort_index(axis=1)
        obs = piv.to_numpy(dtype=np.int64)
        n = obs.sum()
        row = obs.sum(axis=1)
        colt = obs.sum(axis=0)
        e = (np.outer(row, colt)).astype(np.float64) / float(n)
        chi2 = float(((obs - e) ** 2 / e).sum())
        dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
        return pd.DataFrame(
            {
                "chi2": _round6(np.array([chi2])),
                "dof": np.array([dof], dtype=np.int64),
                "n": np.array([n], dtype=np.int64),
            }
        )

    # |A| x |B| cells; one block so the dense table assembles whole
    return merged.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
