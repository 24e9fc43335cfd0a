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
import pyarrow as pa


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


def ks_exponential(ds, col: str, num_parts: int | None = None):
    """Distributed one-sample Kolmogorov-Smirnov goodness-of-fit test of
    ``col`` against an exponential with MLE rate (1/mean): ONE row
    (n, mean_value, ks_d) with D = sup_i max(i/n - F(x_i),
    F(x_i) - (i-1)/n). Global ranks come from the contiguous
    range-partition + broadcast-base prefix-sum (equal values share a
    partition, and the sup over tied rows is attained at the tie's
    extreme ranks, so tie order cannot change D). Only per-partition
    maxima reach the final reduce."""
    import ray
    import ray.data as rd

    from ..stages.derive import default_num_parts

    if num_parts is None:
        num_parts = default_num_parts()

    agg = ds.aggregate(
        rd.aggregate.Count(),
        rd.aggregate.Sum(col),
        rd.aggregate.Min(col),
        rd.aggregate.Max(col),
    )
    n = int(agg["count()"])
    if n == 0:
        return rd.from_arrow(
            pa.schema(
                [("n", pa.int64()), ("mean_value", pa.float64()),
                 ("ks_d", pa.float64())]
            ).empty_table()
        )
    mu = float(agg[f"sum({col})"]) / n
    lo, hi = float(agg[f"min({col})"]), float(agg[f"max({col})"])
    span = max((hi - lo) / num_parts, 1e-300)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        p = np.minimum(
            np.floor((v - lo) / span), num_parts - 1
        ).astype(np.int64)
        return pd.DataFrame({"x": v, "part": p})

    parted = ds.map_batches(add_part, batch_format="pandas").materialize()
    counts = (
        parted.groupby("part")
        .count()
        .to_pandas()
        .sort_values("part")
    )
    base = dict(
        zip(
            counts["part"].to_numpy(),
            np.concatenate(
                ([0], np.cumsum(counts["count()"].to_numpy())[:-1])
            ),
        )
    )
    base_ref = ray.put(base)

    def local_d(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"dp": pd.Series([], dtype="float64"),
                 "dm": pd.Series([], dtype="float64")}
            )
        b = ray.get(base_ref)[int(g["part"].iloc[0])]
        x = np.sort(g["x"].to_numpy())
        i = b + np.arange(1, len(x) + 1, dtype=np.float64)
        f = 1.0 - np.exp(-x / mu)
        return pd.DataFrame(
            {
                "dp": [float(np.max(i / n - f))],
                "dm": [float(np.max(f - (i - 1) / n))],
            }
        )

    parts = parted.groupby("part").map_groups(local_d, batch_format="pandas")
    m = parts.aggregate(
        rd.aggregate.Max("dp"), rd.aggregate.Max("dm")
    )
    d = max(float(m["max(dp)"]), float(m["max(dm)"]))
    out = pd.DataFrame(
        {
            "n": np.array([n], dtype=np.int64),
            "mean_value": _round6(np.array([mu])),
            "ks_d": _round6(np.array([d])),
        }
    )
    return rd.from_arrow(pa.Table.from_pandas(out))
