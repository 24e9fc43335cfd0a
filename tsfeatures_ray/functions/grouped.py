"""Grouped top-k: the k best rows per group under a deterministic
(order_col, tie_cols) ordering (SURVEY.md §2.6 sort/limit family;
SQL ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC, tie) <= k``).

Scale shape (same partial/merge split as every aggregation here): each
input batch is pruned to at most k rows per group BEFORE the exchange
(one C-speed sort + ``groupby(...).head(k)``), so the shuffle moves at
most ``k × groups-per-batch`` rows, never the raw table; the final
per-partition pass re-sorts the survivors and takes the true top k.
The exchange key is the bounded ``stable_part(group) % num_parts`` --
never a raw high-cardinality group key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.derive import default_num_parts, stable_part


def grouped_top_k(
    ds,
    group: str | list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: list[str] | None = None,
    num_parts: int | None = None,
):
    """Top-k rows per group, with a ``rk`` column (1-based rank).

    ``tie_cols`` (always ascending) make the ordering total -- required
    for a hash-exact contract; without them, rows tying on
    ``order_col`` beyond rank k are dropped arbitrarily.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    gcols = [group] if isinstance(group, str) else list(group)
    ties = tie_cols or []
    sort_cols = gcols + [order_col] + ties
    ascending = [True] * len(gcols) + [not descending] + [True] * len(ties)
    if num_parts is None:
        num_parts = default_num_parts()

    def _part(df: pd.DataFrame) -> np.ndarray:
        if len(gcols) == 1:
            return stable_part(df[gcols[0]].to_numpy(), num_parts)
        h = pd.util.hash_pandas_object(df[gcols], index=False).to_numpy()
        return (h % np.uint64(num_parts)).astype(np.int64)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .groupby(gcols, sort=False)
            .head(k)
            .copy()
        )
        out["part"] = _part(out)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop(columns="part")
            .sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .groupby(gcols, sort=False)
            .head(k)
            .reset_index(drop=True)
        )
        out["rk"] = out.groupby(gcols, sort=False).cumcount() + 1
        return out

    return (
        ds.map_batches(prune, batch_format="pandas", batch_size=65536)
        .groupby("part")
        .map_groups(final, batch_format="pandas")
    )
