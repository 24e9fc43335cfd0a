"""Session windows over a keyed event stream (streaming-shaped operator;
ray_guide pattern: ordered, partitioned log -> per-partition vectorized
windowing; the reference has no streaming surface, SURVEY.md §2.7).

A session = maximal run of a key's events where consecutive gaps are
<= ``gap_us``. Assignment is a vectorized cumsum of gap breaks inside
the per-key hash partition -- no per-key Python loop, one shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages._util import ts_to_us
from ..stages.derive import default_num_parts, stable_part


def sessionize(
    ds,
    key: str = "user_id",
    ts: str = "ts",
    order: str = "event_id",
    value: str = "value",
    gap_us: int = 30 * 60 * 1_000_000,
    num_parts: int | None = None,
):
    """Events Dataset -> one row per (key, session): session_start,
    session_end, n_events, value_sum."""
    if num_parts is None:
        num_parts = default_num_parts()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = stable_part(df[key].to_numpy(), num_parts)
        return df

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order], kind="mergesort")
        ts_us = ts_to_us(g[ts]).to_numpy()
        keys = g[key].to_numpy()
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        gap_break = np.r_[True, (ts_us[1:] - ts_us[:-1]) > gap_us]
        session_id = np.cumsum(new_key | gap_break)
        out = (
            g.assign(_sid=session_id, _ts_us=ts_us)
            .groupby([key, "_sid"], sort=False)
            .agg(
                session_start=("_ts_us", "min"),
                session_end=("_ts_us", "max"),
                n_events=(order, "size"),
                value_sum=(value, "sum"),
            )
            .reset_index()
        )
        # session index within key (1-based, by start time)
        out = out.sort_values([key, "session_start"], kind="mergesort")
        out["session_idx"] = out.groupby(key, sort=False).cumcount() + 1
        out["session_start"] = out["session_start"].astype("datetime64[us]")
        out["session_end"] = out["session_end"].astype("datetime64[us]")
        out["n_events"] = out["n_events"].astype("int64")
        out["value_sum"] = out["value_sum"].round(6)
        return out[[key, "session_idx", "session_start", "session_end",
                    "n_events", "value_sum"]]

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(windows, batch_format="pandas")
    )
