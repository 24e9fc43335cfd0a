"""Small shared helpers for pipeline stages."""

from __future__ import annotations

import numpy as np
import pandas as pd


def ts_to_us(s: pd.Series) -> pd.Series:
    """Epoch microseconds from a pandas datetime series regardless of the
    underlying unit (pandas may hold datetime64[us] or [ns] depending on
    the Arrow conversion path)."""
    dt = s.dtype
    if isinstance(dt, pd.DatetimeTZDtype):  # not expected; keep UTC-naive
        s = s.dt.tz_localize(None)
        dt = s.dtype
    unit = np.datetime_data(dt)[0] if dt.kind == "M" else None
    iv = s.astype("int64")
    if unit == "ns":
        return iv // 1000
    if unit == "us" or unit is None:
        return iv
    if unit == "ms":
        return iv * 1000
    if unit == "s":
        return iv * 1_000_000
    raise ValueError(f"unsupported datetime unit: {unit}")
