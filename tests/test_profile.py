"""profile_table: brute pandas parity over a mixed-type frame with
nulls, exact-distinct correctness under repartitioning, and canonical
float rendering (distinct floats that stringify identically naively)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_profile_table_matches_brute(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.profile import profile_table

    rng = np.random.RandomState(9)
    n = 500
    df = pd.DataFrame(
        {
            "i": rng.randint(0, 40, size=n).astype(np.int64),
            "f": rng.randn(n) * 10,
            "s": rng.choice(["a", "bb", "ccc", None], size=n),
            "t": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 72, size=n), unit="h"),
        }
    )
    df.loc[rng.choice(n, 30, replace=False), "f"] = np.nan
    # two floats that are distinct values but equal under str() rounding
    df.loc[0, "f"] = 0.1 + 0.2
    df.loc[1, "f"] = 0.30000000000000004  # same value, same distinct
    df.loc[2, "f"] = 0.3                  # DIFFERENT value
    df["t"] = df["t"].astype("datetime64[us]")

    got = (
        profile_table(rd.from_pandas(df).repartition(9), num_parts=5)
        .to_pandas()
        .sort_values("column")
        .set_index("column")
    )
    for c in df.columns:
        r = got.loc[c]
        assert r["n"] == n
        assert r["n_nulls"] == int(df[c].isna().sum())
        assert r["n_distinct"] == df[c].dropna().nunique(), c
        if df[c].dtype.kind in "if":
            assert r["vmin"] == float(df[c].min())
            assert r["vmax"] == float(df[c].max())
        else:
            assert np.isnan(r["vmin"]) and np.isnan(r["vmax"])
    # the repr-canonical rendering keeps 0.3 and 0.1+0.2 distinct
    assert got.loc["f", "n_distinct"] >= 2
