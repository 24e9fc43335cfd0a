"""Tier compaction exactness + retention expiry (north_rule)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["conv_id", "bucket_us"], kind="mergesort").reset_index(drop=True)
    return df


def test_compact_1m_to_1h_exact(ray_session):
    from tsfeatures_ray.pipelines import rollup_pipeline
    from tsfeatures_ray.stages.retention import compact_tier

    both = rollup_pipeline(SF, tiers=["1m", "1h"]).materialize()
    compacted = compact_tier(both, "1m", "1h").to_pandas()
    direct = both.to_pandas()
    direct = direct[direct["tier"] == "1h"]

    got = _norm(compacted)
    want = _norm(direct)
    assert len(got) == len(want)
    for col in [c for c in want.columns if c.endswith(("_count", "_sum", "_min", "_max", "_last"))]:
        g = got[col].astype("float64").to_numpy()
        w = want[col].astype("float64").to_numpy()
        ok = (g == w) | (np.isnan(g) & np.isnan(w))
        assert ok.all(), f"{col}: {np.flatnonzero(~ok)[:5]}"
    assert (got["bucket_us"].to_numpy() == want["bucket_us"].to_numpy()).all()


def test_compact_1h_to_1d_exact(ray_session):
    from tsfeatures_ray.pipelines import rollup_pipeline
    from tsfeatures_ray.stages.retention import compact_tier

    both = rollup_pipeline(SF, tiers=["1h", "1d"]).materialize()
    compacted = _norm(compact_tier(both, "1h", "1d").to_pandas())
    direct = both.to_pandas()
    direct = _norm(direct[direct["tier"] == "1d"])
    assert len(compacted) == len(direct)
    for col in ("token_len_sum", "token_len_last", "latency_min", "latency_last"):
        g = compacted[col].astype("float64").to_numpy()
        w = direct[col].astype("float64").to_numpy()
        ok = (g == w) | (np.isnan(g) & np.isnan(w))
        assert ok.all(), col


def test_apply_retention_drops_expired_fine_rows(ray_session):
    from tsfeatures_ray.pipelines import rollup_pipeline
    from tsfeatures_ray.stages.retention import apply_retention

    rolled = rollup_pipeline(SF, tiers=["1m", "1d"]).materialize()
    df = rolled.to_pandas()
    # pin "now" so ~half the 1m range is expired
    cut = int(df[df.tier == "1m"]["bucket_us"].quantile(0.5))
    horizon = 86_400_000_000  # 1 day
    now = cut + horizon
    kept = apply_retention(
        rolled, now_us=now, retention_us={"1m": horizon, "1d": None}
    ).to_pandas()
    # all surviving 1m rows are within the horizon
    m = kept[kept.tier == "1m"]
    assert (m["bucket_us"] >= now - horizon).all()
    assert len(m) < len(df[df.tier == "1m"])
    # 1d tier untouched
    assert len(kept[kept.tier == "1d"]) == len(df[df.tier == "1d"])
