"""Stage 2: continuous aggregates (rollups) at 1m/1h/1d retention tiers.

Scalable shape (SURVEY.md §7 step 3): the full derived table is NEVER
re-shuffled. A stateless ``map_batches`` computes PARTIAL aggregates per
(conv_id, tier, bucket) inside each batch -- count/sum/min/max are
associative, and ``last`` carries its (ts, turn_idx) ordering key so
partials merge exactly (merge-on-read). Only the partials (orders of
magnitude smaller than the input) go through the final
``groupby("part").map_groups`` merge, which also gap-fills each
conversation's bucket range when asked.

This replaces the reference's single-shot in-memory pandas aggregation
model (tsfeatures.py:970-976 materializes the whole panel on the
driver); at 10^12 turns the partial/merge split is what keeps the
shuffle tractable, and salting/splitting a hot conv_id is safe because
partials merge associatively.

Aggregate semantics (exact, north_rule):
- token_len_*: over every turn in the bucket;
- latency_*: over non-null latencies (turn 0 of a conv has none);
- *_last: value at the turn with max (ts, turn_idx) in the bucket;
- gap rows (gapfill=True): every tier bucket between a conversation's
  first and last bucket exists; counts are 0, other aggregates NULL,
  ``filled`` is true.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..schema import TIERS, Tier
from ._util import ts_to_us
from .derive import default_num_parts, stable_part

_AGG_COLS = [
    "token_len_count",
    "token_len_sum",
    "token_len_min",
    "token_len_max",
    "token_len_last",
    "latency_count",
    "latency_sum",
    "latency_min",
    "latency_max",
    "latency_last",
]


def _partial_one_tier(df: pd.DataFrame, tier: Tier) -> pd.DataFrame:
    w = tier.bucket_us
    bucket = df["ts_us"] - df["ts_us"] % w
    g = df.assign(bucket_us=bucket)
    # sort so 'last' within each (conv,bucket) is the max (ts, turn_idx)
    g = g.sort_values(["conv_id", "bucket_us", "ts_us", "turn_idx"], kind="mergesort")
    gb = g.groupby(["conv_id", "bucket_us"], sort=False)
    out = gb.agg(
        token_len_count=("token_len", "size"),
        token_len_sum=("token_len", "sum"),
        token_len_min=("token_len", "min"),
        token_len_max=("token_len", "max"),
        latency_count=("latency_us", "count"),
        latency_sum=("latency_us", "sum"),
        latency_min=("latency_us", "min"),
        latency_max=("latency_us", "max"),
        last_ts=("ts_us", "last"),
        last_turn_idx=("turn_idx", "last"),
        token_len_last=("token_len", "last"),
        latency_last=("latency_us", "last"),
    ).reset_index()
    out.loc[out["latency_count"] == 0, "latency_sum"] = pd.NA
    out["tier"] = tier.name
    return out


def _partial_agg(tiers: list[Tier]):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["conv_id", "turn_idx", "ts", "token_len", "latency_us"]].copy()
        df["ts_us"] = ts_to_us(df["ts"])
        parts = [_partial_one_tier(df, t) for t in tiers]
        return pd.concat(parts, ignore_index=True)

    return fn


def _gapfill_partition(merged: pd.DataFrame, tier_widths: dict[str, int]) -> pd.DataFrame:
    """Densify bucket ranges per (conv_id, tier) -- vectorized, no
    per-conversation Python loop."""
    pieces = [merged.assign(filled=False)]
    for tname, w in tier_widths.items():
        sub = merged[merged["tier"] == tname]
        if len(sub) == 0:
            continue
        spans = sub.groupby("conv_id")["bucket_us"].agg(["min", "max"])
        nb = ((spans["max"] - spans["min"]) // w + 1).astype(np.int64)
        total = int(nb.sum())
        if total == len(sub):  # no gaps in this tier
            continue
        conv_rep = np.repeat(spans.index.to_numpy(), nb.to_numpy())
        # per-conv arange of buckets, concatenated
        offs = np.concatenate([np.arange(k, dtype=np.int64) for k in nb.to_numpy()])
        buckets = np.repeat(spans["min"].to_numpy(), nb.to_numpy()) + offs * w
        full = pd.DataFrame({"conv_id": conv_rep, "bucket_us": buckets})
        # vectorized anti-join: which (conv, bucket) slots are missing
        probe = full.merge(
            sub[["conv_id", "bucket_us"]].assign(_hit=1),
            on=["conv_id", "bucket_us"],
            how="left",
        )
        gaps = full[probe["_hit"].isna().to_numpy()]
        if len(gaps) == 0:
            continue
        gaps = gaps.assign(tier=tname, filled=True)
        for col in _AGG_COLS:
            gaps[col] = 0 if col.endswith("_count") else pd.NA
        pieces.append(gaps)
    out = pd.concat(pieces, ignore_index=True)
    return out


def _final_merge(gapfill: bool, tier_widths: dict[str, int]):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["conv_id", "tier", "bucket_us", "last_ts", "last_turn_idx"],
            kind="mergesort",
        )
        gb = g.groupby(["conv_id", "tier", "bucket_us"], sort=False)
        merged = gb.agg(
            token_len_count=("token_len_count", "sum"),
            token_len_sum=("token_len_sum", "sum"),
            token_len_min=("token_len_min", "min"),
            token_len_max=("token_len_max", "max"),
            latency_count=("latency_count", "sum"),
            latency_sum=("latency_sum", "sum"),
            latency_min=("latency_min", "min"),
            latency_max=("latency_max", "max"),
            token_len_last=("token_len_last", "last"),
            latency_last=("latency_last", "last"),
            last_ts=("last_ts", "last"),
            last_turn_idx=("last_turn_idx", "last"),
        ).reset_index()
        merged.loc[merged["latency_count"] == 0, "latency_sum"] = pd.NA
        merged = merged.drop(columns=["last_ts", "last_turn_idx"])
        if gapfill:
            merged = _gapfill_partition(merged, tier_widths)
        else:
            merged = merged.assign(filled=False)
        # presentation: bucket as timestamp[us]; counts as int64
        merged["bucket"] = merged["bucket_us"].astype("datetime64[us]")
        for c in ("latency_sum", "latency_min", "latency_max", "latency_last",
                  "token_len_sum", "token_len_min", "token_len_max", "token_len_last"):
            merged[c] = merged[c].astype("Int64")
        for c in ("token_len_count", "latency_count"):
            merged[c] = merged[c].astype("int64")
        cols = ["conv_id", "tier", "bucket", "bucket_us"] + _AGG_COLS + ["filled"]
        return merged[cols]

    return fn


def rollup(
    derived: "ray.data.Dataset",
    tiers: list[str] | None = None,
    gapfill: bool = False,
    num_parts: int | None = None,
) -> "ray.data.Dataset":
    """Derived per-turn Dataset -> rollup Dataset at the given tiers."""
    tier_objs = [TIERS[t] for t in (tiers or list(TIERS))]
    tier_widths = {t.name: t.bucket_us for t in tier_objs}
    if num_parts is None:
        num_parts = default_num_parts()

    partials = derived.map_batches(
        _partial_agg(tier_objs), batch_format="pandas", batch_size=65536
    )

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df["part"] = stable_part(df["conv_id"].to_numpy(), num_parts)
        return df

    partials = partials.map_batches(add_part, batch_format="pandas")
    return partials.groupby("part").map_groups(
        _final_merge(gapfill, tier_widths), batch_format="pandas"
    )


def gapfill_rollup(rollup_ds: "ray.data.Dataset", num_parts: int | None = None):
    """Densify an existing (sparse) rollup Dataset."""
    if num_parts is None:
        num_parts = default_num_parts()
    tier_widths = {t.name: t.bucket_us for t in TIERS.values()}

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["conv_id", "tier", "bucket", "bucket_us"] + _AGG_COLS + ["filled"]
        out = _gapfill_partition(g.drop(columns=["filled", "bucket", "part"]), tier_widths)
        out["bucket"] = out["bucket_us"].astype("datetime64[us]")
        return out[cols]

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df["part"] = stable_part(df["conv_id"].to_numpy(), num_parts)
        return df

    ds = rollup_ds.map_batches(add_part, batch_format="pandas")
    return ds.groupby("part").map_groups(fn, batch_format="pandas")
