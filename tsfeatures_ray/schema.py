"""Pinned Arrow schemas and tier configuration.

The input table shape comes from BASELINE.json ``input_hint``:
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]``. Schemas are pinned explicitly -- no runtime inference
(the reference infers frequency from `ds` at tsfeatures.py:898-913; our
engine replaces that with fixed per-tier seasonal periods below).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# per-turn derived metrics (stage: derive)
DERIVED_SCHEMA = pa.schema(
    list(TRANSCRIPT_SCHEMA)
    + [
        ("token_len", pa.int64()),
        # float64, NaN for turn 0 of each conv: nullable ints would need a
        # masked extension dtype in pandas, which does not hash like an
        # Arrow primitive at the contract boundary
        ("latency_us", pa.float64()),
    ]
)

# rollup rows (stage: rollup), one row per (conv_id, tier, bucket)
ROLLUP_VALUE_COLS = ("token_len", "latency_us")
ROLLUP_AGGS = ("count", "sum", "min", "max", "last")


@dataclass(frozen=True)
class Tier:
    """A retention tier: bucket width + the seasonal period used when the
    feature kernels run over this tier's rollup series (the analog of the
    reference FREQS dict, utils.py:15-17)."""

    name: str
    bucket_us: int
    freq: int  # seasonal period for feature kernels over this tier


TIERS: dict[str, Tier] = {
    "1m": Tier("1m", 60_000_000, 60),  # minute buckets; 60-of-hour seasonality
    "1h": Tier("1h", 3_600_000_000, 24),  # hour buckets; 24-of-day seasonality
    "1d": Tier("1d", 86_400_000_000, 1),  # day buckets; nonseasonal
}
