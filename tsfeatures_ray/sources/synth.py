"""Deterministic synthetic transcript table (the engine's input shape).

The driver's testdata has no transcripts table, so per the driver note we
synthesize one deterministically per scale factor -- schema exactly
BASELINE.json ``input_hint``. Everything is seeded (seed=42 ^ sf), fully
reproducible, vectorized, and cached as Parquet under /tmp so the Ray
pipeline and the DuckDB oracle SQL read the *same file*.

Per-conversation ``len(text)`` follows trend + seasonal + noise
components so the feature kernels see non-degenerate series; inter-turn
gaps are log-normal-ish and strictly non-negative with occasional exact
duplicates of ``ts`` (distinct ``turn_idx``) to exercise the
last-value tie-break. Rows are interleaved across conversations so the
engine's shuffle + stable (conv_id, turn_idx) ordering is actually
tested (FIXTURES.md §1).

Edge cases baked in (mirroring the reference's small-series tests,
tests/test_small_ts.py / test_sparsity.py): 1-turn and 2-turn
conversations, an empty-text (all-zero token_len) conversation, a
constant-length conversation, and one "hot" conversation with ~3% of
all rows (skew / salted-repartition path).
"""

from __future__ import annotations

import os
import string

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import TRANSCRIPT_SCHEMA

CACHE_ROOT = os.environ.get("TSF_RAY_SYNTH_DIR", "/tmp/tsfeatures_ray_synth")
_EPOCH_START_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

# deterministic text pool: letters+digits+space, long enough to slice from
_POOL = (string.ascii_lowercase + string.digits + " ") * 40  # 1480 chars
_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["", "search", "python", "browser", "calculator"])


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001


def generate_transcripts(sf: float, seed: int = 42) -> pa.Table:
    """Build the transcript table for scale factor ``sf`` (~6M rows/sf=1)."""
    rng = np.random.Generator(np.random.PCG64(seed + int(sf * 1_000_000)))
    target_rows = max(2_000, int(6_000_000 * sf))
    mean_turns = 45

    # --- conversation lengths: heavy-tailed + fixed edge cases ---------
    n_convs = max(8, target_rows // mean_turns)
    lengths = np.minimum(
        rng.geometric(1.0 / mean_turns, size=n_convs), 600
    ).astype(np.int64)
    # edge conversations (fixed lengths, deterministic positions 0..4)
    lengths[0] = 1          # n=1: all features NaN, no crash
    lengths[1] = 2          # n=2
    lengths[2] = 30         # empty-text conversation (token_len == 0)
    lengths[3] = 40         # constant-length conversation
    lengths[4] = max(int(0.03 * target_rows), 200)  # hot conversation (skew)

    n_rows = int(lengths.sum())
    conv_ids = np.repeat([f"conv{i:07d}" for i in range(n_convs)], lengths)
    turn_idx = np.concatenate([np.arange(l, dtype=np.int32) for l in lengths])
    conv_of_row = np.repeat(np.arange(n_convs), lengths)

    # --- roles / tools -------------------------------------------------
    role_draw = rng.random(n_rows)
    roles = np.where(
        role_draw < 0.08, "tool", np.where(turn_idx % 2 == 0, "user", "assistant")
    )
    tools = np.where(
        roles == "tool", _TOOLS[1 + (rng.integers(0, 4, size=n_rows))], ""
    )

    # --- token_len: per-conv trend + seasonal + noise ------------------
    conv_base = rng.integers(20, 180, size=n_convs).astype(float)
    conv_trend = rng.normal(0.0, 0.8, size=n_convs)
    conv_amp = rng.uniform(0.0, 30.0, size=n_convs)
    conv_period = rng.integers(5, 30, size=n_convs).astype(float)
    t = turn_idx.astype(float)
    token_len = (
        conv_base[conv_of_row]
        + conv_trend[conv_of_row] * t
        + conv_amp[conv_of_row] * np.sin(2 * np.pi * t / conv_period[conv_of_row])
        + rng.normal(0.0, 8.0, size=n_rows)
    )
    token_len = np.clip(np.round(token_len), 1, 1400).astype(np.int64)
    # edge conv 2: all-empty text; edge conv 3: constant length
    token_len[conv_of_row == 2] = 0
    token_len[conv_of_row == 3] = 64

    # --- text: deterministic slice of the pool, len(text) == token_len -
    offsets = rng.integers(0, 64, size=n_rows)
    texts = [_POOL[o : o + l] for o, l in zip(offsets, token_len)]

    # --- timestamps: per-conv start + cumulative irregular gaps --------
    conv_start = (
        _EPOCH_START_US
        + rng.integers(0, 30 * 86_400_000_000, size=n_convs)  # within 30 days
    )
    gaps = np.exp(rng.normal(3.2, 1.1, size=n_rows))  # seconds, median ~25s
    gaps_us = (gaps * 1_000_000).astype(np.int64)
    gaps_us[turn_idx == 0] = 0
    # ~2% exact-duplicate timestamps (distinct turn_idx) for the
    # last-value tie-break path; never on turn 0
    dup = (rng.random(n_rows) < 0.02) & (turn_idx > 0)
    gaps_us[dup] = 0
    # cumulative sum within each conversation (vectorized segmented cumsum)
    cum = np.cumsum(gaps_us)
    first_row_of_conv = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    base = cum[first_row_of_conv] - gaps_us[first_row_of_conv]
    ts = conv_start[conv_of_row] + (cum - base[conv_of_row])

    # --- interleave rows across conversations --------------------------
    perm = rng.permutation(n_rows)
    table = pa.table(
        {
            "conv_id": pa.array(np.asarray(conv_ids)[perm], type=pa.string()),
            "turn_idx": pa.array(turn_idx[perm], type=pa.int32()),
            "role": pa.array(roles[perm], type=pa.string()),
            "text": pa.array([texts[i] for i in perm], type=pa.string()),
            "tool": pa.array(tools[perm], type=pa.string()),
            "ts": pa.array(ts[perm], type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    return table


def transcripts_path(sf_dir: str) -> str:
    """Path of the cached transcript Parquet for a testdata sf dir;
    generates it on first use (atomic rename so concurrent callers are
    safe)."""
    sf = _sf_from_dir(sf_dir)
    out_dir = os.path.join(CACHE_ROOT, f"sf{sf:g}")
    out = os.path.join(out_dir, "transcripts.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        tmp = out + f".tmp.{os.getpid()}"
        pq.write_table(generate_transcripts(sf), tmp, row_group_size=64 * 1024)
        os.replace(tmp, out)
    return out
