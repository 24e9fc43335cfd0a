"""Compression round-trip identity (north_rule gate): delta-of-delta +
Gorilla XOR encode->decode == identity, bit-exact, including NaN."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsfeatures_ray.stages.compress import decode_block, encode_block


def roundtrip(ts, vals):
    blk = encode_block(np.asarray(ts, np.int64), np.asarray(vals, np.float64))
    ts2, vals2 = decode_block(blk)
    np.testing.assert_array_equal(np.asarray(ts, np.int64), ts2)
    # bit-exact including NaN payloads
    np.testing.assert_array_equal(
        np.asarray(vals, np.float64).view(np.uint64), vals2.view(np.uint64)
    )
    return blk


def test_empty_and_singleton():
    roundtrip([], [])
    roundtrip([1_700_000_000_000_000], [3.14])


def test_regular_minute_buckets_compress_well():
    n = 5000
    ts = 1_700_000_000_000_000 + 60_000_000 * np.arange(n)
    vals = np.round(100 + 10 * np.sin(np.arange(n) / 7.0))
    blk = roundtrip(ts, vals)
    raw = n * 16
    assert len(blk) < raw / 4  # regular cadence + smooth values compress >4x


def test_irregular_with_duplicates_and_nan():
    rng = np.random.RandomState(0)
    gaps = rng.randint(0, 10_000_000, size=999)
    gaps[::37] = 0  # duplicate timestamps
    ts = np.concatenate([[1_700_000_000_000_000], 1_700_000_000_000_000 + np.cumsum(gaps)])
    vals = rng.randn(1000) * 1e6
    vals[::11] = np.nan
    vals[::13] = 0.0
    roundtrip(ts, vals)


def test_negative_and_huge_deltas():
    ts = np.array([0, 10**15, 10**15 + 1, 5, 6, 7], dtype=np.int64)
    vals = np.array([1.0, -1.0, np.inf, -np.inf, 1e-308, 0.0])
    roundtrip(ts, vals)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=60),
    st.integers(min_value=0, max_value=2**31),
)
def test_roundtrip_property(gaps, start):
    ts = np.concatenate([[start], start + np.cumsum(np.asarray(gaps, np.int64))]) \
        if gaps else np.array([start], dtype=np.int64)
    rng = np.random.RandomState(abs(start) % (2**32))
    vals = rng.randn(len(ts)) * 10.0 ** rng.randint(-3, 6)
    roundtrip(ts, vals)


def test_compress_stage_over_rollup(ray_session):
    from tsfeatures_ray.pipelines import rollup_pipeline
    from tsfeatures_ray.stages.compress import compress_rollup

    rolled = rollup_pipeline("/root/testdata/sf0.001", tiers=["1h"])
    blocks = compress_rollup(rolled, metric="token_len_sum").to_pandas()
    assert len(blocks) > 0
    raw = rolled.to_pandas()
    # decode every block and compare against the rollup table
    for _, row in blocks.sample(min(20, len(blocks)), random_state=1).iterrows():
        ts, vals = decode_block(row["block"])
        sub = raw[(raw["conv_id"] == row["conv_id"]) & (raw["tier"] == row["tier"])]
        sub = sub.sort_values("bucket_us")
        np.testing.assert_array_equal(ts, sub["bucket_us"].to_numpy())
        np.testing.assert_array_equal(
            vals, sub["token_len_sum"].to_numpy(dtype="float64", na_value=np.nan)
        )
