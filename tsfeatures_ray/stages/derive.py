"""Stage 1: per-turn derived metrics (token length, inter-turn latency).

Ray-Data-first layout:

1. a stateless ``map_batches`` (pyarrow, zero-copy) computes
   ``token_len = utf8_length(text)`` and a stable partition key
   ``part = stable_hash(conv_id) % P`` -- the ONE partitioning key the
   whole engine reuses (SURVEY.md §7);
2. ``groupby("part").map_groups`` (the engine's single full-data
   shuffle) sorts each partition by (conv_id, ts, turn_idx) and computes
   ``latency_us = ts - lag(ts)`` per conversation with vectorized pandas
   (no per-conversation Python calls -- one vectorized pass per
   partition, so tiny conversations cost nothing extra).

Partitioning assumption (documented per SURVEY.md §2 custom-operator
rule): all rows of one conv_id land in one partition; within a
partition, rows are ordered by (conv_id, ts, turn_idx). Downstream
rollup / packing relies only on per-row values, not on this ordering,
because its aggregates are merge-on-read associative partials.

The reference analog is the per-group ``_get_feats`` prep
(tsfeatures.py:887-928) plus m4_data's sort (m4_data.py:106); there it
is a driver-side pandas groupby -- here it is a streaming shuffle that
scales to arbitrarily many conversations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def stable_part(conv_ids, num_parts: int) -> np.ndarray:
    """Deterministic partition id per conv_id (stable across processes;
    pandas' fixed-key siphash, NOT Python hash())."""
    arr = np.asarray(conv_ids, dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(num_parts)).astype(np.int64)


def default_num_parts(n_rows: int | None = None) -> int:
    """Partition count: ~2 partitions per CPU, more when the data is big
    enough that a partition would exceed ~250k rows."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    parts = cpus * 2
    if n_rows:
        parts = max(parts, n_rows // 250_000)
    return max(4, parts)


def _add_token_len_and_part(num_parts: int):
    def fn(batch: pa.Table) -> pa.Table:
        token_len = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        part = stable_part(batch["conv_id"].to_numpy(zero_copy_only=False), num_parts)
        return batch.append_column("token_len", token_len).append_column(
            "part", pa.array(part, type=pa.int64())
        )

    return fn


def _latency_per_partition(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    ts_us = g["ts"].astype("int64")
    same_conv = g["conv_id"].eq(g["conv_id"].shift())
    lat = ts_us.diff()
    lat[~same_conv] = np.nan
    # plain float64 (NaN for turn 0), NOT pandas' masked-Int64 extension
    # dtype: extension arrays serialize differently from Arrow primitives
    # and break value-hash comparison at the contract boundary
    g["latency_us"] = lat.astype("float64")
    return g


def derive_turn_metrics(
    ds: "ray.data.Dataset",
    num_parts: int | None = None,
    slim: bool = False,
) -> "ray.data.Dataset":
    """transcripts Dataset -> per-turn derived Dataset
    (schema.DERIVED_SCHEMA + the reusable ``part`` column).

    ``slim=True`` drops the payload columns (role/text/tool) BEFORE the
    shuffle: the rollup path only needs (conv_id, turn_idx, ts,
    token_len), so shipping text through the exchange would multiply the
    shuffle volume several-fold for nothing. The full variant exists for
    per-turn products that must carry text (the per-row text-equality
    invariant is checked against that path).
    """
    if num_parts is None:
        num_parts = default_num_parts()
    ds = ds.map_batches(
        _add_token_len_and_part(num_parts),
        batch_format="pyarrow",
        batch_size=65536,
    )
    if slim:
        ds = ds.select_columns(["conv_id", "turn_idx", "ts", "token_len", "part"])
    return ds.groupby("part").map_groups(_latency_per_partition, batch_format="pandas")
