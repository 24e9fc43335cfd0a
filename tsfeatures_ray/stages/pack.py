"""Stage 3: pack rollup series into list<double> cells (the wide format).

The reference's wide layout -- one row per series with a list-valued
``y`` cell (tsfeatures.py:1014-1016, unpacked at :990-992) -- is our
canonical IR between the rollup and the feature kernels: Arrow
``list_(float64())``. Packing happens per partition (same stable
``part`` key as every other stage) and densifies each (conv_id, tier)
series over its bucket range, gaps -> 0.0 (a quiet minute contributes
zero tokens), fully vectorized via offset arithmetic -- no
per-conversation Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..schema import TIERS
from .derive import default_num_parts, stable_part

PACKED_SCHEMA = pa.schema(
    [
        ("unique_id", pa.string()),
        ("tier", pa.string()),
        ("metric", pa.string()),
        ("freq", pa.int32()),
        ("n_buckets", pa.int64()),
        ("y", pa.list_(pa.float64())),
    ]
)


def _pack_partition(metrics):
    if isinstance(metrics, str):
        metrics = [metrics]

    def fn(g: pd.DataFrame) -> pa.Table:
        uid_out, tier_out, metric_out, freq_out, n_out = [], [], [], [], []
        offsets = [0]
        chunks = []
        for tname, tier in TIERS.items():
            sub = g[g["tier"] == tname]
            if len(sub) == 0:
                continue
            w = tier.bucket_us
            sub = sub.sort_values(["conv_id", "bucket_us"], kind="mergesort")
            conv = sub["conv_id"].to_numpy()
            buck = sub["bucket_us"].to_numpy().astype(np.int64)
            # span per conv (sub is sorted by conv, bucket)
            first = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
            last = np.r_[first[1:], len(conv)] - 1
            nb = (buck[last] - buck[first]) // w + 1
            starts = np.concatenate([[0], np.cumsum(nb)[:-1]])
            conv_ord = np.cumsum(np.r_[0, (conv[1:] != conv[:-1]).astype(np.int64)])
            pos = starts[conv_ord] + (buck - buck[first][conv_ord]) // w
            for metric in metrics:
                vals = sub[metric].to_numpy(dtype="float64", na_value=0.0)
                dense = np.zeros(int(nb.sum()))
                dense[pos] = vals
                chunks.append(dense)
                base = offsets[-1]
                offsets.extend((base + np.cumsum(nb)).tolist())
                uid_out.extend(conv[first].tolist())
                tier_out.extend([tname] * len(first))
                metric_out.extend([metric] * len(first))
                freq_out.extend([tier.freq] * len(first))
                n_out.extend(nb.tolist())
        values = np.concatenate(chunks) if chunks else np.empty(0)
        y = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.float64())
        )
        table = pa.Table.from_arrays(
            [
                pa.array(uid_out, type=pa.string()),
                pa.array(tier_out, type=pa.string()),
                pa.array(metric_out, type=pa.string()),
                pa.array(freq_out, type=pa.int32()),
                pa.array(n_out, type=pa.int64()),
                y,
            ],
            schema=PACKED_SCHEMA,
        )
        # deterministic within-block shuffle: the natural order groups
        # whole tiers together, so any contiguous slice downstream would
        # inherit wildly uneven kernel cost; mixing here (local, no
        # exchange) keeps later block splits cost-balanced (SURVEY.md S4)
        perm = np.random.Generator(np.random.PCG64(42)).permutation(len(table))
        return table.take(pa.array(perm))

    return fn


def assert_unique_series(packed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Loud guard for the pre-partitioned fast path: raises ValueError if
    any (unique_id, tier, metric) series spans more than one packed row --
    the symptom of a violated block-alignment assumption (e.g. Ray split
    a rollup partition into several blocks before a
    ``pack_series(pre_partitioned=True)``). Cheap: aggregates only the
    packed table (one row per series). Returns the materialized packed
    Dataset so callers can keep streaming from it."""
    packed = packed.materialize()
    total = packed.count()
    distinct = (
        packed.groupby(["unique_id", "tier", "metric"]).count().count()
    )
    if total != distinct:
        raise ValueError(
            f"pack produced {total} rows for {distinct} distinct "
            "(unique_id, tier, metric) series: a series was split across "
            "blocks. Use rollup_packed() (fused, layout-independent) or "
            "pack_series(pre_partitioned=False)."
        )
    return packed


def pack_series(
    rollup_ds: "ray.data.Dataset",
    metric: str | list[str] = "token_len_sum",
    num_parts: int | None = None,
    pre_partitioned: bool = False,
) -> "ray.data.Dataset":
    """Rollup Dataset -> packed wide Dataset (PACKED_SCHEMA).

    ``pre_partitioned=True`` skips the shuffle entirely and packs each
    BLOCK independently (``batch_size=None`` -> one batch per block).
    Partitioning assumption (SURVEY.md §2 custom-operator rule): every
    (conv_id, tier) group lies within one block. Ray's dynamic block
    splitting CAN break this silently (duplicate partial series), so the
    fast path is only for callers that control the upstream block layout
    and should be guarded with ``assert_unique_series``; the
    layout-independent shapes are ``rollup_packed`` (fused, preferred)
    or the shuffle path below.
    """
    fn = _pack_partition(metric)
    if pre_partitioned:
        return rollup_ds.map_batches(fn, batch_format="pandas", batch_size=None)
    if num_parts is None:
        num_parts = default_num_parts()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df["part"] = stable_part(df["conv_id"].to_numpy(), num_parts)
        return df

    ds = rollup_ds.map_batches(add_part, batch_format="pandas")
    return ds.groupby("part").map_groups(fn, batch_format="pandas")
