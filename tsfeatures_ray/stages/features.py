"""Stage 4: the feature-kernel actor pool.

The reference's execution model is one OS process per series
(tsfeatures.py:970-971). Ours is the idiomatic Ray Data equivalent: a
callable CLASS passed to ``map_batches(FeatureKernels,
batch_format="pyarrow", concurrency=N, num_cpus=1)`` -- an actor pool
whose per-actor setup (feature list resolution, scratch state) runs once
in ``__init__`` and whose ``__call__`` processes a BATCH of packed
series (amortizing task overhead over many series, unlike the
reference's task-per-series).

Output is a wide feature table with a FIXED schema: the seasonal
superset of the default feature set (42 feature columns, SURVEY.md
§2.1); nonseasonal series leave the seasonal-only columns NaN. A fixed
schema is what lets blocks concatenate without Arrow schema conflicts.

BLAS threading: the reference pins MKL/OMP to one thread per worker
(tsfeatures.py:6-8); Ray already exports OMP_NUM_THREADS=1 to workers,
so each num_cpus=1 actor is single-threaded by construction.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray

from ..kernels import ALL_FEATURES, DEFAULT_FEATURES, compute_features

# canonical output order: reference default feature list order, seasonal
# superset (SURVEY.md §2.1; reference tsfeatures.py:932-937)
DEFAULT_FEATURE_COLS: list[str] = [
    # acf_features
    "x_acf1", "x_acf10", "diff1_acf1", "diff1_acf10", "diff2_acf1",
    "diff2_acf10", "seas_acf1",
    # arch_stat
    "arch_lm",
    # crossing_points
    "crossing_points",
    # entropy
    "entropy",
    # flat_spots
    "flat_spots",
    # heterogeneity
    "arch_acf", "garch_acf", "arch_r2", "garch_r2",
    # holt_parameters
    "alpha", "beta",
    # lumpiness
    "lumpiness",
    # nonlinearity
    "nonlinearity",
    # pacf_features
    "x_pacf5", "diff1x_pacf5", "diff2x_pacf5", "seas_pacf",
    # stl_features
    "nperiods", "seasonal_period", "trend", "spike", "linearity",
    "curvature", "e_acf1", "e_acf10", "seasonal_strength", "peak", "trough",
    # stability
    "stability",
    # hw_parameters
    "hw_alpha", "hw_beta", "hw_gamma",
    # unitroot_kpss / unitroot_pp
    "unitroot_kpss", "unitroot_pp",
    # series_length / hurst
    "series_length", "hurst",
]


def _resolve(features) -> list[Callable]:
    if features is None:
        return DEFAULT_FEATURES
    out = []
    for f in features:
        if isinstance(f, str):
            if f not in ALL_FEATURES:
                raise KeyError(
                    f"unknown feature {f!r}; available: {sorted(ALL_FEATURES)}"
                )
            out.append(ALL_FEATURES[f])
        else:
            out.append(f)
    return out


class FeatureKernels:
    """Actor-pool stage: packed series batches -> wide feature rows."""

    def __init__(self, features=None, scale: bool = True, columns=None):
        self.features = _resolve(features)
        self.scale = scale
        if columns is None:
            # derive the column set from a probe run on tiny seasonal and
            # nonseasonal series (cheap; once per actor)
            cols = []
            seen = set()
            probe = np.arange(64, dtype=float) + np.sin(np.arange(64) / 3)
            for freq in (12, 1):
                for k in compute_features(probe, freq, self.features, scale=False):
                    if k not in seen:
                        seen.add(k)
                        cols.append(k)
            # keep canonical ordering when the default set is used
            if set(cols) == set(DEFAULT_FEATURE_COLS):
                cols = list(DEFAULT_FEATURE_COLS)
            self.columns = cols
        else:
            self.columns = list(columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        y_col = batch["y"].combine_chunks()
        if isinstance(y_col, pa.ChunkedArray):
            y_col = y_col.combine_chunks()
        offsets = y_col.offsets.to_numpy()
        flat = y_col.values.to_numpy(zero_copy_only=False)
        freqs = batch["freq"].to_numpy()
        n = len(batch)
        out = {c: np.full(n, np.nan) for c in self.columns}
        for i in range(n):
            x = flat[offsets[i] : offsets[i + 1]]
            feats = compute_features(x, int(freqs[i]), self.features, scale=self.scale)
            for k, v in feats.items():
                if k in out:
                    out[k][i] = v
        arrays = [batch["unique_id"], batch["tier"]] + [
            pa.array(out[c], type=pa.float64()) for c in self.columns
        ]
        return pa.Table.from_arrays(
            arrays, names=["unique_id", "tier"] + self.columns
        )


def features_over_packed(
    packed: "ray.data.Dataset",
    features=None,
    scale: bool = True,
    concurrency=None,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Run the kernel actor pool over a packed Dataset."""
    if concurrency is None:
        try:
            concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 1)
        except Exception:
            concurrency = 4
    _resolve(features)  # validate feature names eagerly, on the driver
    # split the (small) packed table into enough blocks to feed every
    # actor; without this, one upstream map_groups block would serialize
    # the whole pool behind a single task
    packed = packed.repartition(concurrency * 2)
    return packed.map_batches(
        FeatureKernels,
        fn_constructor_kwargs={"features": features, "scale": scale},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
