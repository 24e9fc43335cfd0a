"""Gates for the lane-batched optimizer kernels (kernels/_batch.py).

Three invariants keep the round-4 batching safe:

1. PATH EQUALITY -- the per-series path (Python-float loops +
   _optim.nelder_mead) and the lane path (2-D arrays +
   nelder_mead_batch) are bit-identical, so the cohort-size dispatch
   (_MIN_LANES / _SINGLE_N) can never change an output value.
2. COMPOSITION INDEPENDENCE -- a series' result does not depend on
   which (or how many) other series share its cohort. This is what
   keeps feature outputs deterministic across block layouts, runs and
   CPU counts. (Regression guard: np.dot on row VIEWS is
   pointer-alignment-dependent and broke this once -- backcasts now use
   np.sum of the elementwise product.)
3. STAGE PARITY -- FeatureKernels' batched __call__ equals per-series
   compute_features for every feature column.
"""

from __future__ import annotations

import numpy as np
import pytest

from tsfeatures_ray.kernels import _batch as B
from tsfeatures_ray.kernels._math import scalets


def _series_pool(seed=0, n_series=60):
    rng = np.random.RandomState(seed)
    pool = []
    for _ in range(n_series):
        n = int(rng.choice([6, 9, 13, 17, 25, 33, 50, 70, 100, 140]))
        kind = rng.randint(3)
        if kind == 0:
            x = np.cumsum(rng.randn(n))
        elif kind == 1:
            x = np.cumsum(rng.randn(n)) + 0.3 * np.arange(n)
        else:
            x = rng.randn(n) * np.exp(np.sin(np.arange(n) / 5.0))
        pool.append(scalets(x))
    return pool


def _eq(a, b):
    a, b = float(a), float(b)
    return (np.isnan(a) and np.isnan(b)) or a == b


def test_holt_single_equals_lane():
    pool = _series_pool(1)
    lane = B._holt_fit_cohort(pool)
    for i, y in enumerate(pool):
        a, b = B._holt_fit_single(y)
        assert _eq(a, lane[0][i]) and _eq(b, lane[1][i]), i


def test_hw_single_equals_lane():
    pool = [y for y in _series_pool(2) if len(y) >= 24]
    m = 12
    lane = B._hw_fit_cohort(pool, m)
    for i, y in enumerate(pool):
        r = B._hw_fit_single(y, m)
        for v1, v2 in zip(r, (lane[0][i], lane[1][i], lane[2][i])):
            assert _eq(v1, v2), i


def test_garch_single_equals_lane():
    pool = [y for y in _series_pool(3) if len(y) >= 10]
    lane = B._garch_mu_cohort(
        pool,
        np.array([float(np.mean(y)) for y in pool]),
        np.array([float(np.var(y)) for y in pool]),
    )
    for i, y in enumerate(pool):
        mu = B._garch_mu_single(y, float(np.mean(y)), float(np.var(y)))
        assert _eq(mu, lane[i]), i


def test_composition_independence():
    """The same series must give identical bits alone, in a small
    cohort, and buried in a large cohort (any position)."""
    pool = _series_pool(4)
    probes = pool[:6]
    for y in probes:
        solo_h = B._holt_fit_cohort([y])
        solo_g = B._garch_mu_cohort(
            [y], np.array([float(np.mean(y))]), np.array([float(np.var(y))])
        )
        for other in (pool[6:16], pool[6:]):
            group = other[: len(other) // 2] + [y] + other[len(other) // 2:]
            j = len(other) // 2
            gh = B._holt_fit_cohort(group)
            assert _eq(gh[0][j], solo_h[0][0]) and _eq(gh[1][j], solo_h[1][0])
            gg = B._garch_mu_cohort(
                group,
                np.array([float(np.mean(v)) for v in group]),
                np.array([float(np.var(v)) for v in group]),
            )
            assert _eq(gg[j], solo_g[0])


def test_feature_stage_matches_per_series():
    import pyarrow as pa

    from tsfeatures_ray.kernels import compute_features
    from tsfeatures_ray.stages.features import FeatureKernels

    rng = np.random.RandomState(7)
    raw = []
    for _ in range(40):
        n = int(rng.choice([3, 8, 30, 60, 120]))
        raw.append(np.cumsum(rng.randn(n)) + 50)
    freqs = [int(rng.choice([1, 12, 24])) for _ in raw]
    t = pa.table(
        {
            "unique_id": pa.array([str(i) for i in range(len(raw))]),
            "freq": pa.array(freqs, type=pa.int64()),
            "y": pa.array([list(map(float, x)) for x in raw],
                          type=pa.list_(pa.float64())),
        }
    )
    fk = FeatureKernels()
    out = fk(t).to_pandas()
    for i, (x, f) in enumerate(zip(raw, freqs)):
        want = compute_features(np.asarray(x, float), f, None, scale=True)
        for k, v in want.items():
            if k in out.columns:
                assert _eq(v, out.iloc[i][k]), (i, k)


def test_giant_series_routed_and_correct(ray_session):
    """features_over_packed's auto giant policy: a 100x-length outlier
    is routed to its own task pool and its feature row matches the
    per-series kernels (VERDICT r3 ask #4)."""
    import pyarrow as pa
    import ray.data as rd

    from tsfeatures_ray.kernels import compute_features
    from tsfeatures_ray.stages.features import features_over_packed

    rng = np.random.RandomState(11)
    lens = [20] * 200 + [2000]  # giant = 100x typical
    rows = []
    for i, n in enumerate(lens):
        rows.append(
            {
                "unique_id": f"s{i}",
                "freq": 24,
                "n_buckets": n,
                "y": list(np.cumsum(rng.randn(n)) + 10.0),
            }
        )
    ds = rd.from_pandas(__import__("pandas").DataFrame(rows))
    out = features_over_packed(ds, concurrency=4).to_pandas()
    assert len(out) == len(lens)
    giant = out[out.unique_id == f"s{len(lens)-1}"].iloc[0]
    want = compute_features(
        np.asarray(rows[-1]["y"], float), 24, None, scale=True
    )
    for k, v in want.items():
        if k in out.columns:
            assert _eq(v, giant[k]), k
