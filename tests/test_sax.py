"""SAX symbolization: hand-verifiable symbols on a constructed series,
a brute-force per-series reference over random series, gating of short /
zero-variance series, and layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _brute_sax(v: np.ndarray, w: int, bp: np.ndarray) -> str:
    z = (v - v.mean()) / v.std(ddof=1)
    n = len(v)
    seg = (np.arange(n) * w) // n
    paa = np.array([z[seg == s].mean() for s in range(w)])
    paa = paa + 1e-7
    paa = np.sign(paa) * np.floor(np.abs(paa) * 1e6 + 0.5) / 1e6
    return "".join(chr(ord("a") + int(k)) for k in np.searchsorted(bp, paa, side="right"))


def test_sax_hand_case(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.sax import sax_breakpoints, sax_symbolize

    # ramp 0..15 over 16 points, w=4, a=4: segments z-means are
    # symmetric: strongly low, mildly low, mildly high, strongly high
    df = pd.DataFrame(
        {
            "conv_id": ["r"] * 16,
            "bucket": np.arange(16),
            "token_len_sum": np.arange(16, dtype=np.float64),
        }
    )
    got = sax_symbolize(rd.from_pandas(df), w=4, alphabet=4).to_pandas()
    assert len(got) == 1
    assert got.loc[0, "n_points"] == 16
    assert got.loc[0, "sax"] == "abcd"
    bp = np.array(sax_breakpoints(4))
    assert got.loc[0, "sax"] == _brute_sax(np.arange(16, dtype=float), 4, bp)


def test_sax_matches_brute_on_random_series(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.sax import sax_breakpoints, sax_symbolize

    rng = np.random.RandomState(11)
    frames, want = [], {}
    bp = np.array(sax_breakpoints(5))
    for key in range(30):
        n = rng.randint(8, 60)
        v = rng.randn(n) * rng.uniform(0.5, 5) + rng.uniform(-3, 3)
        frames.append(
            pd.DataFrame(
                {"conv_id": [f"c{key:02d}"] * n, "bucket": np.arange(n),
                 "token_len_sum": v}
            )
        )
        want[f"c{key:02d}"] = _brute_sax(v, 8, bp)
    df = pd.concat(frames, ignore_index=True)
    shuffled = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    got = (
        sax_symbolize(
            rd.from_pandas(shuffled).repartition(7), w=8, alphabet=5, num_parts=3
        )
        .to_pandas()
        .set_index("conv_id")["sax"]
        .to_dict()
    )
    assert got == want


def test_sax_gates_and_validation(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.sax import sax_symbolize

    df = pd.DataFrame(
        {
            "conv_id": ["short"] * 5 + ["flat"] * 12 + ["ok"] * 12,
            "bucket": list(range(5)) + list(range(12)) + list(range(12)),
            "token_len_sum": [1.0, 2, 3, 4, 5]
            + [7.0] * 12
            + list(np.arange(12, dtype=float)),
        }
    )
    got = sax_symbolize(rd.from_pandas(df), w=8, alphabet=4).to_pandas()
    # short (n<w) and zero-variance series are dropped; 'ok' survives
    assert list(got["conv_id"]) == ["ok"]

    with pytest.raises(ValueError, match="alphabet"):
        sax_symbolize(rd.from_pandas(df), alphabet=11)


def test_sax_motif_buckets(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.sax import sax_motif_buckets, sax_symbolize

    # two series with the same SHAPE (one scaled+shifted -- z-norm makes
    # the SAX words identical) plus one reversed shape
    v = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=float)
    df = pd.concat(
        [
            pd.DataFrame({"conv_id": "up1", "bucket": range(8), "token_len_sum": v}),
            pd.DataFrame(
                {"conv_id": "up2", "bucket": range(8), "token_len_sum": v * 10 + 3}
            ),
            pd.DataFrame(
                {"conv_id": "down", "bucket": range(8), "token_len_sum": v[::-1]}
            ),
        ],
        ignore_index=True,
    )
    sax = sax_symbolize(rd.from_pandas(df), w=4, alphabet=4)
    got = (
        sax_motif_buckets(sax, min_size=2)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(got["conv_id"]) == ["up1", "up2"]
    assert (got["bucket_size"] == 2).all()
    assert got["sax"].nunique() == 1


def test_sax_bucket_pairs_exact_distance(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.sax import sax_bucket_pairs, sax_symbolize

    rng = np.random.RandomState(21)
    base = np.cumsum(rng.randn(24))
    frames = []
    # three same-shape series (scaled/shifted -> identical SAX word,
    # near-zero PAA distance) + noise series
    for cid, (a, b) in {"s1": (1, 0), "s2": (4, 10), "s3": (0.5, -2)}.items():
        frames.append(pd.DataFrame(
            {"conv_id": cid, "bucket": range(24), "token_len_sum": base * a + b}))
    for j in range(4):
        frames.append(pd.DataFrame(
            {"conv_id": f"n{j}", "bucket": range(24),
             "token_len_sum": np.cumsum(rng.randn(24))}))
    df = pd.concat(frames, ignore_index=True)
    sax = sax_symbolize(rd.from_pandas(df), w=8, alphabet=4, emit_paa=True)
    got = sax_bucket_pairs(sax).to_pandas().sort_values(["id_a", "id_b"])
    shape_pairs = got[got["id_a"].str.startswith("s") & got["id_b"].str.startswith("s")]
    # all three same-shape pairs found, with ~zero PAA distance
    assert len(shape_pairs) == 3
    assert (shape_pairs["paa_dist"] < 1e-4).all()
    # brute check one distance: z-norm is affine-invariant, so PAA
    # vectors of s1/s2 are equal up to rounding
    assert got["paa_dist"].ge(0).all()

    with pytest.raises(ValueError, match="max_bucket"):
        sax_bucket_pairs(sax, max_bucket=2).to_pandas()


def _dtw_brute(a, b, band=None):
    n, m = len(a), len(b)
    band = max(band if band is not None else max(n, m), abs(n - m))
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if abs(i - j) > band:
                continue
            D[i, j] = (a[i - 1] - b[j - 1]) ** 2 + min(
                D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]
            )
    return float(np.sqrt(D[n, m]))


def test_dtw_matches_brute_dp(ray_session):
    from tsfeatures_ray.functions.sax import dtw_distance

    rng = np.random.RandomState(17)
    for trial in range(25):
        n, m = rng.randint(1, 30), rng.randint(1, 30)
        a, b = rng.randn(n), rng.randn(m)
        band = None if trial % 3 == 0 else rng.randint(1, 10)
        got = dtw_distance(a, b, band)
        want = _dtw_brute(a, b, band)
        assert got == want or abs(got - want) < 1e-12, (trial, got, want)
    # identity and known alignment: identical series -> 0
    x = rng.randn(20)
    assert dtw_distance(x, x) == 0.0
    # time-shifted copy aligns elastically: dtw << euclidean
    y = np.r_[x[3:], x[-1] * np.ones(3)]
    assert dtw_distance(x, y) < np.sqrt(((x - y) ** 2).sum())
    # empty input
    assert np.isnan(dtw_distance(np.array([]), x))


def test_sax_dtw_pairs(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.sax import dtw_distance, sax_dtw_pairs

    rng = np.random.RandomState(23)
    base = np.cumsum(rng.randn(30))
    frames = []
    for cid, (a, b) in {"s1": (1, 0), "s2": (3, 5)}.items():
        frames.append(pd.DataFrame(
            {"conv_id": cid, "bucket": range(30), "token_len_sum": base * a + b}))
    for j in range(3):
        frames.append(pd.DataFrame(
            {"conv_id": f"n{j}", "bucket": range(30),
             "token_len_sum": np.cumsum(rng.randn(30))}))
    df = pd.concat(frames, ignore_index=True)
    got = sax_dtw_pairs(rd.from_pandas(df), w=4, alphabet=4).to_pandas()
    pair = got[(got["id_a"] == "s1") & (got["id_b"] == "s2")]
    assert len(pair) == 1
    # z-norm is affine invariant -> identical z series -> dtw == 0
    assert pair["dtw"].iloc[0] < 1e-4
    # every reported value equals a direct dtw_distance recomputation
    z = {}
    for cid, sub in df.groupby("conv_id"):
        v = sub.sort_values("bucket")["token_len_sum"].to_numpy(float)
        z[cid] = (v - v.mean()) / v.std(ddof=1)
    for _, r in got.iterrows():
        want = dtw_distance(z[r["id_a"]], z[r["id_b"]])
        want = np.sign(want + 1e-7) * np.floor(abs(want + 1e-7) * 1e6 + 0.5) / 1e6
        assert abs(r["dtw"] - want) < 1e-12
