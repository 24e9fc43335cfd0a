"""Unit gates for the round-5 additions: sweep-line interval
concurrency, PSI/JSD distribution drift, and table reconciliation."""

import numpy as np
import pandas as pd
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


# ---------------------------------------------------------------- conc


def test_concurrency_brute(ray_session):
    """Engine sweep == brute-force per-boundary scan on random intervals."""
    from tsfeatures_ray.functions import interval_concurrency

    rng = np.random.default_rng(7)
    n = 400
    start = rng.integers(0, 50 * 3_600_000_000, n)
    dur = rng.integers(0, 8 * 3_600_000_000, n)
    df = pd.DataFrame(
        {
            "session_start": pd.to_datetime(start, unit="us"),
            "session_end": pd.to_datetime(start + dur, unit="us"),
        }
    ).astype({"session_start": "datetime64[us]", "session_end": "datetime64[us]"})

    got = (
        interval_concurrency(_ds(df), num_parts=7)
        .sort("bucket")
        .to_pandas()
    )

    # brute force: sort boundaries by (ts, d) with ends first, cumsum
    b = pd.DataFrame(
        {
            "eus": np.concatenate([start, start + dur]),
            "d": np.concatenate(
                [np.ones(n, np.int64), -np.ones(n, np.int64)]
            ),
        }
    ).sort_values(["eus", "d"], kind="mergesort")
    b["conc"] = b["d"].cumsum()
    b["bucket"] = pd.to_datetime(
        (b["eus"] // 3_600_000_000) * 3_600_000_000, unit="us"
    ).astype("datetime64[us]")
    want = (
        b.groupby("bucket")["conc"].max().rename("max_concurrency").reset_index()
    )
    want["max_concurrency"] = want["max_concurrency"].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_concurrency_half_open_tie_rule(ray_session):
    """A session ending exactly when another starts never overlaps it."""
    from tsfeatures_ray.functions import interval_concurrency

    t0 = pd.Timestamp("2024-01-01 00:10:00")
    t1 = pd.Timestamp("2024-01-01 00:20:00")
    t2 = pd.Timestamp("2024-01-01 00:30:00")
    df = pd.DataFrame(
        {
            "session_start": pd.Series([t0, t1], dtype="datetime64[us]"),
            "session_end": pd.Series([t1, t2], dtype="datetime64[us]"),
        }
    )
    got = interval_concurrency(_ds(df)).to_pandas()
    assert int(got["max_concurrency"].max()) == 1


def test_concurrency_empty(ray_session):
    from tsfeatures_ray.functions import interval_concurrency

    df = pd.DataFrame(
        {
            "session_start": pd.Series([], dtype="datetime64[us]"),
            "session_end": pd.Series([], dtype="datetime64[us]"),
        }
    )
    out = interval_concurrency(_ds(df))
    # Ray's to_pandas() drops the schema of a 0-row dataset; assert on
    # the Dataset schema (which the empty path pins via Arrow)
    sch = out.schema()
    assert out.count() == 0
    assert dict(zip(sch.names, map(str, sch.types))) == {
        "bucket": "timestamp[us]",
        "max_concurrency": "int64",
    }


# --------------------------------------------------------------- drift


def _drift_frame(vals0, vals1):
    n0, n1 = len(vals0), len(vals1)
    return pd.DataFrame(
        {
            "event_type": np.repeat("a", n0 + n1),
            "value": np.concatenate([vals0, vals1]),
            "ts": pd.to_datetime(
                np.concatenate(
                    [np.zeros(n0, np.int64), np.full(n1, 10**12, np.int64)]
                ),
                unit="us",
            ).astype("datetime64[us]"),
        }
    )


def test_drift_identical_is_zero(ray_session):
    from tsfeatures_ray.functions import distribution_drift

    rng = np.random.default_rng(3)
    v = rng.uniform(0, 1, 2000)
    df = _drift_frame(v, v)
    got = distribution_drift(
        _ds(df), split_us=1, lo=0.0, hi=1.0, bins=8
    ).to_pandas()
    assert got.loc[0, "psi"] == pytest.approx(0.0, abs=1e-6)
    assert got.loc[0, "jsd"] == pytest.approx(0.0, abs=1e-6)
    assert got.loc[0, "n_before"] == 2000 and got.loc[0, "n_after"] == 2000


def test_drift_shift_detected_and_matches_formula(ray_session):
    from tsfeatures_ray.functions import distribution_drift

    rng = np.random.default_rng(4)
    v0 = rng.uniform(0, 0.6, 1500)
    v1 = rng.uniform(0.4, 1.0, 1500)
    bins, lo, hi = 8, 0.0, 1.0
    got = distribution_drift(
        _ds(_drift_frame(v0, v1)), split_us=1, lo=lo, hi=hi, bins=bins
    ).to_pandas()

    w = (hi - lo) / bins
    c0 = np.bincount(
        np.clip(np.floor((v0 - lo) / w), 0, bins - 1).astype(int),
        minlength=bins,
    )
    c1 = np.bincount(
        np.clip(np.floor((v1 - lo) / w), 0, bins - 1).astype(int),
        minlength=bins,
    )
    a0, a1 = c0 + 0.5, c1 + 0.5
    p, q = a0 / a0.sum(), a1 / a1.sum()
    psi = np.sum((p - q) * np.log(p / q))
    m = p + q
    jsd = np.sum(0.5 * p * np.log(2 * p / m) + 0.5 * q * np.log(2 * q / m))
    assert got.loc[0, "psi"] == pytest.approx(psi, abs=2e-6)
    assert got.loc[0, "jsd"] == pytest.approx(jsd, abs=2e-6)
    assert got.loc[0, "psi"] > 0.5  # a real shift registers
    # JSD (nats) is bounded by ln 2
    assert 0.0 < got.loc[0, "jsd"] <= np.log(2) + 1e-9


# ----------------------------------------------------------- reconcile


def test_reconcile_statuses(ray_session):
    from tsfeatures_ray.functions.join import reconcile_tables

    left = pd.DataFrame(
        {
            "k": np.array([1, 2, 3, 4], dtype=np.int64),
            "g": ["x", "x", "y", "y"],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    right = pd.DataFrame(
        {
            "k": np.array([1, 2, 4, 5], dtype=np.int64),
            "g": ["x", "x", "y", "x"],
            "v": [1.0, 20.0, 4.0, 5.0],
        }
    )
    got = (
        reconcile_tables(
            _ds(left),
            _ds(right),
            key="k",
            compare_cols=["g", "v"],
            group_col="g",
            num_parts=3,
        )
        .sort(["g", "status"])
        .to_pandas()
    )
    want = pd.DataFrame(
        {
            "g": ["x", "x", "x", "y", "y"],
            "status": ["added", "changed", "same", "removed", "same"],
            "n": np.array([1, 1, 1, 1, 1], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_reconcile_no_group(ray_session):
    from tsfeatures_ray.functions.join import reconcile_tables

    left = pd.DataFrame(
        {"k": np.array([1, 2], dtype=np.int64), "v": [1.0, 2.0]}
    )
    right = pd.DataFrame(
        {"k": np.array([2, 3], dtype=np.int64), "v": [2.0, 3.0]}
    )
    got = (
        reconcile_tables(
            _ds(left), _ds(right), key="k", compare_cols=["v"], num_parts=2
        )
        .sort(["status"])
        .to_pandas()
    )
    assert dict(zip(got["status"], got["n"])) == {
        "added": 1,
        "removed": 1,
        "same": 1,
    }


def test_coverage_brute(ray_session):
    """Engine union-length == brute per-microsecond-free sweep on random
    intervals, including overlaps and multi-bucket spans."""
    from tsfeatures_ray.functions.concurrency import interval_coverage

    rng = np.random.default_rng(21)
    n = 300
    day = 86_400_000_000
    start = rng.integers(0, 10 * day, n)
    dur = rng.integers(1, 2 * day, n)
    df = pd.DataFrame(
        {
            "session_start": pd.to_datetime(start, unit="us"),
            "session_end": pd.to_datetime(start + dur, unit="us"),
        }
    ).astype({"session_start": "datetime64[us]", "session_end": "datetime64[us]"})
    got = (
        interval_coverage(_ds(df), num_parts=7).sort("bucket").to_pandas()
    )

    # brute: merge intervals, clip to days
    iv = sorted(zip(start, start + dur))
    merged = []
    for s, e in iv:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    cov: dict = {}
    for s, e in merged:
        for d in range(s // day, (e - 1) // day + 1):
            cov[d] = cov.get(d, 0) + min(e, (d + 1) * day) - max(s, d * day)
    want = pd.DataFrame(
        {
            "bucket": pd.to_datetime(
                np.array(sorted(cov)) * day, unit="us"
            ).astype("datetime64[us]"),
            "covered_us": np.array(
                [cov[d] for d in sorted(cov)], dtype=np.int64
            ),
        }
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_coverage_overlap_counted_once(ray_session):
    from tsfeatures_ray.functions.concurrency import interval_coverage

    t = pd.Timestamp("2024-01-01 00:00:00")
    hr = pd.Timedelta(hours=1)
    df = pd.DataFrame(
        {
            "session_start": pd.Series([t, t], dtype="datetime64[us]"),
            "session_end": pd.Series([t + hr, t + hr], dtype="datetime64[us]"),
        }
    )
    got = interval_coverage(_ds(df)).to_pandas()
    assert len(got) == 1
    assert int(got.loc[0, "covered_us"]) == 3_600_000_000
