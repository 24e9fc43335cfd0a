"""User-extension surface: custom feature callables plug into the
pipeline exactly like the reference's (reference README.md:70-81
documents a custom ``number_zeros`` kernel; tsfeatures.py:932 accepts
any f(x, freq) -> dict)."""

import sys

import numpy as np
import pandas as pd

# custom kernels defined outside an importable package must be shipped by
# value (the standard Ray/cloudpickle pattern; documented in
# tsfeatures_ray.stages.features)
import ray.cloudpickle as cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def number_zeros(x: np.ndarray, freq: int = 1) -> dict:
    return {"number_zeros": float((x == 0).sum())}


def test_custom_feature_through_pipeline(ray_session):
    from tsfeatures_ray.pipelines import tsfeatures

    z = np.zeros(30)
    z[[3, 7]] = 5.0
    panel = pd.DataFrame({"unique_id": "u1", "ds": range(30), "y": z})
    out = tsfeatures(panel, freq=7, features=[number_zeros, "series_length"],
                     scale=False).to_pandas()
    assert out["number_zeros"].iloc[0] == 28.0
    assert out["series_length"].iloc[0] == 30.0


def test_custom_feature_first_wins_on_collision():
    # ChainMap semantics: first feature in the list wins on key collision
    # (reference tsfeatures.py:926-928)
    from tsfeatures_ray.kernels import compute_features

    def a(x, freq=1):
        return {"dup": 1.0}

    def b(x, freq=1):
        return {"dup": 2.0}

    assert compute_features(np.ones(5), 1, [a, b], scale=False)["dup"] == 1.0
    assert compute_features(np.ones(5), 1, [b, a], scale=False)["dup"] == 2.0


def test_freq_inference_parity(ray_session):
    # reference tsfeatures.py:898-913: freq=None -> pd.infer_freq + FREQS
    from tsfeatures_ray.pipelines import tsfeatures

    ds_idx = pd.date_range("2020-01-01", periods=36, freq="MS")
    panel = pd.DataFrame(
        {"unique_id": "m", "ds": ds_idx, "y": np.arange(36, dtype=float)}
    )
    out = tsfeatures(panel, features=["stl_features"]).to_pandas()
    assert out["seasonal_period"].iloc[0] == 12.0  # monthly -> 12

    import pytest as _pytest

    # non-datetime ds raises (pd.infer_freq TypeError propagates, exactly
    # as it would in the reference's _get_feats)
    bad = pd.DataFrame(
        {"unique_id": "x", "ds": [1.5, 2.25, 9.0], "y": [1.0, 2.0, 3.0]}
    )
    with _pytest.raises(Exception):
        tsfeatures(bad, features=["series_length"]).to_pandas()

    # irregular datetimes -> infer_freq returns None -> reference error text
    irr = pd.DataFrame(
        {
            "unique_id": "x",
            "ds": pd.to_datetime(["2020-01-01", "2020-01-02", "2020-01-10"]),
            "y": [1.0, 2.0, 3.0],
        }
    )
    with _pytest.raises(Exception, match="Failed to infer frequency"):
        tsfeatures(irr, features=["series_length"]).to_pandas()


def test_threads_parity_alias(ray_session):
    """Reference API parity: `threads` (the Pool-size knob,
    tsfeatures.py:970) is accepted as an alias of concurrency and does
    not change results."""
    import pandas as pd

    from tsfeatures_ray.pipelines import tsfeatures

    rows = []
    for uid in ("a", "b"):
        for i in range(30):
            rows.append((uid, i, float(i % 7 + 1)))
    panel = pd.DataFrame(rows, columns=["unique_id", "ds", "y"])
    base = tsfeatures(panel, freq=1, features=["stability"]).to_pandas()
    alias = tsfeatures(
        panel, freq=1, features=["stability"], threads=2
    ).to_pandas()
    key = ["unique_id"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True),
        alias.sort_values(key).reset_index(drop=True),
    )


def test_r_bridge_surface_importable_and_guided():
    import pytest
    """The tsfeatures_r bridge imports cleanly (unlike the reference,
    whose module-level rpy2 import fails without R) and raises a
    guidance ImportError at call time when rpy2 is absent."""
    import pandas as pd

    from tsfeatures_ray.pipelines import tsfeatures_r, tsfeatures_r_wide

    panel = pd.DataFrame(
        {"unique_id": ["a"] * 5, "ds": range(5), "y": [1.0] * 5}
    )
    try:
        import rpy2  # noqa: F401

        has_rpy2 = True
    except ImportError:
        has_rpy2 = False
    if not has_rpy2:
        with pytest.raises(ImportError, match="rpy2"):
            tsfeatures_r(panel, 1)
        with pytest.raises(ImportError, match="rpy2"):
            tsfeatures_r_wide(
                pd.DataFrame(
                    {"unique_id": ["a"], "seasonality": [1], "y": [[1.0, 2.0]]}
                )
            )
