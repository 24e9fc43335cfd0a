"""Layout converters: wide<->long round trip + date synthesis (analog of
reference m4_data prep ops)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import pytest


def test_wide_long_roundtrip(ray_session):
    import ray.data as rd

    from tsfeatures_ray.sources.convert import long_to_wide, wide_to_long

    rng = np.random.RandomState(0)
    rows = []
    for uid, n in [("a", 7), ("b", 3), ("c", 12)]:
        rows.append(
            pd.DataFrame({"unique_id": uid, "ds": range(n), "y": rng.rand(n)})
        )
    long_df = pd.concat(rows, ignore_index=True)
    wide = long_to_wide(rd.from_pandas(long_df), seasonality=4)
    wdf = wide.to_pandas().set_index("unique_id")
    assert wdf.loc["a", "n_buckets"] == 7
    assert list(wdf.loc["b", "y"]) == pytest.approx(
        long_df[long_df.unique_id == "b"]["y"].tolist()
    )

    back = wide_to_long(wide).to_pandas()
    back = back.sort_values(["unique_id", "ds"]).reset_index(drop=True)
    orig = long_df.sort_values(["unique_id", "ds"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back, orig)


def test_synth_date_range(ray_session):
    import ray.data as rd

    from tsfeatures_ray.sources.convert import synth_date_range

    df = pd.DataFrame({"unique_id": "u", "ds": range(5), "y": 1.0})
    out = synth_date_range(rd.from_pandas(df), start_us=0, step_us=3_600_000_000)
    ts = out.to_pandas()["ts"]
    assert ts.iloc[1] - ts.iloc[0] == pd.Timedelta(hours=1)


def test_limit_and_union_parity(ray_session):
    # reference nrows truncation (m4_data.py:79) -> ds.limit;
    # pd.concat train+test (m4_data.py:105) -> ds.union
    import ray.data as rd

    a = rd.range(100)
    b = rd.range(50)
    assert a.limit(10).count() == 10
    assert a.union(b).count() == 150


def test_train_test_split(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.sources.convert import train_test_split

    rows = []
    lengths = {"a": 12, "b": 7, "c": 3}
    for uid, n in lengths.items():
        for i in range(n):
            rows.append((uid, i, float(i)))
    panel = rd.from_pandas(pd.DataFrame(rows, columns=["unique_id", "ds", "y"]))

    # default policy: a series with length <= horizon raises
    with pytest.raises(Exception, match="train_test_split"):
        t1, t2 = train_test_split(panel, horizon=4)
        t1.to_pandas()

    # 'drop' excludes short series from both panels
    train_d, test_d = train_test_split(panel, horizon=4, short="drop")
    assert set(test_d.to_pandas()["unique_id"]) == {"a", "b"}
    assert set(train_d.to_pandas()["unique_id"]) == {"a", "b"}

    train, test = train_test_split(panel, horizon=4, short="all_test")
    tr, te = train.to_pandas(), test.to_pandas()
    assert len(tr) + len(te) == sum(lengths.values())
    for uid, n in lengths.items():
        t = te[te.unique_id == uid].sort_values("ds")
        # last min(h, n) observations per series are test
        h = min(4, n)
        assert list(t["ds"]) == list(range(n - h, n))
        assert len(tr[tr.unique_id == uid]) == n - h


def test_m4_prep_surface(tmp_path):
    """Reference-parity M4 prep (sources/m4.py): synthetic M4-shaped
    CSVs when files are absent (no network), reference-exact parse
    (melt, 0-based ds offsets, date synthesis, category merge), and the
    output feeds tsfeatures directly."""
    from tsfeatures_ray.sources.m4 import m4_parser, prepare_m4_data, seas_dict

    d = str(tmp_path)
    X_tr, y_tr, X_te, y_te = prepare_m4_data("Hourly", d, 100)
    h = seas_dict["Hourly"]["output_size"]
    assert list(y_tr.columns) == ["unique_id", "ds", "y"]
    assert list(X_te.columns) == ["unique_id", "ds", "x"]
    assert (y_te.groupby("unique_id").size() == h).all()
    # per-series: test dates continue train dates at the dataset freq
    uid = y_tr["unique_id"].iloc[0]
    tr = y_tr[y_tr.unique_id == uid].sort_values("ds")
    te = y_te[y_te.unique_id == uid].sort_values("ds")
    assert te["ds"].iloc[0] - tr["ds"].iloc[-1] == pd.Timedelta(hours=1)
    # files persist; second parse is identical (user-supplied CSVs would
    # be used as-is the same way)
    again = m4_parser("Hourly", d, 100)[1]
    pd.testing.assert_frame_equal(again, y_tr)
