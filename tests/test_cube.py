"""grouping_sets_agg: pandas brute-force parity on a random table (all
four cube levels + rollup ladder + explicit sets), SQL GROUPING bitmask
convention, all-null-group SUM semantics, and layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def table():
    rng = np.random.RandomState(5)
    n = 400
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], size=n),
            "b": rng.randint(0, 4, size=n).astype(np.int64),
            "v": rng.randn(n) * 10,
        }
    )
    df.loc[rng.choice(n, 25, replace=False), "v"] = np.nan
    # one (a,b) combo that is ALL null -> SQL SUM must be NULL
    df.loc[df.index[:6], ["a", "b"]] = ["z", 3]
    df.loc[(df["a"] == "z") & (df["b"] == 3), "v"] = np.nan
    return df


def _brute(df: pd.DataFrame, sets, gid_of):
    rows = []
    for s in sets:
        if s:
            grp = df.groupby(s, dropna=False)["v"]
            agg = grp.agg(n="count", total="sum", vmin="min", vmax="max")
            agg = agg.reset_index()
        else:
            agg = pd.DataFrame(
                {
                    "n": [df["v"].count()],
                    "total": [df["v"].sum()],
                    "vmin": [df["v"].min()],
                    "vmax": [df["v"].max()],
                }
            )
        for k in ("a", "b"):
            if k not in s:
                agg[k] = np.nan
        agg["grouping_id"] = gid_of(s)
        agg.loc[agg["n"] == 0, "total"] = np.nan
        rows.append(agg[["a", "b", "grouping_id", "n", "total", "vmin", "vmax"]])
    out = pd.concat(rows, ignore_index=True)
    return out.sort_values(
        ["grouping_id", "a", "b"], na_position="last"
    ).reset_index(drop=True)


def _check(got: pd.DataFrame, want: pd.DataFrame):
    got = got.sort_values(
        ["grouping_id", "a", "b"], na_position="last"
    ).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("grouping_id", "n"):
        assert list(got[c]) == list(want[c]), c
    for c in ("total", "vmin", "vmax"):
        g, w = got[c].to_numpy(), want[c].to_numpy()
        ok = np.isclose(g, w, rtol=0, atol=1e-9) | (np.isnan(g) & np.isnan(w))
        assert ok.all(), (c, np.flatnonzero(~ok)[:3])
    for c in ("a",):
        g, w = got[c], want[c]
        assert ((g == w) | (g.isna() & w.isna())).all()


def test_cube_matches_brute(ray_session, table):
    import ray.data as rd

    from tsfeatures_ray.functions.cube import grouping_sets_agg

    got = grouping_sets_agg(
        rd.from_pandas(table).repartition(7), ["a", "b"], "v", mode="cube"
    ).to_pandas()
    # float-coerce b for NaN-able comparison
    got["b"] = got["b"].astype("float64")
    sets = [[], ["a"], ["b"], ["a", "b"]]
    gid_of = lambda s: (2 if "a" not in s else 0) + (1 if "b" not in s else 0)
    _check(got, _brute(table.assign(b=table["b"].astype("float64")), sets, gid_of))
    # SQL convention: first key = MSB
    assert set(got["grouping_id"]) == {0, 1, 2, 3}
    # the engineered all-null group carries n=0, total NULL
    z3 = got[(got["a"] == "z") & (got["b"] == 3) & (got["grouping_id"] == 0)]
    assert len(z3) == 1 and z3["n"].iloc[0] == 0 and np.isnan(z3["total"].iloc[0])


def test_rollup_ladder_and_explicit_sets(ray_session, table):
    import ray.data as rd

    from tsfeatures_ray.functions.cube import grouping_sets_agg

    ds = rd.from_pandas(table)
    roll = grouping_sets_agg(ds, ["a", "b"], "v", mode="rollup").to_pandas()
    # ladder: (a,b) gid 0, (a) gid 1, () gid 3 -- never (b) alone
    assert set(roll["grouping_id"]) == {0, 1, 3}

    ex = grouping_sets_agg(ds, ["a", "b"], "v", sets=[["b"]]).to_pandas()
    assert set(ex["grouping_id"]) == {2}
    assert len(ex) == table["b"].nunique()

    with pytest.raises(ValueError, match="unknown keys"):
        grouping_sets_agg(ds, ["a"], "v", sets=[["nope"]])
    with pytest.raises(ValueError, match="mode"):
        grouping_sets_agg(ds, ["a"], "v", mode="dice")
