"""Driver-simulation harness: runs every queries() entry at a given sf
and compares row-count / schema / order-insensitive values against the
matching oracle_sql() via DuckDB -- the same gate the round driver
applies. Usage: python tools/check_contract.py [sf_dir] [query ...]"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(res) -> pd.DataFrame:
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # pyarrow.Table


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith(("Int", "UInt", "int", "uint", "Float")):
            df[c] = s.astype("float64")
        elif str(s.dtype).startswith("datetime"):
            df[c] = s.astype("datetime64[us]").astype("int64").astype("float64")
        elif s.dtype == bool or str(s.dtype) == "boolean":
            df[c] = s.astype("float64")
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if len(got) != len(want):
        errs.append(f"rowcount {len(got)} != {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"schema {sorted(got.columns)} != {sorted(want.columns)}")
        return errs
    g, w = normalize(got), normalize(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c].to_numpy(), w[c].to_numpy()
            if gv.dtype.kind == "f":
                ok = (gv == wv) | (np.isnan(gv) & np.isnan(wv))
            else:
                ok = gv == wv
            if not ok.all():
                bad = np.flatnonzero(~ok)[:3]
                errs.append(
                    f"col {c}: {len(np.flatnonzero(~ok))} mismatches, e.g. "
                    f"idx {bad.tolist()} got={gv[bad].tolist()} want={wv[bad].tolist()}"
                )
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("CHECK_NUM_CPUS", "8")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows  ({dt:.1f}s)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        errs = compare(name, got, want)
        if errs:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s):")
            for e in errs:
                print(f"      {e}")
        else:
            print(f"OK   {name}: {len(got)} rows match oracle  ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
