"""Strict output-determinism probe: runs selected queries() entries N
times in one Ray session and hashes the result in a ROW-ORDER- and
DTYPE-SENSITIVE way (stricter than tools/check_contract.py, which sorts
before comparing). A driver whose value-hash is sensitive to row order /
dtype drift is simulated exactly by this digest: any run-to-run hash
difference here reproduces a driver hash-red even when values match.

Usage: python tools/hash_stability.py [sf_dir] [repeats] [query ...]
Env:   CHECK_NUM_CPUS (default 8)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def strict_digest(df: pd.DataFrame, sort_rows: bool = False) -> str:
    df = df[sorted(df.columns)]
    if sort_rows and len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    h = hashlib.sha256()
    h.update(("|".join(f"{c}:{df[c].dtype}" for c in df.columns)).encode())
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            h.update("\x00".join("" if v is None else str(v) for v in s).encode())
        else:
            v = np.ascontiguousarray(s.to_numpy())
            if v.dtype.kind == "f":
                v = np.where(np.isnan(v), np.nan, v)  # canonical NaN bits
            h.update(v.tobytes())
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or ["docs_packed", "docs_packed_bpe", "docs_training_corpus"]

    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("CHECK_NUM_CPUS", "8")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    from tools.check_contract import to_df

    qs = entrymod.queries()
    if names == ["all"]:  # sweep the whole registry
        names = list(qs)
    bad = 0
    for name in names:
        digests, sorted_digests = [], []
        for _ in range(repeats):
            df = to_df(qs[name](sf_dir))
            digests.append(strict_digest(df))
            sorted_digests.append(strict_digest(df, sort_rows=True))
        uniq, suniq = sorted(set(digests)), sorted(set(sorted_digests))
        if len(uniq) == 1:
            print(f"STABLE   {name}: {uniq[0]} sorted={suniq[0]} x{repeats}")
        elif len(suniq) == 1:
            print(f"ORDERONLY {name}: sorted={suniq[0]} raw={digests}")
        else:
            bad += 1
            print(f"UNSTABLE {name}: {digests} sorted={sorted_digests}")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
