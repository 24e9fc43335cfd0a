"""Generate the committed golden-parquet fixtures for the recorded
driver queries (features_recorded_1h, features_recorded_extras_1m).

The fixtures pin the engine's rounded output at sf0.01 so the driver's
rows+schema+hash compare covers every kernel -- including the
non-SQL-expressible ones (entropy, pacf, stl, holt, hw, heterogeneity,
hurst, nonlinearity, arch_stat, guerrero). Regenerate ONLY after an
intentional, verified kernel-semantics change, then re-verify spot
values (FIXTURES.md documents the spot checks).

Usage: python tools/make_fixtures.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO, "fixtures")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tag = os.path.basename(os.path.normpath(sf_dir))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name in ("features_recorded_1h", "features_recorded_extras_1m"):
        df = entrymod.queries()[name](sf_dir).to_pandas()
        df = df.sort_values("unique_id", kind="mergesort").reset_index(drop=True)
        out = os.path.join(FIXTURE_DIR, f"{name}_{tag}.parquet")
        df.to_parquet(out, index=False)
        print(f"wrote {out}: {len(df)} rows x {len(df.columns)} cols")
    ray.shutdown()


if __name__ == "__main__":
    main()
