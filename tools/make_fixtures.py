"""Generate the committed golden-parquet fixtures for the recorded
driver queries.

The fixtures pin the engine's (deterministic) output at sf0.01 so the
driver's rows+schema+hash compare covers queries no live SQL oracle can
express. Two classes:

- kernel recordings (features_recorded_1h, features_recorded_extras_1m,
  features_default_1h, series_extras_1h): every non-SQL kernel gets an
  end-to-end hash gate; spot values hand-verified (FIXTURES.md).
- deterministic-by-seed ops (minhash/simhash/LSH/IVF/HLL/fingerprint/
  media codecs): the fixture pins stability across CPU counts and code
  changes; the CORRECTNESS of each op is pinned by its independent
  pytest gate (brute all-pairs parity, recall floors, HLL error bound,
  codec round-trips) -- see the query docstrings in __ray_entry__.py.

Regenerate ONLY after an intentional, verified semantics change, then
re-verify the relevant independent gate.

Usage: python tools/make_fixtures.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO, "fixtures")

# query name -> sort keys for a stable on-disk row order (None = all
# columns; the driver compare is order-insensitive either way)
RECORDED: dict[str, list[str] | None] = {
    "features_recorded_1h": ["unique_id"],
    "features_recorded_extras_1m": ["unique_id"],
    "features_default_1h": ["unique_id"],
    "series_extras_1h": ["unique_id"],
    "docs_fingerprint": ["doc_id"],
    "docs_bpe_tokens": ["doc_id"],
    "rollup_dtw_pairs_1m": ["id_a", "id_b"],
    "embeddings_knn_sq8": ["query_id", "rank"],
    "docs_packed_bins": ["doc_id"],
    "docs_simhash": ["doc_id"],
    "docs_simhash_dups": ["id_a", "id_b"],
    "docs_near_dups": ["id_a", "id_b"],
    "embeddings_knn_lsh": ["query_id", "rank"],
    "embeddings_knn_lsh_recall": ["query_id"],
    "embeddings_knn_ivf": ["query_id", "rank"],
    "embeddings_kmeans": ["vec_id"],
    "embeddings_semantic_dedup": ["id_a", "id_b"],
    "embeddings_cosine_dups_lsh": ["id_a", "id_b"],
    "events_user_distinct_hll": ["group"],
    "media_features": ["media_id"],
    "media_metadata": ["media_id"],
}


def main():
    import pandas as pd

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[2:]]
    tag = os.path.basename(os.path.normpath(sf_dir))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name, sort_keys in RECORDED.items():
        if only and name not in only:
            continue
        res = qs[name](sf_dir)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        keys = sort_keys or list(df.columns)
        df = df.sort_values(keys, kind="mergesort").reset_index(drop=True)
        out = os.path.join(FIXTURE_DIR, f"{name}_{tag}.parquet")
        df.to_parquet(out, index=False)
        print(f"wrote {out}: {len(df)} rows x {len(df.columns)} cols")
    ray.shutdown()


if __name__ == "__main__":
    main()
