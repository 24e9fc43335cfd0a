"""Per-partition lineage records + resumable runs (north_rule).

A run is split into:

- stage A (one streaming Dataset job): derive + the conv_id hash shuffle,
  sunk as Parquet partitioned by the stable ``part`` key
  (``derived/part=<p>/``). Recorded in the manifest as one record with
  the input fragment list.
- stage B (per-partition): for each hash partition, rollup (+ optionally
  features) over ``derived/part=<p>`` only, written to a temp dir and
  atomically renamed to ``rollup/part=<p>/``, then a manifest record
  {partition, rows, checksum, inputs} is appended (write+flush+fsync).

Resume = rerun the same command: completed partitions are found in the
manifest (and their output dirs exist) and are skipped; a killed run
therefore never recomputes finished work and the final output is
byte-identical in content. The manifest is JSONL so concurrent readers
see a prefix; a partial last line (crash mid-append) is ignored.

The reference has no checkpoint/resume at all (a failed Pool run
recomputes everything, reference tsfeatures.py:970-976); this module is
the scale-path replacement.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


class Manifest:
    """Append-only JSONL lineage manifest."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        if not os.path.exists(self.path):
            return out
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn write from a crash mid-append
                out[rec["partition"]] = rec
        return out

    def append(self, record: dict) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())


def _df_checksum(df: pd.DataFrame) -> str:
    """Deterministic content checksum (row-order independent)."""
    h = pd.util.hash_pandas_object(
        df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True),
        index=False,
    )
    return hex(int(np.bitwise_xor.reduce(h.to_numpy()) + np.uint64(len(df))))


class _Killed(RuntimeError):
    pass


def run_resumable_rollup(
    sf_dir: str,
    out_dir: str,
    tiers: list[str] | None = None,
    num_parts: int = 8,
    gapfill: bool = False,
    kill_after: int | None = None,
    with_features: bool = False,
) -> dict:
    """Resumable transcripts -> rollup (-> features) run. Returns summary
    stats. Each hash partition's rollup (and, with ``with_features``,
    its feature matrix) is written atomically and recorded in the
    manifest; ``kill_after=k`` aborts after k stage-B partitions (test
    hook for the kill-and-resume gate)."""
    import ray.data as rd

    from ..sources.synth import transcripts_path
    from ..stages.derive import derive_turn_metrics
    from ..stages.features import FeatureKernels
    from ..stages.pack import _pack_partition
    from ..stages.rollup import rollup

    manifest = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    done = manifest.load()
    tpath = transcripts_path(sf_dir)
    derived_dir = os.path.join(out_dir, "derived")

    # ---- stage A: derive + shuffle, partitioned sink -------------------
    if "derived" not in done:
        ds = rd.read_parquet(tpath)
        derived = derive_turn_metrics(ds, num_parts=num_parts)
        tmp = derived_dir + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        derived.write_parquet(tmp, partition_cols=["part"])
        os.replace(tmp, derived_dir)
        manifest.append(
            {
                "partition": "derived",
                "inputs": [tpath],
                "rows": -1,
                "checksum": "",
                "num_parts": num_parts,
            }
        )
        done = manifest.load()

    # ---- stage B: per-partition rollup ---------------------------------
    computed, skipped = 0, 0
    for p in range(num_parts):
        pid = f"part-{p}"
        final = os.path.join(out_dir, "rollup", f"part={p}")
        if pid in done and os.path.exists(final):
            skipped += 1
            continue
        part_dir = os.path.join(derived_dir, f"part={p}")
        if not os.path.exists(part_dir):
            manifest.append(
                {"partition": pid, "inputs": [], "rows": 0, "checksum": "0x0"}
            )
            continue
        ds_p = rd.read_parquet(part_dir)
        rolled = rollup(ds_p, tiers=tiers, gapfill=gapfill, num_parts=2)
        df = rolled.to_pandas()
        tmp = final + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        df.to_parquet(os.path.join(tmp, "data.parquet"), index=False)
        if with_features:
            packed = _pack_partition("token_len_sum")(df)
            feats = FeatureKernels()(packed)
            feats.to_pandas().to_parquet(
                os.path.join(tmp, "features.parquet"), index=False
            )
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.replace(tmp, final)
        manifest.append(
            {
                "partition": pid,
                "inputs": sorted(os.listdir(part_dir)),
                "rows": int(len(df)),
                "checksum": _df_checksum(df.drop(columns=["bucket"])),
            }
        )
        computed += 1
        if kill_after is not None and computed >= kill_after:
            raise _Killed(f"killed after {computed} partitions (test hook)")

    return {"computed": computed, "skipped": skipped, "num_parts": num_parts}


def read_resumable_output(out_dir: str) -> pd.DataFrame:
    """Concatenate the per-partition rollup outputs."""
    parts = []
    base = os.path.join(out_dir, "rollup")
    for d in sorted(os.listdir(base)):
        p = os.path.join(base, d, "data.parquet")
        if os.path.exists(p):
            parts.append(pd.read_parquet(p))
    return pd.concat(parts, ignore_index=True)
