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


def _rollup_partition_local(
    part_dir: str,
    tmp_dir: str,
    tiers: list[str] | None,
    gapfill: bool,
    with_features: bool,
    sleep_s: float = 0.0,
) -> dict:
    """Stage-B body for ONE hash partition, pandas-local: the partition
    is 1/num_parts of the input by construction, so the partial+merge
    runs in-process (the same ``_partial_agg`` -> ``_final_merge``
    kernels the distributed ``rollup()`` applies, hence identical rows)
    and writes to ``tmp_dir``; the caller owns the atomic rename and the
    manifest append. Runs as a Ray task so K missing partitions recover
    in ~max(partition) wall, not ~sum. ``sleep_s`` is a test hook that
    makes the parallel-recovery timing gate deterministic."""
    import time as _time

    from ..stages.features import FeatureKernels
    from ..stages.pack import _pack_partition
    from ..stages.rollup import DEFAULT_SPEC, TIERS, _final_merge, _partial_agg

    if sleep_s:
        _time.sleep(sleep_s)
    spec = DEFAULT_SPEC
    tier_objs = [TIERS[t] for t in (tiers or list(TIERS))]
    tier_widths = {t.name: t.bucket_us for t in tier_objs}
    df_in = pd.read_parquet(part_dir)
    partials = _partial_agg(tier_objs, spec)(df_in)
    df = _final_merge(gapfill, tier_widths, spec)(partials)
    if os.path.exists(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)  # stale temp from a killed run
    os.makedirs(tmp_dir, exist_ok=True)
    df.to_parquet(os.path.join(tmp_dir, "data.parquet"), index=False)
    if with_features:
        packed = _pack_partition("token_len_sum")(df)
        feats = FeatureKernels()(packed)
        feats.to_pandas().to_parquet(
            os.path.join(tmp_dir, "features.parquet"), index=False
        )
    return {
        "rows": int(len(df)),
        "checksum": _df_checksum(df.drop(columns=["bucket"])),
    }


def run_resumable_rollup(
    sf_dir: str,
    out_dir: str,
    tiers: list[str] | None = None,
    num_parts: int = 8,
    gapfill: bool = False,
    kill_after: int | None = None,
    with_features: bool = False,
    _test_sleep_s: float = 0.0,
) -> dict:
    """Resumable transcripts -> rollup (-> features) run. Returns summary
    stats. Each hash partition's rollup (and, with ``with_features``,
    its feature matrix) is written atomically and recorded in the
    manifest; ``kill_after=k`` aborts after k stage-B partitions (test
    hook for the kill-and-resume gate). Missing partitions are
    recomputed as PARALLEL Ray tasks -- the driver keeps only the
    atomic rename + manifest bookkeeping, in task-completion order, so
    recovering K partitions costs ~max(partition) wall, not ~sum."""
    import ray
    import ray.data as rd

    from ..sources.synth import transcripts_path
    from ..stages.derive import derive_turn_metrics

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

    # ---- stage B: per-partition rollup, parallel Ray tasks -------------
    computed, skipped = 0, 0
    task = ray.remote(num_cpus=1)(_rollup_partition_local)
    pending: dict = {}  # ObjectRef -> (pid, part_dir, tmp, final)
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
        tmp = final + ".tmp"
        ref = task.remote(
            part_dir, tmp, tiers, gapfill, with_features, _test_sleep_s
        )
        pending[ref] = (pid, part_dir, tmp, final)

    # rename + manifest bookkeeping in completion order: only the 8-byte
    # summary record crosses back to the driver, never partition data
    try:
        while pending:
            ready, _ = ray.wait(list(pending), num_returns=1)
            ref = ready[0]
            pid, part_dir, tmp, final = pending.pop(ref)
            rec = ray.get(ref)
            if os.path.exists(final):
                import shutil

                shutil.rmtree(final)
            os.replace(tmp, final)
            manifest.append(
                {
                    "partition": pid,
                    "inputs": sorted(os.listdir(part_dir)),
                    "rows": rec["rows"],
                    "checksum": rec["checksum"],
                }
            )
            computed += 1
            if kill_after is not None and computed >= kill_after:
                raise _Killed(
                    f"killed after {computed} partitions (test hook)"
                )
    finally:
        # on abort (kill hook / driver error) stop in-flight work so a
        # rerun in the same Ray session never races stale writers on the
        # temp dirs it is about to reuse
        for ref in pending:
            ray.cancel(ref, force=True)

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
