"""Survivorship merge ("golden record"): collapse an entity's event
history into one row using per-attribute rules -- the record-linkage
consolidation step every warehouse runs after identity resolution.

Data-ops operator (no reference analog; the reference is per-series
features, tsfeatures/tsfeatures.py): distinct from the CDC last-writer
-wins upsert (stages/retention-style whole-row merge) because each
ATTRIBUTE picks its own winner: "last event_type overall", "last value
among purchase rows", "first timestamp", "row count" -- per-column
recency rules with optional row filters.

Scale shape: per-batch partials shrink every block to at most one row
per key BEFORE the exchange (classic combiner), so the groupby moves
|keys| x |blocks| slim rows no matter how large the log is; the final
per-key merge compares (ts, order) tiebreak tuples, which makes the
partial/merge composition exactly associative -- batch boundaries
cannot change the winner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.derive import default_num_parts


def _rule_cols(rule: dict) -> list[str]:
    n = rule["name"]
    how = rule["how"]
    if how in ("last", "first"):
        return [n, f"{n}__t", f"{n}__o"]
    return [n]


def golden_record(
    ds,
    key: str,
    ts: str,
    order: str,
    rules: list[dict],
    num_parts: int | None = None,
):
    """One row per ``key`` with one column per rule. Each rule is a
    dict: ``{"name": out_col, "how": "last"|"first"|"count"|"min"|
    "max", "col": source col (all but count), "when": (col, value)
    optional row filter}``. ``last``/``first`` pick the source value at
    the key's max/min (ts, order) among matching rows (NaN/NaT when no
    row matches); ``count`` counts matching rows; ``min``/``max`` are
    plain associative extremes. Values pass through untouched -- no
    arithmetic, so floats are bit-identical to an arg_max/FILTER SQL
    oracle.

    Output keys are the union of keys matched by AT LEAST ONE rule;
    include an unfiltered rule (e.g. a ``count`` over all rows) when
    every key must appear."""
    if num_parts is None:
        num_parts = default_num_parts()
    for r in rules:
        if r["how"] not in ("last", "first", "count", "min", "max"):
            raise ValueError(f"unknown how {r['how']!r} in rule {r}")
        if r["how"] != "count" and "col" not in r:
            raise ValueError(f"rule {r} needs a source col")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pieces = []
        for r in rules:
            n, how = r["name"], r["how"]
            sub = df
            if "when" in r:
                wcol, wval = r["when"]
                sub = sub[sub[wcol] == wval]
            if how == "count":
                p = (
                    sub.groupby(key, sort=False)
                    .size()
                    .rename(n)
                    .reset_index()
                )
                p[n] = p[n].astype(np.int64)
            elif how in ("min", "max"):
                p = (
                    getattr(sub.groupby(key, sort=False)[r["col"]], how)()
                    .rename(n)
                    .reset_index()
                )
            else:
                s = sub.sort_values([key, ts, order], kind="mergesort")
                pick = (
                    s.groupby(key, sort=False).tail(1)
                    if how == "last"
                    else s.groupby(key, sort=False).head(1)
                )
                # built column-by-column: a rule whose col IS the ts or
                # order column must not create duplicate names
                p = pd.DataFrame(
                    {
                        key: pick[key].to_numpy(),
                        n: pick[r["col"]].to_numpy(),
                        f"{n}__t": pick[ts].to_numpy(),
                        f"{n}__o": pick[order].to_numpy(),
                    }
                )
            pieces.append(p.set_index(key))
        out = pd.concat(pieces, axis=1, join="outer").reset_index()
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        row: dict = {key: [g[key].iloc[0]]}
        for r in rules:
            n, how = r["name"], r["how"]
            if how == "count":
                row[n] = [np.int64(g[n].fillna(0).sum())]
            elif how in ("min", "max"):
                s = g[n].dropna()
                row[n] = [getattr(s, how)() if len(s) else np.nan]
            else:
                t = g[f"{n}__t"]
                ok = t.notna()
                if not ok.any():
                    # typed missing: NaT for datetime sources keeps the
                    # column dtype stable across per-key group outputs
                    row[n] = [pd.NaT if g[n].dtype.kind == "M" else np.nan]
                    continue
                sub = g.loc[ok, [n, f"{n}__t", f"{n}__o"]]
                idx = np.lexsort(
                    (sub[f"{n}__o"].to_numpy(), sub[f"{n}__t"].to_numpy())
                )
                pick = idx[-1] if how == "last" else idx[0]
                row[n] = [sub[n].iloc[pick]]
        out = pd.DataFrame(row)
        for c in out.columns:  # dict construction re-infers ns; pin us
            if out[c].dtype.kind == "M":
                out[c] = out[c].astype("datetime64[us]")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key)
        .map_groups(merge, batch_format="pandas")
    )
