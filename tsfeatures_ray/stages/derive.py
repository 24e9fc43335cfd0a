"""Stage 1: per-turn derived metrics (token length, inter-turn latency).

Ray-Data-first layout:

1. a stateless ``map_batches`` (pyarrow, zero-copy) computes
   ``token_len = utf8_length(text)`` and a stable partition key
   ``part = stable_hash(conv_id) % P`` -- the ONE partitioning key the
   whole engine reuses (SURVEY.md §7);
2. ``groupby("part").map_groups`` (the engine's single full-data
   shuffle) sorts each partition by (conv_id, ts, turn_idx) and computes
   ``latency_us = ts - lag(ts)`` per conversation with vectorized pandas
   (no per-conversation Python calls -- one vectorized pass per
   partition, so tiny conversations cost nothing extra).

Partitioning assumption (documented per SURVEY.md §2 custom-operator
rule): all rows of one conv_id land in one partition; within a
partition, rows are ordered by (conv_id, ts, turn_idx). Downstream
rollup / packing relies only on per-row values, not on this ordering,
because its aggregates are merge-on-read associative partials.

The reference analog is the per-group ``_get_feats`` prep
(tsfeatures.py:887-928) plus m4_data's sort (m4_data.py:106); there it
is a driver-side pandas groupby -- here it is a streaming shuffle that
scales to arbitrarily many conversations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def stable_part(conv_ids, num_parts: int) -> np.ndarray:
    """Deterministic partition id per conv_id (stable across processes;
    pandas' fixed-key siphash, NOT Python hash())."""
    arr = np.asarray(conv_ids, dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(num_parts)).astype(np.int64)


def default_num_parts(n_rows: int | None = None) -> int:
    """Partition count: ~2 partitions per CPU, more when the data is big
    enough that a partition would exceed ~250k rows."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    parts = cpus * 2
    if n_rows:
        parts = max(parts, n_rows // 250_000)
    return max(4, parts)


def _add_token_len_and_part(num_parts: int):
    def fn(batch: pa.Table) -> pa.Table:
        token_len = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        part = stable_part(batch["conv_id"].to_numpy(zero_copy_only=False), num_parts)
        return batch.append_column("token_len", token_len).append_column(
            "part", pa.array(part, type=pa.int64())
        )

    return fn


def _latency_per_partition(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    ts_us = g["ts"].astype("int64")
    same_conv = g["conv_id"].eq(g["conv_id"].shift())
    lat = ts_us.diff()
    lat[~same_conv] = np.nan
    # plain float64 (NaN for turn 0), NOT pandas' masked-Int64 extension
    # dtype: extension arrays serialize differently from Arrow primitives
    # and break value-hash comparison at the contract boundary
    g["latency_us"] = lat.astype("float64")
    return g


def derive_turn_metrics(
    ds: "ray.data.Dataset",
    num_parts: int | None = None,
    slim: bool = False,
) -> "ray.data.Dataset":
    """transcripts Dataset -> per-turn derived Dataset
    (schema.DERIVED_SCHEMA + the reusable ``part`` column).

    ``slim=True`` drops the payload columns (role/text/tool) BEFORE the
    shuffle: the rollup path only needs (conv_id, turn_idx, ts,
    token_len), so shipping text through the exchange would multiply the
    shuffle volume several-fold for nothing. The full variant exists for
    per-turn products that must carry text (the per-row text-equality
    invariant is checked against that path).
    """
    if num_parts is None:
        num_parts = default_num_parts()
    ds = ds.map_batches(
        _add_token_len_and_part(num_parts),
        batch_format="pyarrow",
        batch_size=65536,
    )
    if slim:
        ds = ds.select_columns(["conv_id", "turn_idx", "ts", "token_len", "part"])
    return ds.groupby("part").map_groups(_latency_per_partition, batch_format="pandas")


def _dialogue_stats_partition(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-partition conversation stats: one stable sort,
    boolean masks + a single pandas groupby -- no per-conversation
    Python. Turn order is ``turn_idx`` (unique per conv by schema)."""
    g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    same_conv = g["conv_id"].eq(g["conv_id"].shift())
    g = g.assign(
        _is_user=(g["role"] == "user").astype(np.int64),
        _is_assistant=(g["role"] == "assistant").astype(np.int64),
        _is_tool=(g["role"] == "tool").astype(np.int64),
        _is_call=(g["tool"] != "").astype(np.int64),
        _alt=((g["role"] != g["role"].shift()) & same_conv).astype(np.int64),
        _user_chars=np.where(g["role"] == "user", g["token_len"], 0),
        _asst_chars=np.where(g["role"] == "assistant", g["token_len"], 0),
        # normalize the datetime unit first: pandas 2.x preserves the
        # source resolution (us from parquet, but ns/s from in-memory
        # frames), and a bare int64 cast would change scale with it
        _ts_us=g["ts"].astype("datetime64[us]").astype("int64"),
    )
    grp = g.groupby("conv_id", sort=False)
    out = grp.agg(
        n_turns=("turn_idx", "size"),
        n_user=("_is_user", "sum"),
        n_assistant=("_is_assistant", "sum"),
        n_tool=("_is_tool", "sum"),
        n_tool_calls=("_is_call", "sum"),
        user_chars=("_user_chars", "sum"),
        assistant_chars=("_asst_chars", "sum"),
        alternations=("_alt", "sum"),
        _ts_min=("_ts_us", "min"),
        _ts_max=("_ts_us", "max"),
        avg_turn_len=("token_len", "mean"),
    )
    # distinct non-empty tool names (nunique skips nothing by itself;
    # mask empties first so "" never counts as a tool)
    tools = g.loc[g["_is_call"] == 1].groupby("conv_id", sort=False)["tool"].nunique()
    out["n_distinct_tools"] = tools.reindex(out.index).fillna(0).astype(np.int64)
    out["duration_us"] = out["_ts_max"] - out["_ts_min"]
    out = out.drop(columns=["_ts_min", "_ts_max"]).reset_index()
    cols = [
        "conv_id", "n_turns", "n_user", "n_assistant", "n_tool",
        "n_tool_calls", "n_distinct_tools", "user_chars",
        "assistant_chars", "alternations", "duration_us", "avg_turn_len",
    ]
    out = out[cols]
    for c in cols[1:-1]:
        out[c] = out[c].astype(np.int64)
    out["avg_turn_len"] = out["avg_turn_len"].astype("float64")
    return out


def dialogue_stats(
    ds: "ray.data.Dataset",
    num_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-conversation dialogue statistics over raw transcripts: turn /
    role counts, tool-call count and distinct tools used, per-role
    character volume, role-ALTERNATION count (turn-taking: how often the
    speaker changes between consecutive turns), wall-clock duration and
    mean turn length.

    The transcripts-native sibling of ``derive_turn_metrics``: the same
    ONE ``stable_part(conv_id)`` exchange (role/text payload is reduced
    to token_len + role flags BEFORE the shuffle -- only (conv_id,
    turn_idx, role, tool, ts, token_len) moves, never text), then a
    single vectorized pandas pass per partition. No reference analog
    (the reference never looks at payload columns); engine scope for
    transcript-corpus curation -- e.g. filtering conversations by
    tool-usage or turn-taking profile before feature extraction.
    """
    if num_parts is None:
        num_parts = default_num_parts()

    def slim(batch: pa.Table) -> pa.Table:
        token_len = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        part = stable_part(batch["conv_id"].to_numpy(zero_copy_only=False), num_parts)
        return pa.Table.from_arrays(
            [
                batch["conv_id"].combine_chunks(),
                batch["turn_idx"].combine_chunks(),
                batch["role"].combine_chunks(),
                batch["tool"].combine_chunks(),
                batch["ts"].combine_chunks(),
                token_len,
                pa.array(part, type=pa.int64()),
            ],
            names=["conv_id", "turn_idx", "role", "tool", "ts", "token_len", "part"],
        )

    return (
        ds.map_batches(slim, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(_dialogue_stats_partition, batch_format="pandas")
    )


def role_transitions(
    ds: "ray.data.Dataset",
    num_parts: int | None = None,
) -> "ray.data.Dataset":
    """Corpus-wide role-TRANSITION matrix over transcripts: counts of
    (previous role -> role) across consecutive turns within each
    conversation -- the turn-taking structure statistic (who speaks
    after whom; e.g. how often a tool result is followed by another
    tool call). Same one conv-hash exchange as dialogue_stats, each
    partition reduced to at most |roles|^2 partial rows, then a tiny
    single-group fold."""
    if num_parts is None:
        num_parts = default_num_parts()

    def slim(batch: pa.Table) -> pa.Table:
        part = stable_part(batch["conv_id"].to_numpy(zero_copy_only=False), num_parts)
        return pa.Table.from_arrays(
            [
                batch["conv_id"].combine_chunks(),
                batch["turn_idx"].combine_chunks(),
                batch["role"].combine_chunks(),
                pa.array(part, type=pa.int64()),
            ],
            names=["conv_id", "turn_idx", "role", "part"],
        )

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        same = g["conv_id"].eq(g["conv_id"].shift())
        pairs = pd.DataFrame(
            {"role_from": g["role"].shift()[same], "role_to": g["role"][same]}
        )
        out = (
            pairs.groupby(["role_from", "role_to"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        out["__g"] = 0
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["role_from", "role_to"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    return (
        ds.map_batches(slim, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(count_pairs, batch_format="pandas")
        .groupby("__g")
        .map_groups(
            lambda d: fold(d.drop(columns=["__g"])), batch_format="pandas"
        )
    )


def topic_drift(ds, num_parts: int | None = None):
    """Within-conversation topic drift: cosine similarity between the
    word-count histograms of a conversation's first and second half
    (split at 2*turn_idx < n_turns over the contiguous 0-based
    ordinal). Low cosine = the conversation changed subject. Emits
    (conv_id, tokens_first, tokens_second, cosine_halves) with NaN
    when either half has no tokens (e.g. single-turn conversations).

    All inner products accumulate as exact int64 counts; the one
    division/sqrt is the pinned expression the SQL oracle evaluates.

    Scale shape: per-batch tokenization emits (conv, turn, token,
    count) partials -- the TEXT never shuffles, only bounded token
    counts -- and ONE ``stable_part(conv_id)`` exchange co-locates
    each conversation, whose half split and cosine then run locally."""
    import re

    if num_parts is None:
        num_parts = default_num_parts()
    word = re.compile(r"[a-z]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        convs, turns, toks, cnts = [], [], [], []
        for c, ti, txt in zip(
            df["conv_id"].to_numpy(),
            df["turn_idx"].to_numpy(),
            df["text"].to_numpy(),
        ):
            vc: dict = {}
            for w in word.findall((txt or "").lower()):
                vc[w] = vc.get(w, 0) + 1
            convs.extend([c] * len(vc))
            turns.extend([ti] * len(vc))
            toks.extend(vc.keys())
            cnts.extend(vc.values())
        # marker rows (cnt 0) carry each conv's batch-max turn_idx so n
        # counts token-less turns too (the SQL mx CTE sees ALL turns)
        mk = (
            pd.DataFrame(
                {"conv_id": df["conv_id"], "turn_idx": df["turn_idx"]}
            )
            .groupby("conv_id", sort=False)["turn_idx"]
            .max()
            .reset_index()
        )
        convs.extend(mk["conv_id"].tolist())
        turns.extend(mk["turn_idx"].astype(int).tolist())
        toks.extend([""] * len(mk))
        cnts.extend([0] * len(mk))
        out = pd.DataFrame(
            {
                "conv_id": np.asarray(convs, dtype=object),
                "turn_idx": np.asarray(turns, dtype=np.int64)
                if turns
                else pd.Series([], dtype="int64"),
                "token": pd.Series(toks, dtype="object"),
                "cnt": np.asarray(cnts, dtype=np.int64)
                if cnts
                else pd.Series([], dtype="int64"),
            }
        )
        out["__part"] = stable_part(out["conv_id"].to_numpy(), num_parts)
        return out

    def drift(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv, gc in g.groupby("conv_id", sort=True):
            n = int(gc["turn_idx"].max()) + 1
            gc = gc[gc["cnt"] > 0]  # drop the max-turn marker rows
            if len(gc) == 0:
                continue  # no tokens at all: SQL emits no row either
            half = (2 * gc["turn_idx"].to_numpy() >= n).astype(np.int64)
            piv = (
                pd.DataFrame(
                    {"half": half, "token": gc["token"], "cnt": gc["cnt"]}
                )
                .groupby(["token", "half"], sort=False)["cnt"]
                .sum()
                .unstack("half", fill_value=0)
            )
            c1 = piv[0].to_numpy(dtype=np.int64) if 0 in piv else None
            c2 = piv[1].to_numpy(dtype=np.int64) if 1 in piv else None
            n1 = int(c1.sum()) if c1 is not None else 0
            n2 = int(c2.sum()) if c2 is not None else 0
            if c1 is None or c2 is None:
                cos = np.nan
            else:
                num = int((c1 * c2).sum())
                a2, b2 = int((c1 * c1).sum()), int((c2 * c2).sum())
                if a2 == 0 or b2 == 0:
                    cos = np.nan
                else:
                    cos = float(num) / (np.sqrt(float(a2)) * np.sqrt(float(b2)))
            r = cos + 1e-7
            rows.append(
                (
                    conv, n1, n2,
                    np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5) / 1e6,
                )
            )
        return pd.DataFrame(
            rows,
            columns=["conv_id", "tokens_first", "tokens_second",
                     "cosine_halves"],
        ).astype({"tokens_first": np.int64, "tokens_second": np.int64})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__part")
        .map_groups(drift, batch_format="pandas")
    )
