"""Deterministic sampling / splitting / mixture operators for
training-data pipelines.

Everything here is keyed on a 32-bit hash computed with integer
arithmetic that a DuckDB oracle can reproduce EXACTLY. A bare
multiplicative (Knuth) hash is affine in the key, so consecutive keys
hash to values a constant apart and an additive salt merely SHIFTS the
selected set -- per-source mixture draws would be strongly correlated.
Two murmur-style avalanche rounds (public-domain finalizer constants)
fix that while staying a single SQL expression:

    h1 = ((key + salt * 2269549163) * 2654435761) mod 2^32
    h2 = (xor(h1, h1 // 2^16) * 2246822519)       mod 2^32
    h  =  xor(h2, h2 // 2^13)

numpy side: uint64 wraparound arithmetic, then ``% 2**32`` -- identical
to the full-precision value mod 2^32 because 2^32 divides 2^64.
SQL side: the same expression over HUGEINT (no overflow, no wrap
needed); ``// 2^k`` replaces shifts so both sides use plain integer
division.

Selection uses the full 32-bit value against integer thresholds
(``h < floor(fraction * 2^32)``); bucketing uses the HIGH bits via
``(h * k) // 2^32`` (multiplicative hashing mixes high bits well, low
bits poorly). Both are pure integer ops -- engine and oracle agree
bit-for-bit, so sampled/split/mixed outputs are hash-checkable.

Scale notes: every operator is a stateless per-batch filter/tag -- no
shuffle, no driver materialization, runs at full read parallelism.
Determinism means resharding / re-running selects the SAME rows, which
is what makes train/val splits and mixture weights reproducible across
cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

_KNUTH = np.uint64(2654435761)
_SALT_C = np.uint64(2269549163)
_MIX_C = np.uint64(2246822519)
_M32 = np.uint64(1) << np.uint64(32)


def knuth_hash32(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Multiplicative hash + 2 avalanche rounds, mod 2^32 (exact vs the
    HUGEINT SQL expression from hash_sql_expr). Keys must be
    non-negative ints: a negative key would wrap on the uint64 side but
    stay negative in HUGEINT, silently desyncing engine and oracle."""
    if len(keys) and keys.dtype.kind == "i" and int(keys.min()) < 0:
        raise ValueError("sampling keys must be non-negative")
    k = keys.astype(np.uint64, copy=False) + np.uint64(salt) * _SALT_C
    h1 = (k * _KNUTH) % _M32
    h2 = ((h1 ^ (h1 >> np.uint64(16))) * _MIX_C) % _M32
    return h2 ^ (h2 >> np.uint64(13))


def hash_sql_expr(key_col: str, salt: int = 0) -> str:
    """The DuckDB expression computing knuth_hash32 exactly."""
    h1 = (
        f"(((CAST({key_col} AS HUGEINT) + {salt} * 2269549163)"
        f" * 2654435761) % 4294967296)"
    )
    h2 = f"((xor({h1}, {h1} // 65536) * 2246822519) % 4294967296)"
    return f"xor({h2}, {h2} // 8192)"


def _threshold(fraction: float) -> int:
    return int(np.floor(fraction * float(2**32)))


def sample_sql_predicate(key_col: str, fraction: float, salt: int = 0) -> str:
    """The DuckDB predicate that reproduces deterministic_sample exactly
    (exposed so driver oracles stay in lockstep with the engine)."""
    return f"{hash_sql_expr(key_col, salt)} < {_threshold(fraction)}"


def split_sql_expr(key_col: str, fractions: list[float], names: list[str],
                   salt: int = 0) -> str:
    """CASE expression mirroring hash_split's bucket boundaries."""
    bounds = _cum_thresholds(fractions)
    h = hash_sql_expr(key_col, salt)
    branches = "".join(
        f" WHEN {h} < {b} THEN '{n}'" for b, n in zip(bounds, names[:-1])
    )
    return f"CASE{branches} ELSE '{names[-1]}' END"


def _cum_thresholds(fractions: list[float]) -> list[int]:
    cum, out = 0.0, []
    for f in fractions[:-1]:
        cum += f
        out.append(_threshold(cum))
    return out


def deterministic_sample(
    ds: "ray.data.Dataset", fraction: float, key_col: str, salt: int = 0
) -> "ray.data.Dataset":
    """Keep each row iff h(key) < fraction * 2^32 -- a reproducible,
    reshard-stable Bernoulli(fraction) sample keyed on an int column."""
    thr = np.uint64(_threshold(fraction))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash32(df[key_col].to_numpy(), salt)
        return df[h < thr]

    return ds.map_batches(fn, batch_format="pandas")


def hash_split(
    ds: "ray.data.Dataset",
    fractions: list[float],
    names: list[str] | None = None,
    key_col: str = "doc_id",
    salt: int = 0,
) -> "ray.data.Dataset":
    """Tag each row with a deterministic split name ('train'/'val'/...)
    by cumulative-fraction thresholds on the key hash. Fractions must
    sum to 1; the last split absorbs rounding."""
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {sum(fractions)}")
    if names is None:
        names = ["train", "val", "test"][: len(fractions)]
    if len(names) != len(fractions):
        raise ValueError("names and fractions length mismatch")
    bounds = np.array(_cum_thresholds(fractions), dtype=np.uint64)
    arr = np.asarray(names, dtype=object)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash32(df[key_col].to_numpy(), salt)
        df = df.copy()
        df["split"] = arr[np.searchsorted(bounds, h, side="right")]
        return df

    return ds.map_batches(fn, batch_format="pandas")


def weighted_mixture(
    sources: list[tuple[str, "ray.data.Dataset", float]],
    key_col: str = "doc_id",
    salt: int = 0,
    tag_col: str = "source",
) -> "ray.data.Dataset":
    """Deterministic training-data mixture: per-source Bernoulli(rate)
    sample (salted per source so the same key draws independently in
    each), tagged with the source name, unioned into one stream.
    ``sources`` is [(name, dataset, sampling_rate), ...]; rates are
    absolute per-source keep probabilities (compute them from corpus
    sizes + target mixture weights upstream). Union is streaming -- no
    materialization, no shuffle. The tag goes in ``tag_col`` -- if the
    input already carries a column of that name the op raises instead
    of silently overwriting it (pass a different ``tag_col``)."""
    if not sources:
        raise ValueError("weighted_mixture needs at least one source")
    tagged = []
    for i, (name, ds, rate) in enumerate(sources):
        s = deterministic_sample(ds, rate, key_col, salt=salt + i)

        def tag(df: pd.DataFrame, name=name) -> pd.DataFrame:
            if tag_col in df.columns:
                raise ValueError(
                    f"weighted_mixture: input already has a {tag_col!r} "
                    "column; pass a different tag_col"
                )
            df = df.copy()
            df[tag_col] = name
            return df

        tagged.append(s.map_batches(tag, batch_format="pandas"))
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out


def stratified_sample(
    ds: "ray.data.Dataset",
    rates: dict,
    strat_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: int = 0,
) -> "ray.data.Dataset":
    """Per-stratum deterministic sampling: keep a row iff
    ``h(key) < rates[row[strat_col]] * 2^32`` -- the tool for
    rebalancing a skewed corpus (e.g. downsample the dominant language,
    keep all of a rare one). Reshard-stable like ``deterministic_sample``
    (the decision depends only on key, stratum and salt -- never on
    block layout); strata absent from ``rates`` use ``default_rate``.

    The rates dict is broadcast inside the map_batches closure (small
    side read once per task, never shuffled). Oracle: a CASE expression
    over the same shared hash predicate.
    """
    thr = {k: np.uint64(_threshold(v)) for k, v in rates.items()}
    dflt = np.uint64(_threshold(default_rate))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash32(df[key_col].to_numpy(), salt)
        # factorize + LUT: the python lookup runs once per DISTINCT
        # stratum in the batch, not once per row
        codes, uniq = pd.factorize(df[strat_col])
        lut = np.array([thr.get(u, dflt) for u in uniq], dtype=np.uint64)
        return df[h < lut[codes]]

    return ds.map_batches(fn, batch_format="pandas")


def stratified_sql_predicate(
    rates: dict, strat_col: str, key_col: str,
    default_rate: float = 0.0, salt: int = 0,
) -> str:
    """DuckDB predicate reproducing stratified_sample exactly (CASE over
    the shared integer hash)."""
    cases = " ".join(
        f"WHEN {strat_col} = '{k}' THEN {_threshold(v)}"
        for k, v in rates.items()
    )
    return (
        f"{hash_sql_expr(key_col, salt)} < "
        f"(CASE {cases} ELSE {_threshold(default_rate)} END)"
    )


def deterministic_sample_n(
    ds: "ray.data.Dataset",
    n: int,
    key_col: str = "doc_id",
    salt: int = 0,
) -> "ray.data.Dataset":
    """EXACTLY-n deterministic sample: the n rows with the smallest
    key hash (ties by key). Unlike the Bernoulli ``deterministic_sample``
    the output size is fixed, and the chosen set is reshard-stable and
    grows monotonically with n (a larger sample always contains the
    smaller one -- the hash order is a fixed permutation of the corpus).

    Scale shape: per-batch prune to the n smallest BEFORE the exchange
    (only n x batches rows move), one single-group exchange, final
    n-smallest. Oracle: ``ORDER BY hash, key LIMIT n``.
    """
    from .grouped import grouped_top_k

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = knuth_hash32(df[key_col].to_numpy(), salt).astype(np.int64)
        df["__g"] = 0
        return df

    out = grouped_top_k(
        ds.map_batches(add_hash, batch_format="pandas"),
        "__g", "__h", k=n, descending=False, tie_cols=[key_col],
    )
    return out.drop_columns(["__h", "__g", "rk"])


def sample_n_sql(table: str, n: int, key_col: str, salt: int = 0,
                 cols: str = "*") -> str:
    """DuckDB oracle for deterministic_sample_n."""
    h = hash_sql_expr(key_col, salt)
    return (
        f"SELECT {cols} FROM {table} "
        f"ORDER BY {h}, {key_col} LIMIT {n}"
    )


def deterministic_sample_per_group(
    ds: "ray.data.Dataset",
    k: int,
    group_col: str = "event_type",
    key_col: str = "event_id",
    salt: int = 0,
) -> "ray.data.Dataset":
    """EXACTLY-k-per-GROUP deterministic sample: within each group, the
    k rows with the smallest key hash (ties by key) -- the per-stratum
    fixed-size counterpart of ``deterministic_sample_n`` (stratified_
    sample is the per-stratum Bernoulli RATE variant). Reshard-stable,
    monotone in k per group, and the chosen set is independent of how
    groups are laid out across blocks.

    Scale shape: per-batch prune to k-smallest per group BEFORE the
    exchange (only k x groups x batches rows move), one group-hash
    exchange, final per-group k-smallest (grouped_top_k). Oracle:
    ``QUALIFY row_number() OVER (PARTITION BY group ORDER BY hash, key)
    <= k``.
    """
    from .grouped import grouped_top_k

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = knuth_hash32(df[key_col].to_numpy(), salt).astype(np.int64)
        return df

    out = grouped_top_k(
        ds.map_batches(add_hash, batch_format="pandas"),
        group_col, "__h", k=k, descending=False, tie_cols=[key_col],
    )
    return out.drop_columns(["__h", "rk"])


def sample_per_group_sql(
    table: str, k: int, group_col: str, key_col: str, salt: int = 0,
    cols: str = "*",
) -> str:
    """DuckDB oracle for deterministic_sample_per_group."""
    h = hash_sql_expr(key_col, salt)
    return (
        f"SELECT {cols} FROM {table} "
        f"QUALIFY row_number() OVER (PARTITION BY {group_col} "
        f"ORDER BY {h}, {key_col}) <= {k}"
    )


def weighted_sample(
    ds: "ray.data.Dataset",
    weight_col: str,
    scale: int,
    key_col: str = "doc_id",
    salt: int = 0,
) -> "ray.data.Dataset":
    """Deterministic Bernoulli sampling with PER-ROW probability
    p = min(1, weight / scale) -- keep long/high-quality documents with
    probability proportional to their weight (the corpus-rebalancing
    primitive; ``deterministic_sample`` is the constant-rate special
    case). Selection: hash(key) < floor(p * 2^32), all integer
    arithmetic, so engine and oracle agree bit-for-bit and the choice is
    reshard-stable. Stateless per-batch filter, no exchange.

    ``weight_col`` must be non-negative integers (the threshold is
    computed in exact integer arithmetic; float weights would need a
    shared rounding convention)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash32(df[key_col].to_numpy(), salt)
        w = df[weight_col].to_numpy()
        if len(w) and w.dtype.kind == "i" and int(w.min()) < 0:
            raise ValueError("weighted_sample weights must be non-negative")
        thr = np.minimum(
            _M32, (w.astype(np.uint64) * _M32) // np.uint64(scale)
        )
        return df[h < thr]

    return ds.map_batches(fn, batch_format="pandas")


def weighted_sample_sql_predicate(
    weight_col: str, scale: int, key_col: str, salt: int = 0
) -> str:
    """DuckDB predicate computing weighted_sample's selection exactly."""
    h = hash_sql_expr(key_col, salt)
    return (
        f"({h}) < LEAST(4294967296, "
        f"(CAST({weight_col} AS HUGEINT) * 4294967296) // {scale})"
    )
