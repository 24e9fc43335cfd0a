"""Gates for substring-level duplicated-span stats (functions/spans.py):
brute-force parity for exact mode, the winnowing detection guarantee
for the scale mode, and the vectorized rolling hash against direct
polynomial evaluation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from tsfeatures_ray.functions.spans import (
    _codepoints,
    _rolling_hashes,
    _winnow_keep,
    duplicated_span_stats,
)


def _brute_stats(texts: dict[int, str], k: int) -> pd.DataFrame:
    """Reference implementation: python sets over actual substrings."""
    grams: dict[str, set[int]] = {}
    for d, t in texts.items():
        for i in range(max(len(t) - k + 1, 0)):
            grams.setdefault(t[i : i + k], set()).add(d)
    rows = []
    for d, t in sorted(texts.items()):
        n = len(t)
        dup_pos = [
            i
            for i in range(max(n - k + 1, 0))
            if len(grams[t[i : i + k]]) >= 2
        ]
        cover = set()
        for i in dup_pos:
            cover.update(range(i, i + k))
        rows.append(
            {
                "doc_id": d,
                "n_chars": n,
                "n_kgrams": max(n - k + 1, 0),
                "n_dup_kgrams": len(dup_pos),
                "dup_char_cover": len(cover),
            }
        )
    return pd.DataFrame(rows)


def _mk_corpus(seed=0, n_docs=30, dup_every=4, k=12):
    rng = np.random.RandomState(seed)
    alpha = list("abcdefgh éü")  # include multibyte chars
    boiler = "".join(rng.choice(alpha, 40))
    texts = {}
    for d in range(n_docs):
        body = "".join(rng.choice(alpha, int(rng.randint(k, 120))))
        if d % dup_every == 0:  # inject a shared boilerplate span
            cut = len(body) // 2
            body = body[:cut] + boiler + body[cut:]
        texts[d] = body
    return texts


def test_exact_matches_brute(ray_session):
    k = 12
    texts = _mk_corpus(1, k=k)
    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[d] for d in texts]}
        )
    )
    got = duplicated_span_stats(ds, k=k, num_parts=5).to_pandas()
    want = _brute_stats(texts, k)
    got = got.sort_values("doc_id").reset_index(drop=True)
    for c in ("n_chars", "n_kgrams", "n_dup_kgrams", "dup_char_cover"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    frac = got["dup_char_frac"].to_numpy()
    expect = np.where(
        want["n_chars"] > 0, want["dup_char_cover"] / want["n_chars"], 0.0
    )
    assert np.allclose(frac, expect, rtol=0, atol=0)


def test_rolling_hash_equals_direct_polynomial():
    rng = np.random.RandomState(3)
    cp = rng.randint(32, 500, 200).astype(np.uint32)
    k = 9
    h1, h2 = _rolling_hashes(cp, k)
    B1, B2 = 1000003, 998244353
    M = 1 << 64
    for i in (0, 1, 57, len(cp) - k):
        want1 = 0
        want2 = 0
        for j in range(k):
            want1 = (want1 * B1 + int(cp[i + j])) % M
            want2 = (want2 * B2 + int(cp[i + j])) % M
        assert int(h1[i]) == want1 and int(h2[i]) == want2, i


def test_hash_identity_iff_substring_equal():
    texts = _mk_corpus(7, n_docs=12, k=10)
    k = 10
    seen: dict[tuple, str] = {}
    for t in texts.values():
        cp = _codepoints(t)
        if len(cp) < k:
            continue
        h1, h2 = _rolling_hashes(cp, k)
        for i in range(len(h1)):
            key = (int(h1[i]), int(h2[i]))
            sub = t[i : i + k]
            assert seen.setdefault(key, sub) == sub  # no collisions
    # and equal substrings DID produce equal hashes (boilerplate shared)
    assert len(seen) < sum(max(len(t) - k + 1, 0) for t in texts.values())


def test_winnow_guarantee_detects_long_shared_spans(ray_session):
    """Any span of length >= window + k - 1 shared by two docs must be
    flagged in winnow mode (the Schleimer et al. guarantee)."""
    k, window = 8, 6
    rng = np.random.RandomState(5)
    alpha = list("abcdefghijklmnop")
    shared = "".join(rng.choice(alpha, window + k - 1))  # minimal length
    texts = {
        0: "".join(rng.choice(alpha, 60)) + shared,
        1: shared + "".join(rng.choice(alpha, 60)),
        2: "".join(rng.choice(alpha, 80)),  # no injected span
    }
    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[d] for d in texts]}
        )
    )
    got = (
        duplicated_span_stats(ds, k=k, mode="winnow", window=window,
                              num_parts=3)
        .to_pandas().set_index("doc_id")
    )
    assert got.loc[0, "n_dup_kgrams"] >= 1
    assert got.loc[1, "n_dup_kgrams"] >= 1
    assert got.loc[2, "n_dup_kgrams"] == 0


def test_winnow_rightmost_min_selection():
    h = np.array([5, 3, 3, 9, 1, 1, 7], dtype=np.uint64)
    keep = _winnow_keep(h, 3)
    # windows: [5,3,3]->2, [3,3,9]->2, [3,9,1]->4, [9,1,1]->5, [1,1,7]->5
    assert keep.tolist() == [2, 4, 5]


def test_short_and_empty_docs(ray_session):
    texts = {0: "", 1: "abc", 2: "abcdefghijabcdefghij", 3: "abcdefghij"}
    k = 10
    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[d] for d in texts]}
        )
    )
    got = duplicated_span_stats(ds, k=k, num_parts=2).to_pandas()
    got = got.set_index("doc_id")
    assert got.loc[0, "n_kgrams"] == 0 and got.loc[0, "dup_char_frac"] == 0.0
    assert got.loc[1, "n_kgrams"] == 0
    # doc 2 contains doc 3's full text -> both share the 10-gram
    assert got.loc[3, "n_dup_kgrams"] == 1
    assert got.loc[2, "n_dup_kgrams"] >= 1
