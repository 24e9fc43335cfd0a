"""Hypothesis property tests for the round-3 pure-function surfaces
(no Ray needed): PNG round-trip over arbitrary shapes/content, batched
Jaccard vs the reference formulation over arbitrary unicode text, and
HLL determinism/merge laws."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    channels=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, channels, seed):
    from tsfeatures_ray.functions.multimodal import decode_png, encode_png

    rng = np.random.RandomState(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    img = rng.randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(img))
    want = img[:, :, None] if channels == 1 else img
    assert np.array_equal(out, want)


_TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=60,
)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_TEXT, _TEXT), min_size=1, max_size=12))
def test_jaccard_batch_property(pairs):
    from tsfeatures_ray.functions.dedup import jaccard_batch, ngram_jaccard

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = jaccard_batch(a, b)
    want = np.array([ngram_jaccard(x, y) for x, y in pairs])
    assert np.allclose(got, want)
    assert ((got >= 0) & (got <= 1)).all()
    # identity: every doc is a perfect dup of itself
    self_sim = jaccard_batch(a, a)
    assert np.allclose(self_sim, 1.0)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    p=st.integers(4, 14),
    n=st.integers(1, 3000),
)
def test_hll_merge_laws_property(seed, p, n):
    from tsfeatures_ray.functions.sketches import hll_build, hll_merge

    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 10 * n, size=n)
    half = n // 2
    whole = hll_build(vals, p=p)
    merged = hll_merge(hll_build(vals[:half], p=p), hll_build(vals[half:], p=p))
    # split-merge == whole (register max is exact over any partition)
    assert np.array_equal(whole, merged)
    # idempotence + commutativity
    assert np.array_equal(hll_merge(whole, whole), whole)
    a, b = hll_build(vals[:half], p=p), hll_build(vals[half:], p=p)
    assert np.array_equal(hll_merge(a, b), hll_merge(b, a))


class TestApproxTopTokens:
    def test_misra_gries_bound_vs_exact(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions.sketches import approx_top_tokens
        from tsfeatures_ray.functions.text import top_tokens

        rng = np.random.default_rng(31)
        vocab = np.array([f"tok{i}" for i in range(400)])
        # zipf-ish corpus: heavy head, long tail
        weights = 1.0 / np.arange(1, len(vocab) + 1)
        weights /= weights.sum()
        docs = [
            " ".join(rng.choice(vocab, size=60, p=weights))
            for _ in range(300)
        ]
        ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(docs)),
                                          "text": docs}))
        exact = top_tokens(ds, k=400)
        true = dict(zip(exact["token"], exact["cnt"]))
        approx = approx_top_tokens(ds, k=20, sketch_k=64).to_pandas()
        slack = int(approx["max_undercount"].iloc[0])
        for t, est in zip(approx["token"], approx["est_count"]):
            assert est <= true[t], (t, est, true[t])
            assert true[t] - est <= slack, (t, est, true[t], slack)
        # every token whose true count dominates the slack must appear
        must = {t for t, c in true.items() if c > slack}
        got = set(approx["token"])
        assert must <= got or len(must) > 20, (len(must), slack)

    def test_small_vocab_is_exact(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions.sketches import approx_top_tokens
        from tsfeatures_ray.functions.text import top_tokens

        docs = ["alpha beta beta gamma", "alpha alpha delta"] * 10
        ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(docs)),
                                          "text": docs}))
        approx = approx_top_tokens(ds, k=10, sketch_k=100).to_pandas()
        assert int(approx["max_undercount"].iloc[0]) == 0
        exact = top_tokens(ds, k=10)
        assert dict(zip(approx["token"], approx["est_count"])) == dict(
            zip(exact["token"], exact["cnt"])
        )


class TestExactQuantile:
    def test_matches_numpy_kth(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions.sketches import exact_kth_smallest

        rng = np.random.default_rng(17)
        v = rng.normal(size=20_000) * 100
        ds = rd.from_pandas(pd.DataFrame({"value": v}))
        s = np.sort(v)
        for k in (1, 7, 10_000, 19_999, 20_000):
            got = exact_kth_smallest(ds, "value", k, bins=64,
                                     pull_threshold=500)
            assert got == s[k - 1], (k, got, s[k - 1])

    def test_quantile_vs_sql_rank(self, ray_session):
        import duckdb
        import ray.data as rd

        from tsfeatures_ray.functions.sketches import exact_quantile

        rng = np.random.default_rng(5)
        v = np.round(rng.exponential(size=5000) * 10, 3)  # many ties
        ds = rd.from_pandas(pd.DataFrame({"value": v}))
        for q in (0.01, 0.5, 0.95, 1.0):
            got = exact_quantile(ds, "value", q, n=len(v), bins=32,
                                 pull_threshold=200)
            k = max(1, int(np.ceil(q * len(v))))
            want = duckdb.sql(
                f"SELECT value FROM (SELECT unnest(?) AS value) "
                f"ORDER BY value LIMIT 1 OFFSET {k - 1}",
                params=[v.tolist()],
            ).fetchone()[0]
            assert got == want, (q, got, want)

    def test_empty_and_bad_args(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions.sketches import (
            exact_kth_smallest,
            exact_quantile,
        )

        ds = rd.from_pandas(pd.DataFrame({"value": [1.0, 2.0]}))
        with pytest.raises(ValueError):
            exact_kth_smallest(ds, "value", 0)
        with pytest.raises(ValueError):
            exact_kth_smallest(ds, "value", 5)
        with pytest.raises(ValueError):
            exact_quantile(ds, "value", 0.0)
        empty = rd.from_pandas(pd.DataFrame({"value": np.array([], "float64")}))
        with pytest.raises(ValueError, match="empty"):
            exact_kth_smallest(empty, "value", 1)

    def test_constant_column(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions.sketches import exact_kth_smallest

        ds = rd.from_pandas(pd.DataFrame({"value": np.full(1000, 3.5)}))
        assert exact_kth_smallest(ds, "value", 500) == 3.5
