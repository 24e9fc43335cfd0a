"""Connected components over near-dup edges: random-graph equivalence
against a pure-Python union-find oracle, multi-hop convergence, string
ids, the non-convergence guard, and the dedup_components composite's
transitive-cluster semantics (A~B, B~C with no A~C edge must collapse
to one cluster -- the property pairwise purging cannot express)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _union_find_components(edges: pd.DataFrame) -> dict:
    """Oracle: min-id component per node via union-find."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(edges["id_a"], edges["id_b"]):
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    roots: dict = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_connected_components_random_graph_vs_union_find(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.graph import connected_components

    rng = np.random.RandomState(7)
    # 400 nodes, 300 random edges -> a mix of singleton-free clusters,
    # chains, and mid-size components
    edges = pd.DataFrame(
        {
            "id_a": rng.randint(0, 400, size=300).astype(np.int64),
            "id_b": rng.randint(0, 400, size=300).astype(np.int64),
        }
    )
    edges = edges[edges["id_a"] != edges["id_b"]].reset_index(drop=True)
    got = (
        connected_components(rd.from_pandas(edges), num_parts=6)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = _union_find_components(edges)
    assert len(got) == len(want)
    for n, c in zip(got["node"], got["component"]):
        assert want[n] == c, (n, c, want[n])


def test_connected_components_long_path_multi_round(ray_session):
    """A 40-hop path needs many propagation rounds -- exercises the
    iteration loop well past round 2 and the convergence detector."""
    import ray.data as rd

    from tsfeatures_ray.functions.graph import connected_components

    n = 41
    edges = pd.DataFrame(
        {"id_a": np.arange(n - 1, 0, -1), "id_b": np.arange(n, 1, -1)}
    )
    got = connected_components(rd.from_pandas(edges)).to_pandas()
    assert sorted(got["node"]) == list(range(1, n + 1))
    assert (got["component"] == 1).all()


def test_connected_components_string_ids_and_max_iters(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.graph import connected_components

    edges = pd.DataFrame({"id_a": ["c", "b", "x"], "id_b": ["b", "a", "y"]})
    got = (
        connected_components(rd.from_pandas(edges))
        .to_pandas()
        .set_index("node")["component"]
        .to_dict()
    )
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    # non-convergence guard: a path longer than max_iters raises rather
    # than returning a silently split clustering
    long_path = pd.DataFrame({"id_a": np.arange(9), "id_b": np.arange(1, 10)})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_pandas(long_path), max_iters=2)


def test_dedup_components_transitive_cluster(ray_session):
    """A~B and B~C above threshold with A~C below it: the component
    assignment must still place all three in one cluster."""
    import ray.data as rd

    from tsfeatures_ray.functions.dedup import ngram_jaccard
    from tsfeatures_ray.functions.graph import dedup_components

    rng = np.random.RandomState(0)
    base = "".join(
        chr(ord("a") + c) if c < 26 else " " for c in rng.randint(0, 30, size=800)
    )

    def mutate(text: str, positions, seed: int) -> str:
        r = np.random.RandomState(seed)
        chars = list(text)
        for i in positions:
            chars[i] = chr(ord("a") + r.randint(26))
        return "".join(chars)

    # 10 point mutations in the first half, then 10 more in the second:
    # each step keeps jaccard ~0.88 but the combined edit falls to ~0.78
    mid = mutate(base, range(50, 350, 30), 1)
    far = mutate(mid, range(450, 750, 30), 2)
    # chain: base~mid and mid~far are near-dups; base~far falls below
    assert ngram_jaccard(base, mid) >= 0.8
    assert ngram_jaccard(mid, far) >= 0.8
    assert ngram_jaccard(base, far) < 0.8

    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 4, 5], dtype=np.int64),
            "text": [base, mid, far, "completely different text " * 30, base],
        }
    )
    got = (
        dedup_components(rd.from_pandas(docs), threshold=0.8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [1, 2, 3, 4, 5]
    # 1,2,3 chain into one cluster (min id 1); 5 is an exact dup of 1;
    # 4 is a singleton mapped to itself
    assert list(got["component"]) == [1, 1, 1, 4, 1]
    assert got["component"].dtype == np.int64
    # keep-rule: doc_id == component retains exactly one doc per cluster
    keep = got[got["doc_id"] == got["component"]]
    assert list(keep["doc_id"]) == [1, 4]


def test_dedup_components_minhash_scale_path(ray_session):
    """The MinHash-LSH pair generator plugs into the same component
    machinery; on near-identical duplicates (jaccard ~0.98, far above
    the banding recall floor) it must produce the same clusters as the
    exact path."""
    import ray.data as rd

    from tsfeatures_ray.functions.graph import dedup_components

    rng = np.random.RandomState(2)
    base = "".join(
        chr(ord("a") + c) if c < 26 else " " for c in rng.randint(0, 30, size=900)
    )

    def tweak(text, i, seed):
        r = np.random.RandomState(seed)
        chars = list(text)
        chars[i] = chr(ord("a") + r.randint(26))
        return "".join(chars)

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                base, tweak(base, 100, 1), tweak(base, 700, 2),
                "completely different " * 40,
                "another unrelated text " * 40,
                base,
            ],
        }
    )
    exact = (
        dedup_components(rd.from_pandas(docs), threshold=0.8)
        .to_pandas().sort_values("doc_id")["component"].tolist()
    )
    mh = (
        dedup_components(rd.from_pandas(docs), threshold=0.8, method="minhash")
        .to_pandas().sort_values("doc_id")["component"].tolist()
    )
    assert exact == [0, 0, 0, 3, 4, 0]
    assert mh == exact

    with pytest.raises(ValueError, match="method"):
        dedup_components(rd.from_pandas(docs), method="simhashish")
