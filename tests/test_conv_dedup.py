"""conversation_fingerprints: injected duplicate conversations (same
texts, same order) are detected; reordered or edited conversations are
NOT duplicates; canonical = min conv_id per hash; layout invariance."""

from __future__ import annotations

import hashlib

import pandas as pd


def _conv(cid: str, texts: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        {"conv_id": cid, "turn_idx": range(len(texts)), "text": texts}
    )


def test_conversation_fingerprints(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.dedup import conversation_fingerprints

    texts = ["hello", "hi there", "bye"]
    df = pd.concat(
        [
            _conv("a1", texts),
            _conv("a2", texts),                      # exact dup of a1
            _conv("b1", ["hello", "bye", "hi there"]),  # same set, other ORDER
            _conv("c1", ["hello", "hi there", "bye!"]),  # one edited turn
        ],
        ignore_index=True,
    )
    shuffled = df.sample(frac=1.0, random_state=9).reset_index(drop=True)
    got = (
        conversation_fingerprints(rd.from_pandas(shuffled).repartition(4))
        .to_pandas()
        .sort_values("conv_id")
        .set_index("conv_id")
    )
    assert (got["n_turns"] == 3).all()
    # a1/a2 collide; order and edits change the hash
    assert got.loc["a1", "conv_hash"] == got.loc["a2", "conv_hash"]
    assert got["conv_hash"].nunique() == 3
    assert got["is_canonical"].to_dict() == {"a1": 1, "a2": 0, "b1": 1, "c1": 1}
    # the hash is plain md5 over chr(31)-joined texts -- pin the format
    want = hashlib.md5(chr(31).join(texts).encode()).hexdigest()
    assert got.loc["a1", "conv_hash"] == want
