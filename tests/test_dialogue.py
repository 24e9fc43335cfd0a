"""dialogue_stats: hand-computed conversation fixture (role counts,
tool-call/distinct-tool counts, per-role char volume, alternations,
duration) and the shuffle-safety property (stats are independent of
input row order and block layout)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _fixture() -> pd.DataFrame:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [
        # conv A: u a u a tool(a->calc) a  -- alternations: u->a,a->u,u->a,
        # a->tool,tool->a = 5
        ("A", 0, "user", "hi", "", base + np.timedelta64(0, "s")),
        ("A", 1, "assistant", "hello!", "", base + np.timedelta64(10, "s")),
        ("A", 2, "user", "add 2+2", "", base + np.timedelta64(25, "s")),
        ("A", 3, "assistant", "sure", "", base + np.timedelta64(30, "s")),
        ("A", 4, "tool", "4", "calculator", base + np.timedelta64(31, "s")),
        ("A", 5, "assistant", "it is 4", "", base + np.timedelta64(40, "s")),
        # conv B: single turn -- 0 alternations, 0 duration
        ("B", 0, "user", "ping", "", base),
        # conv C: two tool calls, same tool twice + one other
        ("C", 0, "user", "x", "", base),
        ("C", 1, "tool", "r1", "browser", base + np.timedelta64(1, "s")),
        ("C", 2, "tool", "r2", "browser", base + np.timedelta64(2, "s")),
        ("C", 3, "tool", "r3", "calculator", base + np.timedelta64(3, "s")),
    ]
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32"})


def test_dialogue_stats_hand_case(ray_session):
    import ray.data as rd

    from tsfeatures_ray.stages.derive import dialogue_stats

    got = (
        dialogue_stats(rd.from_pandas(_fixture()))
        .to_pandas()
        .sort_values("conv_id")
        .set_index("conv_id")
    )
    a = got.loc["A"]
    assert a["n_turns"] == 6 and a["n_user"] == 2 and a["n_assistant"] == 3
    assert a["n_tool"] == 1 and a["n_tool_calls"] == 1
    assert a["n_distinct_tools"] == 1
    assert a["user_chars"] == len("hi") + len("add 2+2")
    assert a["assistant_chars"] == len("hello!") + len("sure") + len("it is 4")
    assert a["alternations"] == 5
    assert a["duration_us"] == 40_000_000
    assert abs(a["avg_turn_len"] - np.mean([2, 6, 7, 4, 1, 7])) < 1e-9

    b = got.loc["B"]
    assert b["n_turns"] == 1 and b["alternations"] == 0 and b["duration_us"] == 0
    assert b["n_distinct_tools"] == 0

    c = got.loc["C"]
    # tool,tool runs: alternations only on role CHANGES (u->t once)
    assert c["alternations"] == 1
    assert c["n_tool_calls"] == 3 and c["n_distinct_tools"] == 2


def test_dialogue_stats_order_and_layout_invariant(ray_session):
    import ray.data as rd

    from tsfeatures_ray.stages.derive import dialogue_stats

    df = _fixture()
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    a = dialogue_stats(rd.from_pandas(df)).to_pandas()
    b = dialogue_stats(
        rd.from_pandas(shuffled).repartition(5), num_parts=3
    ).to_pandas()
    a = a.sort_values("conv_id").reset_index(drop=True)
    b = b.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_role_transitions_hand_case(ray_session):
    import ray.data as rd

    from tsfeatures_ray.stages.derive import role_transitions

    df = _fixture()[["conv_id", "turn_idx", "role"]]
    got = (
        role_transitions(rd.from_pandas(df).repartition(4))
        .to_pandas()
        .set_index(["role_from", "role_to"])["n"]
        .to_dict()
    )
    # conv A: u->a, a->u, u->a, a->tool, tool->a; conv B: none;
    # conv C: u->tool, tool->tool, tool->tool
    assert got == {
        ("user", "assistant"): 2,
        ("assistant", "user"): 1,
        ("assistant", "tool"): 1,
        ("tool", "assistant"): 1,
        ("user", "tool"): 1,
        ("tool", "tool"): 2,
    }


def test_topic_drift_hand_case(ray_session):
    import ray.data as rd

    from tsfeatures_ray.stages.derive import topic_drift

    df = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4 + ["c2"] * 2 + ["c3"],
            "turn_idx": np.array([0, 1, 2, 3, 0, 1, 0], dtype=np.int64),
            "text": [
                "apple banana",          # c1 first half
                "apple apple",
                "cherry date",           # c1 second half
                "cherry cherry",
                "same words",            # c2: identical halves -> cos 1
                "same words",
                "only one turn here",    # c3: empty first half -> NaN
            ],
        }
    )
    got = (
        topic_drift(rd.from_pandas(df), num_parts=3)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    # c1: halves are disjoint vocabularies -> cosine 0
    assert got.loc[0, "cosine_halves"] == 0.0
    assert got.loc[0, "tokens_first"] == 4
    assert got.loc[0, "tokens_second"] == 4
    assert got.loc[1, "cosine_halves"] == 1.0
    # c3: n=1, the single turn 0 is "second half" (2*0 >= 1 is False
    # ... 0 < 1 so it's FIRST half) -> second half empty -> NaN
    assert np.isnan(got.loc[2, "cosine_halves"])


def test_topic_drift_tokenless_turns_count_toward_split(ray_session):
    """A token-less final turn must still push earlier turns into the
    first half (the SQL mx CTE counts ALL turns)."""
    import ray.data as rd

    from tsfeatures_ray.stages.derive import topic_drift

    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": np.array([0, 1, 2, 3], dtype=np.int64),
            # n=4: turns 0,1 first half, 2,3 second; turn 3 tokenless
            "text": ["aa bb", "aa", "cc", "123 456"],
        }
    )
    got = topic_drift(rd.from_pandas(df), num_parts=2).to_pandas()
    assert got.loc[0, "tokens_first"] == 3
    assert got.loc[0, "tokens_second"] == 1
    assert got.loc[0, "cosine_halves"] == 0.0
