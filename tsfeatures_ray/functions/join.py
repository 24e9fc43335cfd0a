"""Broadcast hash join (SURVEY.md §2.4): the reference's only join shape
is panel-to-small-metadata (reference m4_data.py:117 ``df.merge(m4_info)``).
At scale the small side is broadcast once via ``ray.put`` and read in
each actor's ``__init__`` -- never re-shipped per batch, never shuffled.
Semi/anti joins reuse the same shape with a key-set filter.
"""

from __future__ import annotations

import pandas as pd

import ray


class _BroadcastJoiner:
    def __init__(self, small_ref, left_on, right_on, how, semi, anti):
        small = ray.get(small_ref)  # broadcast read, once per actor
        self.small = small.set_index(right_on) if not (semi or anti) else None
        self.keys = set(small[right_on]) if (semi or anti) else None
        self.left_on, self.right_on = left_on, right_on
        self.how, self.semi, self.anti = how, semi, anti

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.semi:
            return batch[batch[self.left_on].isin(self.keys)]
        if self.anti:
            return batch[~batch[self.left_on].isin(self.keys)]
        return batch.merge(
            self.small, left_on=self.left_on, right_index=True, how=self.how
        )


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pd.DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Join a streaming Dataset against a small in-memory dimension
    table. ``how`` in {'inner', 'left'}; 'semi' / 'anti' filter by key
    membership only."""
    semi = how == "semi"
    anti = how == "anti"
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs={
            "small_ref": ref,
            "left_on": left_on,
            "right_on": right_on,
            "how": how if how in ("inner", "left") else "inner",
            "semi": semi,
            "anti": anti,
        },
        batch_format="pandas",
        batch_size=65536,
        concurrency=concurrency,
        num_cpus=1,
    )
