"""Broadcast-side joins (SURVEY.md §2.4 J1/J2/J6).

The reference joins computed feature columns back onto the base table with a
pandas merge (``/root/reference/forecastframe/utilities.py:157-186``). At
scale the rolled-up side is orders of magnitude smaller than the base grain,
so we broadcast it once via ``ray.put`` and hash-join inside ``map_batches``
— no shuffle of the big side. When both sides are large, use a key-bucketed
join instead (documented in SURVEY.md §2.4; not needed by any reference op).
"""

from __future__ import annotations

import pandas as pd
import ray


def broadcast_left_join(ds, small_df: pd.DataFrame, on: list[str]):
    """``ds LEFT JOIN small_df USING (on)`` — small side shipped to the object
    store once, merged per batch with a vectorized pandas merge."""
    overlapping = [c for c in small_df.columns if c not in on and c in ds.schema().names]
    if overlapping:
        small_df = small_df.drop(columns=overlapping)
    ref = ray.put(small_df)

    class Joiner:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, how="left", on=list(on))

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=(1, 8))


def broadcast_semi_join(ds, keys_df: pd.DataFrame, on: list[str], anti: bool = False):
    """Keep (or drop, ``anti=True``) rows whose key tuple appears in
    ``keys_df`` — broadcast key-set filter, no shuffle."""
    key_index = pd.MultiIndex.from_frame(keys_df[list(on)].drop_duplicates())
    ref = ray.put(key_index)

    class Filterer:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mask = pd.MultiIndex.from_frame(batch[list(on)]).isin(self.keys)
            return batch[~mask] if anti else batch[mask]

    return ds.map_batches(Filterer, batch_format="pandas", concurrency=(1, 8))
