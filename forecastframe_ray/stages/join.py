"""Broadcast-side joins (SURVEY.md §2.4 J1/J2/J6).

The reference joins computed feature columns back onto the base table with a
pandas merge (``/root/reference/forecastframe/utilities.py:157-186``). At
scale the rolled-up side is orders of magnitude smaller than the base grain,
so we broadcast it once via ``ray.put`` and hash-join inside ``map_batches``
— no shuffle of the big side. When both sides are large, use a key-bucketed
join instead (documented in SURVEY.md §2.4; not needed by any reference op).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


#: broadcast objects under this size run as PLAIN TASKS (per-call
#: ``ray.get`` is a local object-store fetch after the first access on a
#: node); only larger objects justify an actor pool's deserialize-once —
#: actor-pool spin-up costs ~1-2 s, a serial floor every broadcast stage
#: would otherwise pay.
_ACTOR_BYTES = 32 << 20


def _df_bytes(obj) -> int:
    try:
        return int(obj.memory_usage(deep=True).sum())
    except AttributeError:
        return _ACTOR_BYTES + 1  # unknown → be safe, use the actor pool


def broadcast_left_join(ds, small_df: pd.DataFrame, on: list[str]):
    """``ds LEFT JOIN small_df USING (on)`` — small side shipped to the object
    store once, merged per batch with a vectorized pandas merge."""
    overlapping = [c for c in small_df.columns if c not in on and c in ds.schema().names]
    if overlapping:
        small_df = small_df.drop(columns=overlapping)
    small_bytes = _df_bytes(small_df)
    ref = ray.put(small_df)

    if small_bytes <= _ACTOR_BYTES:
        def join_fn(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(ray.get(ref), how="left", on=list(on))

        return ds.map_batches(join_fn, batch_format="pandas")

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
    small = key_index.memory_usage(deep=True) <= _ACTOR_BYTES
    ref = ray.put(key_index)

    if small:
        def filter_fn(batch: pd.DataFrame) -> pd.DataFrame:
            mask = pd.MultiIndex.from_frame(batch[list(on)]).isin(ray.get(ref))
            return batch[~mask] if anti else batch[mask]

        return ds.map_batches(filter_fn, batch_format="pandas")

    class Filterer:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mask = pd.MultiIndex.from_frame(batch[list(on)]).isin(self.keys)
            return batch[~mask] if anti else batch[mask]

    return ds.map_batches(Filterer, batch_format="pandas", concurrency=(1, 8))


_JOIN_TYPES = {"inner": "inner", "left": "left_outer",
               "right": "right_outer", "outer": "full_outer"}


def hash_join(left, right, on: list[str], how: str = "inner",
              num_partitions: int = 32):
    """Distributed hash join for the both-sides-large case (J3; SURVEY.md
    §2.4) — wraps ``Dataset.join`` (hash-partition exchange on ``on``).
    Prefer :func:`broadcast_left_join` whenever one side is small.

    ``num_partitions`` is CLAMPED to the cluster CPU count: Ray Data's
    JoinOperator keeps one aggregator task per partition resident for the
    whole exchange, so partitions beyond the schedulable slots deadlock the
    streaming DAG (measured: a 359-partition join on 32 CPUs sat at 0
    output blocks for 78 min with the box idle; 35 partitions completed).
    A caller that needs per-partition heap smaller than data/CPUs should
    use a ``groupby(part).map_groups`` merge (sort exchange, no resident
    aggregators) instead — see ``pipelines/dedup.py`` verify text-attach.

    The clamp is LOGGED (warning) when it bites: a caller that sized
    ``num_partitions`` to bound per-task heap gets proportionally fatter
    partitions on a small-CPU cluster — if the clamped partition size can
    exceed a worker heap, switch that call site to the sort-exchange merge
    pattern above (ADVICE r3)."""
    import logging

    import ray

    if ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", num_partitions))
        clamped = max(2, min(num_partitions, ncpu))
        if clamped < num_partitions:
            logging.getLogger(__name__).warning(
                "hash_join: clamping num_partitions %d -> %d (cluster CPU "
                "slots; Ray's JoinOperator keeps one resident aggregator "
                "per partition and deadlocks past the slot count). "
                "Per-partition heap grows by the same factor — use a "
                "groupby(part).map_groups merge if that can exceed a "
                "worker's memory.", num_partitions, clamped)
        num_partitions = clamped
    return left.join(right, join_type=_JOIN_TYPES[how],
                     num_partitions=num_partitions, on=tuple(on))


def hash_update(ds, patch_ds, on: list[str], num_partitions: int = 32):
    """Distributed J4 (``_update_values``) for a LARGE patch side: left hash
    join on the keys, then per-batch coalesce of the patch's non-NA values —
    no driver materialization of either side."""
    value_cols = [c for c in patch_ds.schema().names if c not in on]
    renames = {c: f"{c}__patch" for c in value_cols}
    # repartition+materialize: consolidate empty blocks (they stall the join
    # exchange) and keep upstream shuffles out of the join's DAG
    patch = patch_ds.map_batches(lambda b: b.rename(columns=renames),
                                 batch_format="pandas") \
        .repartition(max(2, num_partitions // 4)).materialize()
    joined = hash_join(ds, patch, on=on, how="left",
                       num_partitions=num_partitions)

    def coalesce(b: pd.DataFrame) -> pd.DataFrame:
        for c in value_cols:
            src = b[f"{c}__patch"]
            b[c] = src.where(src.notna(), b[c])
        return b.drop(columns=[f"{c}__patch" for c in value_cols])

    return joined.map_batches(coalesce, batch_format="pandas")


def broadcast_update(ds, patch_df: pd.DataFrame, on: list[str]):
    """J4 ``_update_values`` (reference utilities.py:189-211): overwrite
    ``ds`` rows with the non-NA values of ``patch_df`` aligned on ``on``
    (the patch — e.g. restored test actuals — is broadcast once)."""
    value_cols = [c for c in patch_df.columns if c not in on]
    small_bytes = _df_bytes(patch_df)
    ref = ray.put(patch_df)

    def apply_patch(batch: pd.DataFrame, patch: pd.DataFrame) -> pd.DataFrame:
        merged = batch.merge(patch, how="left", on=list(on),
                             suffixes=("", "__patch"))
        for c in value_cols:
            pc_ = f"{c}__patch" if f"{c}__patch" in merged.columns else c
            if c in batch.columns:
                src = merged[pc_]
                merged[c] = src.where(src.notna(), merged[c] if pc_ != c else np.nan)
            else:
                merged[c] = merged[pc_]
            if pc_ != c:
                merged = merged.drop(columns=[pc_])
        return merged[list(batch.columns)]

    if small_bytes <= _ACTOR_BYTES:
        return ds.map_batches(lambda b: apply_patch(b, ray.get(ref)),
                              batch_format="pandas")

    class Updater:
        def __init__(self):
            self.patch = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return apply_patch(batch, self.patch)

    return ds.map_batches(Updater, batch_format="pandas", concurrency=(1, 8))
