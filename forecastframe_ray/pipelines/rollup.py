"""Hierarchy rollups and the 1h/1d/7d continuous-aggregate tier cascade
(SURVEY.md §2.5 A1, §7.3 "tier cascade"; north_rule retention tiers).

``aggregate_features`` is the Ray form of the reference's
``_aggregate_features`` (``feature_engineering.py:270-300``): group by the
rollup columns + the datetime, aggregate each measure with a named op,
keeping the measure's own column name.

The tier cascade computes the finest tier (1h) from raw rows with a
per-batch **combiner** (``map_batches`` pre-reduce: a hot host's rows leave
each batch as ≤ one row per bucket before any data moves), then ONE
coarse-hash shuffle merges partials with a vectorized pandas groupby
(:mod:`forecastframe_ray.stages.agg` — measured ~200× faster than
``Dataset.groupby().aggregate`` at high group cardinality). 1d derives from
1h and 7d from 1d using only algebraic stats carried as
(count, sum, min, max, Σx²) so every coarser tier is exact. Non-algebraic
stats (median/quantiles) must recompute from the finest retained tier —
enforced here by simply not cascading them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from forecastframe_ray import keys as K
from forecastframe_ray.stages.agg import hash_aggregate


def aggregate_features(ds, features: list[str], by: list[str], op: str,
                       num_partitions: int = 64):
    """A1: ``ds.groupby(by).agg({f: op for f in features})`` with pandas NaN
    semantics (skipna; all-null sum → 0.0, matching
    ``DataFrame.groupby().agg("sum")`` which the reference relies on)."""
    named = {f: (f, op) for f in features}
    return hash_aggregate(ds, list(by), named, num_partitions)


# ---------------------------------------------------------------------------
# Tier cascade
# ---------------------------------------------------------------------------

#: carried stats per (series, bucket): algebraic only, so tiers compose.
TIER_STATS = ("pages", "bytes", "sum_val", "min_val", "max_val", "sum_sq")

_MERGE_AGGS = {
    "pages": ("pages", "sum"), "bytes": ("bytes", "sum"),
    "sum_val": ("sum_val", "sum"), "min_val": ("min_val", "min"),
    "max_val": ("max_val", "max"), "sum_sq": ("sum_sq", "sum"),
}


def partial_bucket_aggregate(series_keys: list[str], ts_col: str, value_col: str,
                             size_col: str | None, tier: str):
    """Stage-1 combiner: map_batches fn reducing raw rows to partial stats
    per ``(series_keys, bucket)`` — a hot key's rows leave each batch as one
    row per bucket, bounding what the shuffle moves. Returns the map fn."""
    width = K.TIER_US[tier]

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch[ts_col].astype("datetime64[us]").astype("int64") \
            if np.issubdtype(batch[ts_col].dtype, np.datetime64) \
            else batch[ts_col].astype("int64")
        bucket = (ts_us // width) * width
        val = batch[value_col].to_numpy(np.float64) if value_col \
            else np.ones(len(batch))
        size = batch[size_col].to_numpy(np.float64) if size_col \
            else np.zeros(len(batch))
        g = pd.DataFrame({k: batch[k].to_numpy() for k in series_keys})
        g["bucket_us"] = bucket.to_numpy() if hasattr(bucket, "to_numpy") else bucket
        g["pages"] = 1.0
        g["bytes"] = size
        g["sum_val"] = val
        g["min_val"] = val
        g["max_val"] = val
        g["sum_sq"] = val * val
        return g.groupby(series_keys + ["bucket_us"], sort=False,
                         dropna=False).agg(**_MERGE_AGGS).reset_index()

    return fn


def build_tier(ds, series_keys: list[str], ts_col: str, value_col: str | None,
               size_col: str | None, tier: str, num_partitions: int = 64):
    """Raw rows → exact (series, bucket) stat rows for ``tier``: per-batch
    combiner (no shuffle) → one coarse-hash merge (vectorized pandas
    groupby inside each of ``num_partitions`` partitions)."""
    fn = partial_bucket_aggregate(series_keys, ts_col, value_col, size_col, tier)
    partials = ds.map_batches(fn, batch_format="pandas")
    by = series_keys + ["bucket_us"]
    return hash_aggregate(partials, by, _MERGE_AGGS, num_partitions)


def cascade_tier(finer, series_keys: list[str], finer_tier: str, coarser_tier: str,
                 num_partitions: int = 32):
    """Exact coarser tier from a finer tier: re-bucket + merge the algebraic
    stats (sum/count/min/max/Σx² compose; mean & std derive at read time)."""
    width = K.TIER_US[coarser_tier]
    keep = list(series_keys) + ["bucket_us"] + list(TIER_STATS)

    def rebucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[keep].copy()  # drop derived cols if input is finalized
        batch["bucket_us"] = (batch["bucket_us"] // width) * width
        return batch

    by = series_keys + ["bucket_us"]
    return hash_aggregate(finer.map_batches(rebucket, batch_format="pandas"),
                          by, _MERGE_AGGS, num_partitions)


def finalize_tier_batch(batch: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Derive mean/std from the carried algebraic stats; attach tier label and
    a timestamp-typed bucket column."""
    n = batch["pages"].to_numpy(dtype=np.float64)
    s = batch["sum_val"].to_numpy(dtype=np.float64)
    ss = batch["sum_sq"].to_numpy(dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = s / n
        var = np.where(n > 1, (ss - s * s / n) / (n - 1), np.nan)
    batch["mean_val"] = mean
    batch["std_val"] = np.sqrt(np.maximum(var, 0.0))
    batch["tier"] = tier
    batch["bucket_ts"] = pd.to_datetime(batch["bucket_us"], unit="us")
    return batch


def rollup_tiers(ds, series_keys: list[str], ts_col: str, value_col: str | None = None,
                 size_col: str | None = None, num_salts: int = 16,
                 num_partitions: int = 64) -> dict:
    """The full 1h → 1d → 7d cascade. Returns {tier: Dataset} of finalized
    tier tables (lazy; caller writes or consumes them).

    ``num_salts`` is kept for API stability; hot-key splitting is inherent
    in the combiner + coarse-hash plan (see :mod:`stages.agg` skew note).
    """
    # materialize each FINALIZED tier exactly once: 1h feeds its own output
    # and the 1d cascade (which drops the derived cols), 1d feeds 7d; tier
    # row counts become block-metadata lookups (no re-execution), and the
    # compression stage reads the materialized 1h blocks directly.
    def fin(t, tier):
        return t.map_batches(
            lambda b, tier=tier: finalize_tier_batch(b, tier),
            batch_format="pandas",
        ).materialize()

    t1h = fin(build_tier(ds, series_keys, ts_col, value_col, size_col, "1h",
                         num_partitions), "1h")
    # coarser tiers are orders of magnitude smaller — fewer partitions keeps
    # the per-task floor from dominating these short execs
    np_c = min(16, num_partitions)
    t1d = fin(cascade_tier(t1h, series_keys, "1h", "1d", np_c), "1d")
    t7d = fin(cascade_tier(t1d, series_keys, "1d", "7d", np_c), "7d")
    return {"1h": t1h, "1d": t1d, "7d": t7d}
