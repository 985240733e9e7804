"""Hierarchy rollups and the 1h/1d/7d continuous-aggregate tier cascade
(SURVEY.md §2.5 A1, §7.3 "tier cascade"; north_rule retention tiers).

``aggregate_features`` is the Ray form of the reference's
``_aggregate_features`` (``feature_engineering.py:270-300``): group by the
rollup columns + the datetime, aggregate each measure with a named op,
keeping the measure's own column name.

The tier cascade computes the finest tier (1h) from raw rows with a
**salted partial pre-aggregate** (combiner inside ``map_batches`` before the
groupby shuffle — a hot host's rows are already reduced to ≤ one row per
(salt, bucket) before any data moves), then derives 1d from 1h and 7d from 1d
using only algebraic stats carried as (count, sum, min, max, Σx²) so every
coarser tier is exact. Non-algebraic stats (median/quantiles) must recompute
from the finest retained tier — enforced here by simply not cascading them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Max, Mean, Min, Std, Sum

from forecastframe_ray import keys as K

_ALGEBRAIC = {"sum": Sum, "mean": Mean, "min": Min, "max": Max}


def aggregate_features(ds, features: list[str], by: list[str], op: str):
    """A1: ``ds.groupby(by).agg({f: op for f in features})`` with pandas NaN
    semantics (all-null sum → 0.0, matching ``DataFrame.groupby().agg("sum")``
    which the reference relies on)."""
    features = list(features)
    by = list(by)
    if op in _ALGEBRAIC:
        cls = _ALGEBRAIC[op]
        aggs = [cls(f, alias_name=f) for f in features]
        out = ds.groupby(by).aggregate(*aggs)
        if op == "sum":
            out = out.map_batches(
                lambda b: b.fillna({f: 0.0 for f in features}), batch_format="pandas"
            )
        return out
    if op == "std":
        return ds.groupby(by).aggregate(*[Std(f, ddof=1, alias_name=f) for f in features])

    # generic fallback (median, skew, …): per-group pandas agg. One Python
    # call per group — fine for rollup grains, not for the raw-row grain.
    def generic(g: pd.DataFrame) -> pd.DataFrame:
        out = g[by].head(1).reset_index(drop=True)
        out[features] = g[features].agg(op).to_numpy()
        return out

    return ds.groupby(by).map_groups(generic, batch_format="pandas")


# ---------------------------------------------------------------------------
# Tier cascade
# ---------------------------------------------------------------------------

#: carried stats per (series, bucket): algebraic only, so tiers compose.
TIER_STATS = ("pages", "bytes", "sum_val", "min_val", "max_val", "sum_sq")


def partial_bucket_aggregate(series_keys: list[str], ts_col: str, value_col: str,
                             size_col: str | None, tier: str, num_salts: int = 16):
    """Stage 1 combiner: map_batches fn reducing raw rows to partial sums per
    ``(series_keys, bucket, salt)``. The salt (hash of the timestamp) splits
    a hot key's partials across reducers; a second, tiny groupby merges
    salts. Returns the map fn."""
    width = K.TIER_US[tier]

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch[ts_col].astype("int64")
        bucket = (ts_us // width) * width
        val = batch[value_col].astype(np.float64) if value_col else pd.Series(np.ones(len(batch)))
        size = batch[size_col].astype(np.float64) if size_col else pd.Series(np.zeros(len(batch)))
        g = pd.DataFrame({k: batch[k] for k in series_keys})
        g["bucket_us"] = bucket
        g["__salt"] = K.salt_ids(batch, ts_col, num_salts)
        g["pages"] = 1.0
        g["bytes"] = size.to_numpy()
        v = val.to_numpy()
        g["sum_val"] = v
        g["min_val"] = v
        g["max_val"] = v
        g["sum_sq"] = v * v
        agg = g.groupby(series_keys + ["bucket_us", "__salt"], sort=False, dropna=False).agg(
            pages=("pages", "sum"), bytes=("bytes", "sum"), sum_val=("sum_val", "sum"),
            min_val=("min_val", "min"), max_val=("max_val", "max"), sum_sq=("sum_sq", "sum"),
        ).reset_index()
        return agg

    return fn


def _merge_aggs(by: list[str]):
    return [
        Sum("pages", alias_name="pages"), Sum("bytes", alias_name="bytes"),
        Sum("sum_val", alias_name="sum_val"), Min("min_val", alias_name="min_val"),
        Max("max_val", alias_name="max_val"), Sum("sum_sq", alias_name="sum_sq"),
    ]


def build_tier(ds, series_keys: list[str], ts_col: str, value_col: str | None,
               size_col: str | None, tier: str, num_salts: int = 16):
    """Raw rows → exact (series, bucket) stat rows for ``tier``.

    Three-phase salted reduce (SURVEY.md §4 "skew"): (1) in-batch combiner —
    no shuffle, a hot host's rows leave each batch as ≤ num_salts partial
    rows per bucket; (2) groupby on ``(keys, bucket, salt)`` — the salt
    splits a hot key's ~#blocks partial rows across ``num_salts`` reducers;
    (3) tiny groupby on ``(keys, bucket)`` merges the ≤ num_salts rows/key.
    """
    fn = partial_bucket_aggregate(series_keys, ts_col, value_col, size_col, tier, num_salts)
    partials = ds.map_batches(fn, batch_format="pandas")
    by = series_keys + ["bucket_us"]
    salted = partials.groupby(by + ["__salt"]).aggregate(*_merge_aggs(by))
    return salted.groupby(by).aggregate(*_merge_aggs(by))


def cascade_tier(finer, series_keys: list[str], finer_tier: str, coarser_tier: str):
    """Exact coarser tier from a finer tier: re-bucket + merge the algebraic
    stats (sum/count/min/max/Σx² compose; mean & std derive at read time)."""
    width = K.TIER_US[coarser_tier]

    def rebucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket_us"] = (batch["bucket_us"] // width) * width
        return batch

    by = series_keys + ["bucket_us"]
    return finer.map_batches(rebucket, batch_format="pandas").groupby(by).aggregate(*_merge_aggs(by))


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
                 size_col: str | None = None, num_salts: int = 16) -> dict:
    """The full 1h → 1d → 7d cascade. Returns {tier: Dataset} of finalized
    tier tables (lazy; caller writes or consumes them)."""
    # materialize the (small) finer tiers so each is computed once — 1h feeds
    # both its own output and the 1d cascade, 1d feeds 7d.
    t1h = build_tier(ds, series_keys, ts_col, value_col, size_col, "1h", num_salts).materialize()
    t1d = cascade_tier(t1h, series_keys, "1h", "1d").materialize()
    t7d = cascade_tier(t1d, series_keys, "1d", "7d")
    out = {}
    for tier, t in (("1h", t1h), ("1d", t1d), ("7d", t7d)):
        out[tier] = t.map_batches(
            lambda b, tier=tier: finalize_tier_batch(b, tier), batch_format="pandas"
        )
    return out
