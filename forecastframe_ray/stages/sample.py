"""Deterministic hash sampling (SURVEY.md O7).

The reference samples with ``df.sample(n)`` for dev-time spot checks
(`/root/reference/forecastframe/utilities.py` helpers); Ray Data's
``Dataset.random_sample`` covers that interactive use but is seed-unstable
across cluster shapes (per-block RNG), so it can't back a reproducible
pipeline step or an oracle. This stage adds the production form: keep a row
iff ``md5(str(key))`` falls under a rate threshold. Properties that matter
at 100 TB:

- **stateless + embarrassingly parallel** — a plain ``map_batches`` filter,
  no shuffle, no driver participation, identical output for any block
  layout or cluster size;
- **stable under resume/backfill** — membership depends only on the key,
  so re-running a partition (checkpoint resume) or sampling a later
  delivery of the same corpus selects the same rows;
- **oracle-able** — DuckDB's ``md5()`` computes the identical digest, so
  the driver can verify the sample row-for-row in SQL.

md5 here is a uniform hash, not cryptography. The per-row hashlib call is
the same C-backed cost class as the exact-dedup digest pass
(``dedup._digest_batch``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

#: md5-prefix space: the first 8 hex chars as an integer, in [0, 16**8)
_SPACE = 16 ** 8


def _bucket(keys: pd.Series) -> np.ndarray:
    """First 32 bits of md5(str(key)) per row, as int64 in [0, 2^32)."""
    return np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
         for s in keys.astype(str)),
        dtype=np.int64, count=len(keys))


def deterministic_sample(ds, key_col: str, rate: float):
    """Keep rows whose md5 bucket < rate·2^32 — an expected-``rate`` sample
    that is exactly reproducible everywhere (SQL twin:
    ``WHERE CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
    < floor(rate * 16**8)``). ``rate`` ∈ (0, 1]."""
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    cut = int(rate * _SPACE)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[_bucket(b[key_col]) < cut]

    return ds.map_batches(keep, batch_format="pandas")


def stratified_sample(ds, group_cols: list[str], key_col: str, k: int,
                      num_partitions: int = 32):
    """Exactly ``min(k, group size)`` rows per ``group_cols`` group: the
    rows whose md5 bucket of ``key_col`` is smallest (ties broken by the
    key itself) — a deterministic per-stratum reservoir.

    Same reproducibility contract as :func:`deterministic_sample` (stable
    across block layouts, cluster shapes, and resumes) with an EXACT
    per-group quota instead of an expected rate — the form evaluation-set
    construction needs ("k docs per language/domain"). Physical plan is the
    combiner-first grouped top-k (``stages/topk.py``): per-batch partial
    top-k → one coarse-hash merge, shuffle bounded by groups × k per batch.

    SQL twin: ``row_number() OVER (PARTITION BY group ORDER BY md5-bucket,
    key) <= k``.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from forecastframe_ray.stages.topk import grouped_topk

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__smp"] = _bucket(b[key_col])
        return b

    tagged = ds.map_batches(add_bucket, batch_format="pandas")
    out = grouped_topk(tagged, list(group_cols), "__smp", k,
                       descending=False, tiebreak=[key_col],
                       num_partitions=num_partitions)
    return out.map_batches(lambda b: b.drop(columns=["__smp"]),
                           batch_format="pandas")


def hash_split(ds, key_col: str, fractions: dict[str, float]):
    """Deterministic train/val/test assignment: a row's split depends only
    on ``md5(str(key))`` — stable across cluster shapes, resumes and later
    deliveries (the same properties as :func:`hash_sample`, applied to the
    canonical ML split). ``fractions`` maps split name → fraction (must sum
    to ≤ 1; any remainder joins the LAST split). Appends a ``split``
    column; stateless map_batches, no shuffle."""
    names = list(fractions)
    total = float(sum(fractions.values()))
    if total > 1.0 + 1e-9:
        raise ValueError(
            f"hash_split fractions sum to {total:.6f} > 1 — later splits "
            "would silently receive zero rows")
    cuts = np.cumsum([fractions[n] for n in names])
    bounds = (cuts * _SPACE).astype(np.int64)
    bounds[-1] = _SPACE  # remainder folds into the last split

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        h = _bucket(b[key_col])
        idx = np.searchsorted(bounds, h, side="right")
        idx = np.minimum(idx, len(names) - 1)
        b = b.copy()
        b["split"] = np.asarray(names, dtype=object)[idx]
        return b

    return ds.map_batches(assign, batch_format="pandas")


# ---------------------------------------------------------------------------
# temperature-based mixture sampling (multilingual-LM data mixing)
# ---------------------------------------------------------------------------

def mixture_weights(ds, group_col: str, temperature: float = 1.0,
                    size_col: str | None = None,
                    num_partitions: int = 16) -> pd.DataFrame:
    """Temperature-scaled mixture weights — the public multilingual
    sampling rule (Lample & Conneau 2019 §3.1; mT5): with group shares
    ``p_i = n_i / N``, sample groups proportionally to
    ``w_i = p_i^(1/T) / Σ_j p_j^(1/T)``. ``T < 1`` sharpens toward big
    groups, ``T > 1`` flattens toward uniform (upsampling low-resource
    groups).

    Sizes come from one coarse-hash aggregate (row counts, or
    ``size_col`` sums, e.g. token counts); the result is one tiny
    driver-side row per group: ``(group, n, p, w)``.
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    from forecastframe_ray.stages.agg import hash_aggregate

    agg = {"n": ((size_col or group_col),
                 "sum" if size_col else "size")}
    sizes = hash_aggregate(ds, [group_col], agg,
                           num_partitions=num_partitions).to_pandas()
    sizes = sizes.sort_values(group_col).reset_index(drop=True)
    n = sizes["n"].to_numpy(np.float64)
    p = n / n.sum()
    w_raw = p ** (1.0 / temperature)
    sizes["p"] = p
    sizes["w"] = w_raw / w_raw.sum()
    return sizes


def mixture_sample(ds, group_col: str, key_col: str, budget_frac: float,
                   temperature: float = 1.0, size_col: str | None = None,
                   rate_digits: int = 6):
    """Deterministic temperature-mixture downsample: with a total budget of
    ``budget_frac · N`` rows (or ``size_col`` units), each group keeps an
    expected ``w_i · budget`` — rate ``min(1, w_i · budget / n_i)`` —
    selected by the same md5-bucket rule as :func:`deterministic_sample`,
    so membership is independent of cluster shape and resume. Rates are
    rounded to ``rate_digits`` so an external recomputation (e.g. a SQL
    oracle) derives bit-identical thresholds. The per-group rate table is
    tiny and ships inside the map closure; stateless, no shuffle."""
    w = mixture_weights(ds, group_col, temperature=temperature,
                        size_col=size_col)
    budget = budget_frac * w["n"].sum()
    rate = np.minimum(1.0, (w["w"].to_numpy(np.float64) * budget)
                      / w["n"].to_numpy(np.float64))
    rate = np.round(rate, rate_digits)
    cuts = {g: int(r * _SPACE) for g, r in zip(w[group_col], rate)}

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        h = _bucket(b[key_col])
        cut = b[group_col].map(cuts).to_numpy(np.int64)
        return b[h < cut]

    return ds.map_batches(keep, batch_format="pandas")
