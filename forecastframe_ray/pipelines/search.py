"""Grid / random-search cross-validation driver — the data-side of the
reference's hyperparameter search (`/root/reference/forecastframe/model.py:
319-513` grid/random search + premade grids, `model.py:1313-1417`
predict/cross_validate drivers, best-pick by ``rmse.idxmin`` at
`model.py:1110`). Estimator FITTING is out of engine scope (no
LightGBM/Prophet in this container); the pluggable contract is a
``(fit, score)`` pair where

- ``fit(train_ds, keys, dtc, target, **params) -> state`` runs distributed
  aggregates over the TRAIN slice only and returns a small driver-side
  state (the reference's fitted model object), and
- ``score(ds, state, keys, dtc, target, out_col) -> ds`` appends the
  prediction column via a broadcast merge / actor-pool stage.

The shipped estimator is the deterministic seasonal-mean family the scorer
hook uses (``frame.calc_ensemble_predictions``), parameterized by
``season`` (``dow``/``dom``/``none``) and ``blend`` (mixing weight toward
the per-series global mean) — a real model drops into the same plan.

Fold mechanics come from :mod:`forecastframe_ray.pipelines.cv` (leakage-safe
scaler refit + masked feature replay + restored actuals). Folds are built
ONCE and shared across every parameter candidate — features do not depend
on estimator params, so re-running the replay per candidate (what a naive
port would do) would multiply the dominant cost by the grid size.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# estimator registry (fit/score pairs)
# ---------------------------------------------------------------------------

_SEASON_FNS = {
    "dow": lambda s: s.dt.dayofweek.astype("int32"),
    "dom": lambda s: s.dt.day.astype("int32"),
    "none": lambda s: pd.Series(np.zeros(len(s), dtype="int32"),
                                index=s.index),
}


def fit_seasonal_mean(train_ds, keys: list[str], dtc: str, target: str,
                      season: str = "dow", blend: float = 0.0) -> dict:
    """Distributed fit: per-(series, season-bucket) mean + per-series global
    mean over the train slice. Both aggregates are coarse-hash shuffles of
    pre-reduced rows; the returned state is (n_series × season-cardinality)
    rows — small by construction, broadcast once at score time."""
    from forecastframe_ray.stages.agg import hash_aggregate

    sf = _SEASON_FNS[season]

    def add_season(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__season"] = sf(b[dtc])
        return b

    with_season = train_ds.map_batches(add_season, batch_format="pandas")
    seasonal = hash_aggregate(with_season, keys + ["__season"],
                              {"__spred": (target, "mean")}).to_pandas()
    overall = hash_aggregate(train_ds, keys,
                             {"__gpred": (target, "mean")}).to_pandas()
    return {"season": season, "blend": float(blend),
            "seasonal": seasonal, "global": overall}


def score_seasonal_mean(ds, state: dict, keys: list[str], dtc: str,
                        target: str, out_col: str):
    """Broadcast-merge scorer: pred = (1-blend)·seasonal + blend·global,
    falling back to the global mean for unseen season buckets."""
    import ray

    sf = _SEASON_FNS[state["season"]]
    blend = state["blend"]
    ref = ray.put((state["seasonal"], state["global"]))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        seasonal, overall = ray.get(ref)
        b = b.copy()
        b["__season"] = sf(b[dtc])
        m = b.merge(seasonal, how="left", on=keys + ["__season"]) \
             .merge(overall, how="left", on=keys)
        sp = m["__spred"].fillna(m["__gpred"])
        b[out_col] = ((1.0 - blend) * sp + blend * m["__gpred"]).to_numpy()
        return b.drop(columns=["__season"])

    return ds.map_batches(score, batch_format="pandas")


#: name -> (fit, score, fit_param_names). ``fit_param_names`` declares which
#: candidate params the FIT depends on (the rest only affect scoring), so
#: the search driver can share one fitted state across candidates that
#: differ only in score-time params — e.g. ``blend`` mixes two fitted means
#: at score time, so a (dow, 0.0) and (dow, 0.5) candidate share one fit.
ESTIMATORS = {
    "seasonal_mean": (fit_seasonal_mean, score_seasonal_mean, ("season",)),
}


def premade_grids(style: str = "fast") -> dict:
    """Premade parameter grids in the reference's spirit
    (``get_lgb_params("light"/"mvp"/...)``, model.py:397-513) for the
    stand-in estimator family."""
    grids = {
        "fast": {"season": ["dow", "none"], "blend": [0.0, 0.5]},
        "full": {"season": ["dow", "dom", "none"],
                 "blend": [0.0, 0.25, 0.5, 0.75, 1.0]},
    }
    return grids[style]


def grid_candidates(grid: dict) -> list[dict]:
    names = sorted(grid)
    return [dict(zip(names, combo))
            for combo in itertools.product(*(grid[n] for n in names))]


def random_candidates(grid: dict, n_iter: int, seed: int = 7) -> list[dict]:
    """Deterministic random search (reference ``_random_search``,
    model.py:319-375): sample ``n_iter`` distinct combos."""
    cands = grid_candidates(grid)
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(cands), size=min(n_iter, len(cands)),
                      replace=False)
    return [cands[i] for i in sorted(pick)]


# ---------------------------------------------------------------------------
# the search driver
# ---------------------------------------------------------------------------

def search_cv(fr, grid: dict | None = None, estimator: str = "seasonal_mean",
              n_splits: int = 3, gap: int = 0, n_iter: int | None = None,
              seed: int = 7):
    """Cross-validated parameter search over ``fr``'s recorded pipeline.

    Returns ``(results, best_params)`` where ``results`` has one row per
    (candidate × fold) with null-masked test RMSE/MAPE (the reference's
    per-fold scoring, interpret.py:104-115) and ``best_params`` minimizes
    the mean RMSE across folds (``rmse.idxmin``, model.py:1110)."""
    from forecastframe_ray.functions.metrics import error_summary
    from forecastframe_ray.pipelines import cv

    grid = grid or premade_grids("fast")
    cands = (random_candidates(grid, n_iter, seed) if n_iter
             else grid_candidates(grid))
    fit_fn, score_fn, fit_param_names = ESTIMATORS[estimator]
    dtc, tgt = fr.datetime_column, fr.target
    keys = list(fr.hierarchy or [])
    out_col = f"{tgt}_pred"

    # folds once, shared by every candidate (features are param-independent)
    folds = []
    for fold, ffold in cv.fold_frames(fr, n_splits=n_splits, gap=gap):
        ds = ffold.dataset.materialize()  # reused by every candidate
        t0 = fold["test_start"]
        train = ds.map_batches(
            lambda b, t0=t0: b[b[dtc] < t0], batch_format="pandas") \
            .materialize()
        test = ds.map_batches(
            lambda b, t0=t0: b[b[dtc] >= t0], batch_format="pandas") \
            .materialize()
        folds.append((fold, train, test))

    rows = []
    fit_cache: dict = {}  # (fold, fit-relevant params) -> fitted state
    for ci, params in enumerate(cands):
        for fi, (fold, train, test) in enumerate(folds):
            fkey = (fi, tuple((k, params[k]) for k in sorted(fit_param_names)))
            if fkey not in fit_cache:
                fit_cache[fkey] = fit_fn(train, keys, dtc, tgt, **params)
            state = dict(fit_cache[fkey], **{
                k: v for k, v in params.items() if k not in fit_param_names})
            scored = score_fn(test, state, keys, dtc, tgt, out_col)
            m = error_summary(scored, tgt, out_col)
            rows.append({"candidate": ci, **params, "fold": fi,
                         "train_end": fold["train_end"],
                         "n_test": int(m["n"].iloc[0]),
                         "rmse": float(m["RMSE"].iloc[0]),
                         "mape": float(m["MAPE"].iloc[0])})
    results = pd.DataFrame(rows)
    mean_rmse = results.groupby("candidate")["rmse"].mean()
    best = cands[int(mean_rmse.idxmin())]
    return results, best
