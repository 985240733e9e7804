"""Histogram gradient-boosted regressor (pipelines/search.py fit_gbm /
score_gbm — estimator #15, closing the reference's LightGBM gap,
``/root/reference/forecastframe/model.py:802-953``). The distributed fit
(per-level histogram reduces, broadcast ensemble recompute) is pinned
against an INDEPENDENT hand-rolled single-node recursive GBM on the
12-row fixture, and the estimator is wired through the shared-fold
search_cv machinery."""

import numpy as np
import pandas as pd
import ray.data

from forecastframe_ray import RayForecastFrame
from forecastframe_ray.pipelines import search


def fixture12() -> pd.DataFrame:
    dates = pd.date_range("2021-03-01", periods=12, freq="D")
    v = [50.0, 41.5, 58.25, 44.0, 61.0, 39.5, 52.75,
         47.0, 63.5, 40.25, 55.0, 49.75]
    return pd.DataFrame({"series": "a", "d": dates, "v": v})


# ---------------------------------------------------------------------------
# independent single-node reference: recursive exact-histogram GBM
# ---------------------------------------------------------------------------


def _ref_split(F, names, r, idx, min_child, gain_digits):
    n0, s0 = len(idx), float(r[idx].sum())
    best = None  # (gain, fi, thr)
    for fi, f in enumerate(names):
        vals = np.unique(F[f][idx])
        for thr in vals[:-1]:
            m = F[f][idx] <= thr
            nl = int(m.sum())
            nr = n0 - nl
            if nl < min_child or nr < min_child:
                continue
            sl = float(r[idx[m]].sum())
            sr = s0 - sl
            gain = round(sl * sl / nl + sr * sr / nr - s0 * s0 / n0,
                         gain_digits)
            # strict > replicates the engine's first-win tie-break
            # (feature order, then smaller threshold)
            if gain > 0 and (best is None or gain > best[0]):
                best = (gain, fi, int(thr))
    return best


def _ref_tree(F, names, r, idx, depth, min_child, gain_digits, out):
    if depth == 0:
        out[idx] = r[idx].mean() if len(idx) else 0.0
        return
    best = _ref_split(F, names, r, idx, min_child, gain_digits)
    if best is None:
        out[idx] = r[idx].mean() if len(idx) else 0.0
        return
    _gain, fi, thr = best
    m = F[names[fi]][idx] <= thr
    _ref_tree(F, names, r, idx[m], depth - 1, min_child, gain_digits, out)
    _ref_tree(F, names, r, idx[~m], depth - 1, min_child, gain_digits, out)


def ref_gbm_predict(df, n_trees, max_depth, lr, features=("dow", "dom"),
                    min_child=1, gain_digits=6):
    F = {"dow": df["d"].dt.dayofweek.to_numpy(np.int64),
         "dom": df["d"].dt.day.to_numpy(np.int64)}
    y = df["v"].to_numpy(np.float64)
    base = y.mean()
    pred = np.full(len(y), base)
    idx = np.arange(len(y))
    for _ in range(n_trees):
        r = y - pred
        contrib = np.zeros(len(y))
        _ref_tree(F, list(features), r, idx, max_depth, min_child,
                  gain_digits, contrib)
        pred = pred + lr * contrib
    return pred


def test_fit_matches_single_node_reference():
    df = fixture12()
    ds = ray.data.from_pandas(df)
    for n_trees, depth, lr in ((1, 1, 1.0), (2, 2, 0.5), (3, 2, 0.3)):
        state = search.fit_gbm(ds, ["series"], "d", "v", n_trees=n_trees,
                               max_depth=depth, learning_rate=lr)
        scored = search.score_gbm(ds, state, ["series"], "d", "v",
                                  "pred").to_pandas().sort_values("d")
        want = ref_gbm_predict(df, n_trees, depth, lr)
        np.testing.assert_allclose(scored["pred"].to_numpy(), want,
                                   rtol=0, atol=1e-9)


def test_boosting_reduces_train_error():
    df = fixture12()
    ds = ray.data.from_pandas(df)
    errs = []
    for n_trees in (0, 1, 3):
        if n_trees == 0:
            errs.append(float(((df["v"] - df["v"].mean()) ** 2).mean()))
            continue
        state = search.fit_gbm(ds, ["series"], "d", "v", n_trees=n_trees,
                               max_depth=2, learning_rate=0.5)
        scored = search.score_gbm(ds, state, ["series"], "d", "v",
                                  "pred").to_pandas()
        errs.append(float(((scored["v"] - scored["pred"]) ** 2).mean()))
    assert errs[2] < errs[1] < errs[0]


def test_gbm_through_search_cv():
    rows = []
    dates = pd.date_range("2021-03-01", periods=42, freq="D")
    for si, series in enumerate(["a", "b"]):
        for di, d in enumerate(dates):
            rows.append((series, d,
                         50.0 + 10 * si
                         + 6 * np.sin(2 * np.pi * d.dayofweek / 7)
                         + ((si * 13 + di * 7) % 11) - 5))
    df = pd.DataFrame(rows, columns=["series", "d", "v"])
    fr = RayForecastFrame(ray.data.from_pandas(df), "d", "v", ["series"])
    results, best = search.search_cv(
        fr, grid={"n_trees": [1, 2], "max_depth": [2],
                  "learning_rate": [0.5], "min_child": [1],
                  "base_mode": ["global"]},
        estimator="gbm", n_splits=2)
    assert len(results) == 2 * 2  # candidates × folds
    assert results["rmse"].notna().all()
    assert best["n_trees"] in (1, 2)


def test_series_base_mode_closed_form():
    """base_mode="series": one stump fitted on residuals from the
    per-series train means — replicated exactly with a 12-line pandas
    twin (pooled residual histogram → best split → leaf means)."""
    rows = []
    dates = pd.date_range("2021-03-01", periods=14, freq="D")
    for si, series in enumerate(["a", "b"]):
        for di, d in enumerate(dates):
            rows.append((series, d,
                         30.0 + 40 * si
                         + 5 * np.sin(2 * np.pi * d.dayofweek / 7)
                         + ((si + di * 3) % 5)))
    df = pd.DataFrame(rows, columns=["series", "d", "v"])
    ds = ray.data.from_pandas(df)
    state = search.fit_gbm(ds, ["series"], "d", "v", n_trees=1,
                           max_depth=1, learning_rate=1.0,
                           base_mode="series")
    got = search.score_gbm(ds, state, ["series"], "d", "v", "pred") \
        .to_pandas().sort_values(["series", "d"]).reset_index(drop=True)

    # pandas twin
    sb = df.groupby("series")["v"].transform("mean")
    r = (df["v"] - sb).to_numpy()
    F = {"dow": df["d"].dt.dayofweek.to_numpy(np.int64),
         "dom": df["d"].dt.day.to_numpy(np.int64)}
    best = _ref_split(F, ["dow", "dom"], r, np.arange(len(df)), 1, 6)
    assert best is not None
    _g, fi, thr = best
    m = F[["dow", "dom"][fi]] <= thr
    stump = np.where(m, r[m].mean(), r[~m].mean())
    want = (sb.to_numpy() + stump)
    want = pd.DataFrame({"series": df["series"], "d": df["d"],
                         "pred": want}).sort_values(["series", "d"])
    np.testing.assert_allclose(got["pred"].to_numpy(),
                               want["pred"].to_numpy(), atol=1e-9)


def test_predict_future_with_gbm():
    """The frame-level predict driver (fit-on-all-history → future-grid
    scoring) accepts the GBM like any registered estimator."""
    rows = []
    for si, s in enumerate(["a", "b"]):
        for d in pd.date_range("2021-03-01", periods=28, freq="D"):
            rows.append((s, d, 50.0 + 10 * si
                         + 6 * np.sin(2 * np.pi * d.dayofweek / 7)))
    df = pd.DataFrame(rows, columns=["series", "d", "v"])
    fr = RayForecastFrame(ray.data.from_pandas(df), "d", "v", ["series"])
    out = fr.predict(periods=7, estimator="gbm")
    p = out.to_pandas() if hasattr(out, "to_pandas") else out
    fut = p[p["v"].isna()]
    assert len(fut) == 14  # 7 days × 2 series
    assert fut["predicted_v"].notna().all()
    # predictions sit at plausible series levels (50±6 / 60±6 bands)
    assert fut.groupby("series")["predicted_v"].mean().between(40, 72).all()
