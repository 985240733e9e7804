"""Exact TreeSHAP over the from-scratch GBM (pipelines/interpret.gbm_shap):
additivity (base + Σφ == scorer prediction, exactly), the stump closed
form (φ_split-feature = lr·(leaf − cover-weighted mean), φ_other = 0),
and symmetry-by-construction on a feature the trees never split."""

import numpy as np
import pandas as pd
import ray.data

from forecastframe_ray.pipelines import interpret as interp
from forecastframe_ray.pipelines import search


def frame(n_days=28) -> pd.DataFrame:
    dates = pd.date_range("2021-03-01", periods=n_days, freq="D")
    v = [40.0 + 8 * np.sin(2 * np.pi * d.dayofweek / 7)
         + 3 * ((d.day % 5) - 2) + (i % 7) * 0.25
         for i, d in enumerate(dates)]
    return pd.DataFrame({"series": "a", "d": dates, "v": v})


def test_additivity_exact():
    df = frame()
    ds = ray.data.from_pandas(df)
    state = search.fit_gbm(ds, ["series"], "d", "v", n_trees=3,
                           max_depth=2, learning_rate=0.4)
    shap = interp.gbm_shap(ds, state, "d").to_pandas().sort_values("d")
    scored = search.score_gbm(ds, state, ["series"], "d", "v",
                              "pred").to_pandas().sort_values("d")
    lhs = (shap["shap_base"] + shap["shap_dow"] + shap["shap_dom"]).to_numpy()
    np.testing.assert_allclose(lhs, scored["pred"].to_numpy(),
                               rtol=0, atol=1e-9)


def test_stump_closed_form():
    df = frame()
    ds = ray.data.from_pandas(df)
    state = search.fit_gbm(ds, ["series"], "d", "v", n_trees=1,
                           max_depth=1, learning_rate=1.0)
    tree = state["trees"][0]
    (fi, thr, lid, rid), = tree["internal"].values()
    lv, rv = tree["leaf"][lid], tree["leaf"][rid]
    nl, nr = tree["cover"][lid], tree["cover"][rid]
    e = (nl * lv + nr * rv) / (nl + nr)

    shap = interp.gbm_shap(ds, state, "d").to_pandas().sort_values("d")
    feats = state["features"]
    split_col = "shap_" + feats[fi]
    other_col = "shap_" + feats[1 - fi]
    x = (df["d"].dt.dayofweek if feats[fi] == "dow"
         else df["d"].dt.day).to_numpy()
    want = np.where(x <= thr, lv, rv) - e
    np.testing.assert_allclose(shap[split_col].to_numpy(), want, atol=1e-12)
    np.testing.assert_allclose(shap[other_col].to_numpy(), 0.0, atol=0)
    np.testing.assert_allclose(shap["shap_base"].to_numpy(),
                               state["base"] + e, atol=1e-12)
