"""Prediction post-processing parity with the reference model layer
(model.py:27-56 floor + simple CIs; model.py:539-548 asymmetric loss)."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data

from forecastframe_ray.functions import metrics
from forecastframe_ray.functions.postprocess import (
    add_confidence_intervals, norm_ppf, prediction_sem, set_forecast_minimum)


def test_norm_ppf_matches_known_values():
    # scipy.stats.norm.ppf reference values (published tables)
    assert norm_ppf(0.975) == pytest.approx(1.959963984540054, abs=1e-12)
    assert norm_ppf(0.5) == pytest.approx(0.0, abs=1e-12)
    assert norm_ppf(0.995) == pytest.approx(2.5758293035489004, abs=1e-12)
    assert norm_ppf(0.01) == pytest.approx(-2.3263478740408408, abs=1e-12)
    # tail branch (p < 0.02425)
    assert norm_ppf(1e-6) == pytest.approx(-4.753424308822899, abs=1e-10)
    with pytest.raises(ValueError):
        norm_ppf(0.0)


def test_set_forecast_minimum_matches_reference_where():
    df = pd.DataFrame({
        "predicted_y": [-3.0, 0.0, 2.5, np.nan],
        "predicted_y_upper": [-1.0, 4.0, 5.0, 1.0],
        "other": [-9.0, -9.0, -9.0, -9.0],
    })
    # reference semantics: preds.where(preds > floor, floor) on predicted_*
    ref = df.copy()
    pred_cols = ["predicted_y", "predicted_y_upper"]
    ref[pred_cols] = ref[pred_cols].where(ref[pred_cols] > 0.5, 0.5)
    got = set_forecast_minimum(ray.data.from_pandas(df), 0.5).to_pandas()
    pd.testing.assert_frame_equal(
        got[pred_cols].reset_index(drop=True), ref[pred_cols])
    # non-prediction columns untouched
    assert (got["other"] == -9.0).all()
    # NaN predictions: where(NaN > floor) is False -> floored, matching
    # the reference's pandas .where behaviour
    assert got["predicted_y"].iloc[3] == 0.5


def test_prediction_sem_matches_pandas_sem():
    rng = np.random.default_rng(3)
    x = pd.Series(rng.normal(100.0, 7.0, 500))
    x.iloc[::17] = np.nan
    ds = ray.data.from_pandas(pd.DataFrame({"p": x})).repartition(4)
    assert prediction_sem(ds, "p") == pytest.approx(x.sem(), rel=1e-12)


def test_add_confidence_intervals_matches_reference():
    rng = np.random.default_rng(4)
    x = rng.normal(50.0, 4.0, 300)
    df = pd.DataFrame({"predicted_v": x})
    ds = ray.data.from_pandas(df).repartition(3)
    got = add_confidence_intervals(ds, "predicted_v").to_pandas()
    # reference: pred +/- norm.ppf(0.975) * Series.sem()
    hw = 1.959963984540054 * pd.Series(x).sem()
    np.testing.assert_allclose(got["predicted_v_upper"], x + hw, rtol=1e-12)
    np.testing.assert_allclose(got["predicted_v_lower"], x - hw, rtol=1e-12)


def test_asymmetric_loss_matches_reference_formula():
    rng = np.random.default_rng(5)
    a = rng.normal(10.0, 3.0, 400)
    p = a + rng.normal(0.0, 1.0, 400)
    a[5] = np.nan
    df = pd.DataFrame({"a": a, "p": p})
    out = metrics.asymmetric_loss(
        ray.data.from_pandas(df).repartition(4), "a", "p",
        loss_multiplier=0.9)
    # reference _custom_asymmetric_valid: mean(r^2 if r<0 else r^2*0.9)
    mask = ~np.isnan(a)
    r = a[mask] - p[mask]
    want = float(np.mean(np.where(r < 0, r ** 2, r ** 2 * 0.9)))
    assert int(out["n"].iloc[0]) == int(mask.sum())
    assert float(out["loss"].iloc[0]) == pytest.approx(want, rel=1e-12)
