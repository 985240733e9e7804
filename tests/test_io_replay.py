"""Save/load roundtrip + recorded-plan replay (SURVEY.md S2/S3, §3.3;
reference tests/test_io.py:25-63 and the record/replay contract
model.py:550-628)."""

import numpy as np
import pandas as pd
import pytest

from forecastframe_ray import RayForecastFrame
from tests.conftest import HIERARCHY, tiny_sales_df


def _build_frame():
    fr = RayForecastFrame(tiny_sales_df(), "datetime", "sales_int",
                          HIERARCHY, num_partitions=4)
    fr.lag_features("sales_int", [1])
    fr.calc_statistical_features("sales_int", windows=3,
                                 aggregations=["mean"], lag=1, min_periods=1)
    return fr


def test_save_load_roundtrip(tmp_path):
    fr = _build_frame()
    fr.standardize_features(["sales_float"])
    expected = fr.to_pandas()
    path = str(tmp_path / "fr")
    fr.save(path)

    back = RayForecastFrame.load(path)
    got = back.to_pandas()[expected.columns]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expected.reset_index(drop=True),
        check_dtype=False)
    # plan + scaler state survive
    assert back.function_list == fr.function_list
    assert back.scalers_list == fr.scalers_list
    assert back.transforms["standardize"]["mean"]["sales_float"] == pytest.approx(
        fr.transforms["standardize"]["mean"]["sales_float"])


def test_replay_reproduces_features():
    fr = _build_frame()
    expected = fr.to_pandas()
    replayed = fr.replay(tiny_sales_df()).to_pandas()
    pd.testing.assert_frame_equal(
        replayed[expected.columns].reset_index(drop=True),
        expected.reset_index(drop=True), check_dtype=False)


def test_replay_refits_scalers_on_new_data():
    fr = RayForecastFrame(tiny_sales_df(), "datetime", "sales_int",
                          HIERARCHY, num_partitions=4)
    fr.normalize_features(["sales_float"])
    # new data with a different range → replay must re-fit, like the
    # reference's train-slice scaler fit
    df2 = tiny_sales_df()
    df2["sales_float"] = df2["sales_float"] * 2
    out = fr.replay(df2)
    assert out.transforms["normalize"]["maxes"]["sales_float"] == pytest.approx(
        2 * fr.transforms["normalize"]["maxes"]["sales_float"])
    got = out.to_pandas()["sales_float"]
    assert np.nanmax(got.to_numpy()) == pytest.approx(1.0)
    assert np.nanmin(got.to_numpy()) == pytest.approx(0.0)
