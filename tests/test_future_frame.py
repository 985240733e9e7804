"""W10 future-frame generation (reference model.py:717-791): distinct
hierarchy × future dates after the global max, NaN target, history concat,
recorded-plan replay."""

import numpy as np
import pandas as pd

from forecastframe_ray import RayForecastFrame
from tests.conftest import HIERARCHY, tiny_sales_df


def test_make_future_frame_shape_and_plan():
    fr = RayForecastFrame(tiny_sales_df(), "datetime", "sales_int",
                          HIERARCHY, num_partitions=4)
    fr.lag_features("sales_int", [1])
    fut = fr.make_future_frame(periods=3, freq="D")
    df = fut.to_pandas()

    # 12 history rows + 3 series × 3 future dates
    assert len(df) == 12 + 9
    # future dates extend from the GLOBAL max (2020-01-05 → 01-06..01-08),
    # for every series (reference uses one last_date for all series)
    last = pd.Timestamp("2020-01-05")
    fut_rows = df[df["datetime"] > last]
    assert len(fut_rows) == 9
    assert fut_rows["sales_int"].isna().all()
    assert sorted(fut_rows["datetime"].unique()) == list(
        pd.date_range("2020-01-06", periods=3))
    # recorded plan replayed: first future row of each series carries a lag
    # from its last history value
    prod3 = df[(df["product"] == "Prod_3") &
               (df["datetime"] == pd.Timestamp("2020-01-06"))]
    assert prod3["sales_int_lag1"].iloc[0] == 123.0


def test_make_future_frame_no_history():
    fr = RayForecastFrame(tiny_sales_df(), "datetime", "sales_int",
                          HIERARCHY, num_partitions=4)
    fut = fr.make_future_frame(periods=2, include_history=False,
                               apply_plan=False)
    df = fut.to_pandas()
    assert len(df) == 3 * 2
    assert df["sales_int"].isna().all()
