"""Rolling quantile kernel and median imputation."""

import numpy as np
import pandas as pd

from forecastframe_ray.stages.window_ops import (op_fill_missing,
                                                 op_rolling_quantile)


def _series(values, key="a"):
    return pd.DataFrame({
        "k": [key] * len(values),
        "d": pd.date_range("2024-01-01", periods=len(values), freq="D"),
        "v": np.asarray(values, dtype=np.float64),
    })


def test_rolling_quantile_matches_numpy():
    v = np.array([5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0])
    out = op_rolling_quantile(_series(v), ["k"], "d", "v", window=3, q=0.9)
    col = out["v_p90_roll3"].to_numpy()
    # full windows from row 2 onward
    for i in range(2, len(v)):
        want = np.quantile(v[i - 2:i + 1], 0.9)
        np.testing.assert_allclose(col[i], np.round(want, 6))
    # partial windows (min_periods=1)
    np.testing.assert_allclose(col[0], v[0])
    np.testing.assert_allclose(col[1], np.round(np.quantile(v[:2], 0.9), 6))


def test_median_impute_fills_only_holes():
    df = _series([1.0, np.nan, 3.0, np.nan, 100.0])
    out = op_fill_missing(df.copy(), ["k"], "d", ["v"], method="median")
    med = np.median([1.0, 3.0, 100.0])
    np.testing.assert_allclose(out["v"],
                               [1.0, med, 3.0, med, 100.0])


def test_median_impute_even_count_interpolates():
    df = _series([np.nan, 10.0, 20.0])
    out = op_fill_missing(df.copy(), ["k"], "d", ["v"], method="median")
    np.testing.assert_allclose(out["v"], [15.0, 10.0, 20.0])
