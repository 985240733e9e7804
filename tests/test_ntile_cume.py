"""ntile / cume_dist kernels vs the SQL fill rules."""

import numpy as np
import pandas as pd

from forecastframe_ray.stages.window_ops import op_cume_dist, op_ntile


def _series(values, key="a"):
    return pd.DataFrame({
        "k": [key] * len(values),
        "d": pd.date_range("2024-01-01", periods=len(values), freq="D"),
        "v": np.asarray(values, dtype=np.float64),
    })


def test_ntile_fill_rule():
    # 10 rows into 4 tiles -> sizes 3,3,2,2 (first n%k tiles get the extra)
    df = _series(range(10))
    out = op_ntile(df.copy(), ["k"], "d", 4)
    assert out["ntile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]


def test_ntile_more_tiles_than_rows():
    # n < k: every row its own tile, numbered consecutively from 1
    df = _series(range(3))
    out = op_ntile(df.copy(), ["k"], "d", 7)
    assert out["ntile"].tolist() == [1, 2, 3]


def test_cume_dist_ties_share_max_rank():
    df = _series([10.0, 20.0, 20.0, 30.0])
    out = op_cume_dist(df.copy(), ["k"], "d", "v")
    np.testing.assert_allclose(out["v_cume_dist"],
                               [0.25, 0.75, 0.75, 1.0])


def test_multi_series_independent():
    df = pd.concat([_series(range(5), "a"), _series(range(2), "b")],
                   ignore_index=True)
    out = op_ntile(df.copy(), ["k"], "d", 2)
    assert out.loc[out["k"] == "a", "ntile"].tolist() == [1, 1, 1, 2, 2]
    assert out.loc[out["k"] == "b", "ntile"].tolist() == [1, 2]
