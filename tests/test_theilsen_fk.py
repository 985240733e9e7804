"""Theil–Sen robust trend and the FK-orphan audit."""

import numpy as np
import pandas as pd


def test_theilsen_ignores_outlier(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # clean slope-2 line with one wild outlier: OLS would bend, the median
    # of pairwise slopes must stay exactly 2
    days = np.arange(15)
    v = 10.0 + 2.0 * days
    v[7] = 500.0
    df = pd.DataFrame({
        "event_id": days.astype(np.int64),
        "ts": (pd.Timestamp("2024-01-01")
               + pd.to_timedelta(days, unit="D")).astype("datetime64[us]"),
        "user_id": np.ones(15, dtype=np.int64),
        "event_type": ["e"] * 15,
        "value": v,
        "props": ["{}"] * 15,
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = Q.q_theilsen_daily_events(str(tmp_path))
    np.testing.assert_allclose(out["slope"].iloc[0], 2.0)
    assert out["n"].iloc[0] == 15


def test_theilsen_single_point_series(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    df = pd.DataFrame({
        "event_id": [0], "ts": pd.to_datetime(["2024-01-01"])
        .astype("datetime64[us]"), "user_id": [1],
        "event_type": ["solo"], "value": [5.0], "props": ["{}"],
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = Q.q_theilsen_daily_events(str(tmp_path))
    assert out["slope"].iloc[0] == -999.0      # NULLF sentinel
    assert out["intercept"].iloc[0] == -999.0


def test_fk_violations_counts_orphans(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    pd.DataFrame({"c_custkey": [1, 2]}).to_parquet(
        tmp_path / "customer.parquet")
    orders = pd.DataFrame({
        "o_orderkey": [10, 11, 12],
        "o_custkey": [1, 2, 99],       # 99 -> orphan
    })
    orders.to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({"l_orderkey": [10, 10, 77, 88]}).to_parquet(
        tmp_path / "lineitem.parquet")   # 77, 88 -> orphans
    out = Q.q_fk_violations(str(tmp_path))
    assert out["n_orders_orphans"].iloc[0] == 1
    assert out["n_lineitem_orphans"].iloc[0] == 2
