"""Hopping (sliding) event-time windows + expanding stats / row numbers."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from forecastframe_ray.pipelines.rollup import hopping_window_aggregate
from forecastframe_ray.stages.window_ops import (op_expanding_stats,
                                                 op_row_number)

HOUR_US = 3_600_000_000


def test_hopping_window_membership(ray_session):
    # one event at 02:30 with a 3h window hopping hourly → windows starting
    # 00:00, 01:00, 02:00 (start ∈ (ts-3h, ts])
    ts = pd.Timestamp("2024-01-01 02:30")
    ds = ray.data.from_pandas(pd.DataFrame(
        {"k": ["a"], "ts": [ts], "v": [2.0]}))
    out = hopping_window_aggregate(ds, ["k"], "ts", "v",
                                   window_us=3 * HOUR_US, slide_us=HOUR_US,
                                   num_partitions=2).to_pandas()
    starts = sorted(out["window_start_us"].tolist())
    base = int(pd.Timestamp("2024-01-01").value // 1000)
    assert starts == [base, base + HOUR_US, base + 2 * HOUR_US]
    assert (out["n_events"] == 1).all() and (out["sum_val"] == 2.0).all()


def test_hopping_window_matches_pandas_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.integers(0, 86_400, n), unit="s"),
        "v": rng.normal(size=n).round(3),
    })
    W, S = 3 * HOUR_US, HOUR_US
    got = (hopping_window_aggregate(
        ray.data.from_pandas(df).repartition(4), ["k"], "ts", "v",
        window_us=W, slide_us=S, num_partitions=4)
        .to_pandas().sort_values(["k", "window_start_us"])
        .reset_index(drop=True))
    # brute force: replicate each row into its 3 windows
    us = df["ts"].astype("int64") // 1000  # ns → µs
    parts = []
    for j in range(W // S):
        p = df[["k", "v"]].copy()
        p["window_start_us"] = (us // S - j) * S
        parts.append(p)
    want = (pd.concat(parts).groupby(["k", "window_start_us"])
            .agg(n_events=("v", "size"), sum_val=("v", "sum"))
            .reset_index().sort_values(["k", "window_start_us"])
            .reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    np.testing.assert_allclose(got["sum_val"], want["sum_val"], atol=1e-9)


def test_hopping_rejects_non_multiple_slide(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"k": ["a"], "ts": [pd.Timestamp("2024-01-01")], "v": [1.0]}))
    with pytest.raises(ValueError):
        hopping_window_aggregate(ds, ["k"], "ts", "v",
                                 window_us=2 * HOUR_US + 1, slide_us=HOUR_US)


def test_expanding_stats_and_row_number():
    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 2,
        "ts": pd.date_range("2024-01-01", periods=4).tolist()
              + pd.date_range("2024-01-01", periods=2).tolist(),
        "v": [1.0, 3.0, 2.0, 4.0, 10.0, 0.0],
    })
    out = op_expanding_stats(df.copy(), ["k"], "ts", ["v"],
                             aggregations=["sum", "mean", "max", "min"])
    out = op_row_number(out, ["k"], "ts", out_name="rn")
    a = out[out.k == "a"]
    assert a["v_expanding_sum"].tolist() == [1.0, 4.0, 6.0, 10.0]
    assert a["v_expanding_mean"].tolist() == [1.0, 2.0, 2.0, 2.5]
    assert a["v_expanding_max"].tolist() == [1.0, 3.0, 3.0, 4.0]
    assert a["v_expanding_min"].tolist() == [1.0, 1.0, 1.0, 1.0]
    assert a["rn"].tolist() == [1, 2, 3, 4]
    b = out[out.k == "b"]
    assert b["v_expanding_sum"].tolist() == [10.0, 10.0]
    assert b["rn"].tolist() == [1, 2]


def test_expanding_unknown_agg_raises():
    df = pd.DataFrame({"k": ["a"], "ts": [pd.Timestamp("2024-01-01")],
                       "v": [1.0]})
    with pytest.raises(ValueError):
        op_expanding_stats(df, ["k"], "ts", ["v"], aggregations=["median"])


def test_rolling_corr_matches_pandas():
    from forecastframe_ray.stages.window_ops import op_rolling_corr
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": ["a"] * 30 + ["b"] * 20,
        "ts": pd.date_range("2024-01-01", periods=30).tolist()
              + pd.date_range("2024-01-01", periods=20).tolist(),
        "x": rng.normal(size=50),
        "y": rng.normal(size=50),
    })
    out = op_rolling_corr(df.copy(), ["k"], "ts", "x", "y", window=5)
    want = (df.groupby("k", group_keys=False)
            .apply(lambda g: g["x"].rolling(5, min_periods=2).corr(g["y"])))
    got = out["x_y_corr5"].to_numpy()
    exp = want.to_numpy()
    ok = np.isclose(got, exp, equal_nan=True)
    assert ok.all()


def test_frame_wrappers_expanding_sessionize(ray_session):
    from forecastframe_ray import RayForecastFrame
    df = pd.DataFrame({
        "g": ["a"] * 3,
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
        "v": [1.0, 2.0, 3.0],
    })
    fr = (RayForecastFrame(ray.data.from_pandas(df), "ts", "v", ["g"],
                           num_partitions=2)
          .calc_expanding_features("v", ["sum"])
          .sessionize(gap_seconds=3600))
    out = fr.to_pandas()
    assert out["v_expanding_sum"].tolist() == [1.0, 3.0, 6.0]
    assert out["session_id"].tolist() == [1, 2, 3]  # 1-day gaps > 1h
    # both calls recorded for save/replay
    names = [n for n, _ in fr.function_list]
    assert names == ["calc_expanding_features", "sessionize"]


def test_op_percent_rank_ties_and_singletons():
    from forecastframe_ray.stages.keyed import keyed_window_stage

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"],
        "ts": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
             "2024-01-05", "2024-01-01"]),
        "v": [3.0, 1.0, 3.0, 2.0, 5.0, 7.0],
    })
    out = keyed_window_stage(
        ray.data.from_pandas(df), ["k"], "ts",
        [{"op": "percent_rank", "feature": "v"}],
        num_partitions=2).to_pandas().sort_values(["k", "ts"])
    got = out["v_pct_rank"].tolist()
    # ranks (min method): 3,1,3,2,5 -> (r-1)/4 = 0.5,0,0.5,0.25,1; singleton 0
    assert got == [0.5, 0.0, 0.5, 0.25, 1.0, 0.0]
