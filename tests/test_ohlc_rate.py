"""OHLC mergeable combiner (pipelines/rollup.ohlc_aggregate) and the
irregular-gap rate kernel (stages/window_ops.op_rate)."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.pipelines.rollup import ohlc_aggregate
from forecastframe_ray.stages.window_ops import op_rate

DAY_US = 86_400_000_000


def test_ohlc_matches_pandas_bruteforce(ray_session):
    rng = np.random.default_rng(13)
    n = 3_000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "ts": (pd.Timestamp("2024-01-01")
               + pd.to_timedelta(rng.choice(10 * 86_400, n, replace=False),
                                 unit="s")).astype("datetime64[us]"),
        "v": rng.normal(100, 15, n).round(4),
    })
    # many small blocks so partials from different batches genuinely merge
    ds = ray.data.from_pandas([d for _, d in df.groupby(df.index // 97)])
    got = ohlc_aggregate(ds, ["k"], "ts", "v", DAY_US, num_partitions=4) \
        .to_pandas().sort_values(["k", "bucket_us"]).reset_index(drop=True)

    ref = df.copy()
    ref["bucket_us"] = (ref["ts"].astype("int64") // DAY_US) * DAY_US
    ref = ref.sort_values(["k", "bucket_us", "ts"])
    g = ref.groupby(["k", "bucket_us"])
    want = g.agg(open=("v", "first"), high=("v", "max"), low=("v", "min"),
                 close=("v", "last"), n=("v", "size")).reset_index()
    want = want.sort_values(["k", "bucket_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)


def test_ohlc_single_point_bucket(ray_session):
    df = pd.DataFrame({
        "k": ["a"],
        "ts": pd.to_datetime(["2024-01-01 12:00"]).astype("datetime64[us]"),
        "v": [7.5],
    })
    out = ohlc_aggregate(ray.data.from_pandas(df), ["k"], "ts", "v",
                         DAY_US, num_partitions=2).to_pandas()
    r = out.iloc[0]
    assert r["open"] == r["high"] == r["low"] == r["close"] == 7.5
    assert r["n"] == 1


def test_op_rate_honors_gaps():
    # hourly series with a 3h hole: the post-gap rate divides by 3, not 1
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00",
                         "2024-01-01 04:00"])
    df = pd.DataFrame({"k": ["a"] * 3, "h": ts,
                       "v": [10.0, 13.0, 22.0]})
    out = op_rate(df.copy(), ["k"], "h", "v", per_seconds=3600.0)
    rates = out["v_rate"].to_numpy()
    assert np.isnan(rates[0])
    np.testing.assert_allclose(rates[1], 3.0)    # (13-10)/1h
    np.testing.assert_allclose(rates[2], 3.0)    # (22-13)/3h
