"""Changepoint / local-maxima edges."""

import pandas as pd


def _daily(tmp_path, values):
    ts = pd.date_range("2024-01-01", periods=len(values), freq="D") \
        .astype("datetime64[us]")
    pd.DataFrame({"event_type": ["e"] * len(values), "ts": ts,
                  "value": [float(v) for v in values],
                  "user_id": [0] * len(values)}) \
        .to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def test_changepoint_finds_level_shift(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    sf = _daily(tmp_path, [10, 10, 10, 10, 50, 50, 50, 50])
    out = Q.q_changepoint_sse_daily(sf)
    # perfect two-level series: split after day 4, full variance explained
    assert out.loc[0, "split_after_d"] == pd.Timestamp("2024-01-04")
    assert out.loc[0, "var_reduction"] == 1.0
    # constant series: zero total SSE -> NULLF
    sf2 = _daily(tmp_path, [5.0] * 6)
    out2 = Q.q_changepoint_sse_daily(sf2)
    assert out2.loc[0, "var_reduction"] == -999.0


def test_local_maxima(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    sf = _daily(tmp_path, [1, 5, 2, 9, 3, 4, 3])
    out = Q.q_local_maxima_daily(sf)
    assert out.loc[0, "n_peaks"] == 3          # 5, 9, 4
    assert out.loc[0, "top_peak_v"] == 9.0
    assert out.loc[0, "top_peak_d"] == pd.Timestamp("2024-01-04")
    # monotone series: no peaks -> sentinels
    sf2 = _daily(tmp_path, [1, 2, 3, 4])
    out2 = Q.q_local_maxima_daily(sf2)
    assert out2.loc[0, "n_peaks"] == 0
    assert out2.loc[0, "top_peak_v"] == -999.0
    assert out2.loc[0, "top_peak_d"] == pd.Timestamp("9999-12-31")
