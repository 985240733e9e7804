"""Debounce / point-in-time state edges."""

import pandas as pd


def test_debounce_bursts(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    ts = pd.to_datetime([
        "2024-01-01 10:00:00",   # burst 1 (a)
        "2024-01-01 10:02:00",   # +2min  -> same burst
        "2024-01-01 10:04:00",   # +2min  -> same burst (chained)
        "2024-01-01 10:30:00",   # gap    -> burst 2 (a)
        "2024-01-01 10:01:00",   # type b -> its own stream, burst 1
    ]).astype("datetime64[us]")
    pd.DataFrame({"user_id": [1] * 5, "ts": ts,
                  "event_type": ["a", "a", "a", "a", "b"],
                  "value": [1.0] * 5}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_debounce_events(str(tmp_path))
    assert out.loc[0, "n_events"] == 5
    assert out.loc[0, "n_kept"] == 3      # a-burst1, a-burst2, b-burst1
    assert out.loc[0, "keep_ratio"] == 0.6


def test_point_in_time_state(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # span 00:00..10:00 -> midpoint 05:00; user 1's latest <= cut is 'b',
    # user 2 only acts after the cut -> absent
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 04:00", "2024-01-01 09:00",
        "2024-01-01 10:00",
    ]).astype("datetime64[us]")
    pd.DataFrame({"user_id": [1, 1, 2, 1], "ts": ts,
                  "event_type": ["a", "b", "c", "d"],
                  "value": [1.0] * 4}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_point_in_time_user_state(str(tmp_path))
    assert list(out["user_id"]) == [1]
    assert out.loc[0, "state_type"] == "b"
    assert out.loc[0, "state_ts"] == pd.Timestamp("2024-01-01 04:00")
