"""Watermark prefix-scan and weighted-median edges."""

import numpy as np
import pandas as pd


def test_late_events_cross_partition_watermark(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # arrival order (event_id) deliberately misordered in time: event 0
    # carries the LATEST ts, so every later arrival is measured against
    # it — including ones landing in other arrival-range partitions
    # (the prefix-max must cross partition boundaries).
    ts = pd.to_datetime([
        "2024-01-01 12:00",   # id 0: watermark jumps to 12:00
        "2024-01-01 08:00",   # id 1: 4h late
        "2024-01-01 11:30",   # id 2: 0.5h late -> NOT late (<= 1h)
        "2024-01-01 13:00",   # id 3: new watermark
        "2024-01-01 09:00",   # id 4: 4h late vs 13:00
    ]).astype("datetime64[us]")
    pd.DataFrame({"event_id": range(5), "user_id": [0] * 5, "ts": ts,
                  "event_type": ["e"] * 5, "value": [1.0] * 5}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_late_events_watermark(str(tmp_path))
    assert out.loc[0, "n"] == 5
    assert out.loc[0, "n_late"] == 2
    assert out.loc[0, "max_late_s"] == 4 * 3600.0


def test_weighted_median(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    ts = pd.date_range("2024-01-01", periods=3, freq="h") \
        .astype("datetime64[us]")
    # values 1 (w=1), 2 (w=1), 3 (w=10): half of 12 is 6 -> median 3
    pd.DataFrame({"event_type": ["e"] * 3, "ts": ts,
                  "value": [1.0, 2.0, 3.0],
                  "props": ['{"k": 1}', '{"k": 1}', '{"k": 10}'],
                  "user_id": [0] * 3}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_weighted_median_events(str(tmp_path))
    assert out.loc[0, "w_median"] == 3.0
    assert out.loc[0, "total_w"] == 12
    # equal weights -> lower median of evens
    pd.DataFrame({"event_type": ["e"] * 4, "ts": list(ts) + [ts[0]],
                  "value": [1.0, 2.0, 3.0, 4.0],
                  "props": ['{"k": 1}'] * 4, "user_id": [0] * 4}) \
        .to_parquet(tmp_path / "events.parquet")
    out2 = Q.q_weighted_median_events(str(tmp_path))
    assert out2.loc[0, "w_median"] == 2.0
