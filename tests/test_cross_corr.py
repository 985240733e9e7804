"""Cross-series correlation matrix (queries.q_cross_corr_daily_events)."""

import numpy as np
import pandas as pd


def test_cross_corr_known_relationships(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # series a: 1..10; b = 2a (corr +1); c = -a (corr -1); d overlaps a on
    # only days 0-1 (n_days=2)
    rows = []
    eid = 0
    for day in range(10):
        base = float(day + 1)
        for t, v in [("a", base), ("b", 2 * base), ("c", -base)]:
            rows.append({"event_id": eid, "ts": pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=day), "user_id": 1,
                         "event_type": t, "value": v, "props": "{}"})
            eid += 1
    for day in range(2):
        rows.append({"event_id": eid, "ts": pd.Timestamp("2024-01-01")
                     + pd.Timedelta(days=day), "user_id": 1,
                     "event_type": "d", "value": float(3 - day),
                     "props": "{}"})
        eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet")
    out = Q.q_cross_corr_daily_events(str(tmp_path))
    got = {(r["type_a"], r["type_b"]): (r["n_days"], r["corr"])
           for _, r in out.iterrows()}
    assert got[("a", "b")] == (10, 1.0)
    assert got[("a", "c")] == (10, -1.0)
    n, c = got[("a", "d")]
    assert n == 2 and c == -1.0   # two points, decreasing
