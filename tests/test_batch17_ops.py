"""Heatmap / covariance kernel edges."""

import numpy as np
import pandas as pd


def test_hour_dow_heatmap(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    ts = pd.to_datetime([
        "2024-01-01 05:00", "2024-01-01 05:30",   # Mon hour 5: two rows
        "2024-01-02 23:10",                        # Tue hour 23
    ]).astype("datetime64[us]")
    pd.DataFrame({"ts": ts, "value": [1.0, 3.0, 7.0],
                  "event_type": ["e"] * 3, "user_id": [0] * 3}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_hour_dow_heatmap_events(str(tmp_path)) \
        .set_index(["dow", "hour"])
    assert out.loc[(1, 5), "n"] == 2
    assert out.loc[(1, 5), "mean_v"] == 2.0
    assert out.loc[(2, 23), "sum_v"] == 7.0


def test_covariance_matches_numpy(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (40, 4)).astype(np.float32)
    pd.DataFrame({"vec_id": range(40),
                  "embedding": [X[i] for i in range(40)],
                  "label": np.zeros(40, dtype="int32")}) \
        .to_parquet(tmp_path / "embeddings.parquet")
    out = Q.q_covariance_embeddings(str(tmp_path))
    ref = np.cov(X.astype(np.float64).T, ddof=1)
    for _, r in out.iterrows():
        assert abs(r["cov"] - ref[int(r["dim_a"]) - 1,
                                  int(r["dim_b"]) - 1]) < 1e-6
    # upper triangle of 4 dims -> 10 rows
    assert len(out) == 10
