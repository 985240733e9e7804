"""RFM ntile / Lorenz / islands / new-vs-returning edges."""

import numpy as np
import pandas as pd


def test_ntile_from_pos_matches_sql_semantics():
    from forecastframe_ray.pipelines.queries import _ntile_from_pos

    # n=10, k=4 -> bucket sizes 3,3,2,2
    out = _ntile_from_pos(np.arange(10), 10, 4)
    assert list(out) == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # n < k: every row its own bucket
    assert list(_ntile_from_pos(np.arange(3), 3, 4)) == [1, 2, 3]


def test_rfm_scores(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # 4 users, distinct recency/frequency/monetary orderings
    ts = pd.to_datetime(
        ["2024-01-01"] * 1 + ["2024-01-02"] * 2 + ["2024-01-03"] * 3
        + ["2024-01-04"] * 4).astype("datetime64[us]")
    users = [1, 2, 2, 3, 3, 3, 4, 4, 4, 4]
    pd.DataFrame({"user_id": users, "ts": ts,
                  "event_type": ["e"] * 10,
                  "value": [float(u) for u in users]}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_rfm_segments_users(str(tmp_path)).set_index("user_id")
    # user 4 most recent (recency 0) & most frequent & highest monetary
    assert out.loc[4, "recency_days"] == 0
    assert out.loc[1, "recency_days"] == 3
    assert out.loc[4, "frequency"] == 4
    assert out.loc[4, "f_score"] == 4 and out.loc[1, "f_score"] == 1
    assert out.loc[4, "m_score"] == 4
    # recency ascending: user 4 (0 days) scores 1, user 1 (3 days) scores 4
    assert out.loc[4, "r_score"] == 1 and out.loc[1, "r_score"] == 4


def test_lorenz_cum_share_monotone(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    ts = pd.date_range("2024-01-01", periods=20, freq="h") \
        .astype("datetime64[us]")
    pd.DataFrame({"user_id": list(range(20)), "ts": ts,
                  "event_type": ["e"] * 20,
                  "value": [float(i + 1) for i in range(20)]}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_lorenz_deciles_users(str(tmp_path))
    assert len(out) == 10
    assert (out["n_users"] == 2).all()
    assert out["cum_share"].iloc[-1] == 1.0
    assert (np.diff(out["cum_share"]) > 0).all()
    # bottom decile = users with totals 1,2 -> share 3/210
    assert out.loc[0, "share"] == np.round(3 / 210, 6)


def test_availability_islands(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    days = ["2024-01-01", "2024-01-02", "2024-01-03",
            "2024-01-07", "2024-01-08", "2024-01-20"]
    ts = pd.to_datetime(days).astype("datetime64[us]")
    pd.DataFrame({"event_type": ["e"] * 6, "ts": ts,
                  "value": [1.0] * 6, "user_id": [0] * 6}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_availability_islands_daily(str(tmp_path))
    assert out.loc[0, "n_islands"] == 3
    assert out.loc[0, "longest_island"] == 3
    assert out.loc[0, "max_gap_days"] == 12
    assert out.loc[0, "n_days"] == 6


def test_new_vs_returning(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    ts = pd.to_datetime([
        "2024-01-01 01:00", "2024-01-01 02:00",  # u1, u2 new on d1
        "2024-01-02 01:00", "2024-01-02 02:00",  # u1 returns, u3 new
    ]).astype("datetime64[us]")
    pd.DataFrame({"user_id": [1, 2, 1, 3], "ts": ts,
                  "event_type": ["e"] * 4, "value": [1.0] * 4}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_new_vs_returning_daily(str(tmp_path)).set_index("d")
    d1, d2 = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")
    assert out.loc[d1, "n_new"] == 2 and out.loc[d1, "n_returning"] == 0
    assert out.loc[d2, "n_new"] == 1 and out.loc[d2, "n_returning"] == 1
