"""Mann-Whitney / dow ANOVA / runs test kernel edges."""

import numpy as np
import pandas as pd


def _events(tmp_path, types, values, start="2024-01-01", freq="h"):
    ts = pd.date_range(start, periods=len(values), freq=freq) \
        .astype("datetime64[us]")
    pd.DataFrame({"event_type": types, "ts": ts,
                  "value": [float(v) for v in values],
                  "user_id": list(range(len(values)))}) \
        .to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def test_mannwhitney_disjoint_and_ties(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # click all below view: U = 0, rank-biserial = 1
    sf = _events(tmp_path, ["click"] * 3 + ["view"] * 3,
                 [1, 2, 3, 10, 11, 12])
    out = Q.q_mannwhitney_events(sf)
    assert out.loc[0, "u_stat"] == 0.0
    assert out.loc[0, "rank_biserial"] == 1.0
    # identical singletons tie: avg rank 1.5 each -> U = n_a*n_b/2
    sf2 = _events(tmp_path, ["click", "view"], [5, 5])
    out2 = Q.q_mannwhitney_events(sf2)
    assert out2.loc[0, "u_stat"] == 0.5
    assert out2.loc[0, "rank_biserial"] == 0.0


def test_dow_anova_strong_weekday_effect(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # 3 weeks of a pure dow pattern + tiny within-noise
    pattern = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    vals = []
    for w in range(3):
        vals += [p + 0.01 * w for p in pattern]
    sf = _events(tmp_path, ["e"] * 21, vals, freq="D")
    out = Q.q_dow_anova_daily(sf)
    assert out.loc[0, "k_groups"] == 7
    assert out.loc[0, "f_stat"] > 1000  # between >> within
    # constant series: ssw = 0 -> NULLF
    sf2 = _events(tmp_path, ["e"] * 14, [5.0] * 14, freq="D")
    out2 = Q.q_dow_anova_daily(sf2)
    assert out2.loc[0, "f_stat"] == -999.0


def test_runs_test_alternating(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # perfectly alternating around the median: max runs -> positive z
    sf = _events(tmp_path, ["e"] * 8, [1, 9, 1, 9, 1, 9, 1, 9], freq="D")
    out = Q.q_runs_test_daily(sf)
    assert out.loc[0, "n_above"] == 4 and out.loc[0, "n_below"] == 4
    assert out.loc[0, "n_runs"] == 8
    mu = 2 * 4 * 4 / 8 + 1
    var = 2 * 4 * 4 * (2 * 4 * 4 - 8) / (8 * 8 * 7)
    assert out.loc[0, "z_stat"] == np.round((8 - mu) / np.sqrt(var), 6)
    # two clustered runs -> negative z
    sf2 = _events(tmp_path, ["e"] * 8, [1, 1, 1, 1, 9, 9, 9, 9], freq="D")
    out2 = Q.q_runs_test_daily(sf2)
    assert out2.loc[0, "n_runs"] == 2
    assert out2.loc[0, "z_stat"] < 0
