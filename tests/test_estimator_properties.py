"""Property-based laws for the search-layer estimators (hypothesis):
the Fourier↔dow-means span identity and the Holt/Croston recursion
parity must hold for ARBITRARY series, not just the fixed-seed fixtures."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

from forecastframe_ray.pipelines import search


def _series(values, start="2024-03-01"):
    d = pd.date_range(start, periods=len(values), freq="D")
    return pd.DataFrame({"k": "s", "d": d,
                         "v": np.asarray(values, dtype=np.float64)})


finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=8, deadline=None)
@given(st.lists(finite, min_size=8, max_size=40))
def test_fourier_dow_identity_holds_for_arbitrary_series(ray_session, vals):
    """Intercept + 3 weekly harmonics span the dow-indicator space, so the
    OLS fitted value at each dow equals that dow's conditional mean — for
    ANY data, any length, any value distribution."""
    df = _series(vals)
    ds = ray.data.from_pandas(df).repartition(2)
    state = search.fit_fourier(ds, ["k"], "d", "v", order=3, trend=False)
    got = search.score_fourier(ds, state, ["k"], "d", "v",
                               "p").to_pandas()
    got["dow"] = got["d"].dt.dayofweek
    ref = df.assign(dow=df["d"].dt.dayofweek).groupby("dow")["v"].mean()
    m = got.merge(ref.rename("r"), left_on="dow", right_index=True)
    scale = max(1.0, float(np.abs(df["v"]).max()))
    assert np.abs(m["p"] - m["r"]).max() < 1e-7 * scale


@settings(max_examples=8, deadline=None)
@given(st.lists(finite, min_size=2, max_size=60),
       st.floats(min_value=0.05, max_value=0.95),
       st.floats(min_value=0.05, max_value=0.95))
def test_holt_recursion_parity_arbitrary(ray_session, vals, alpha, beta):
    df = _series(vals)
    ds = ray.data.from_pandas(df).repartition(2)
    state = search.fit_holt(ds, ["k"], "d", "v", alpha=alpha, beta=beta)
    y = np.asarray(vals, dtype=np.float64)
    level, trend = y[0], y[1] - y[0]
    for t in range(1, len(y)):
        prev = level
        level = alpha * y[t] + (1 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1 - beta) * trend
    m = state["model"].iloc[0]
    scale = max(1.0, float(np.abs(y).max()))
    assert abs(m["__level"] - level) < 1e-9 * scale
    assert abs(m["__trend"] - trend) < 1e-9 * scale


@settings(max_examples=8, deadline=None)
@given(st.lists(st.sampled_from([0.0, 0.0, 1.0, 2.5, 7.0]),
                min_size=1, max_size=50),
       st.floats(min_value=0.05, max_value=1.0))
def test_croston_recursion_parity_arbitrary(ray_session, vals, alpha):
    df = _series(vals)
    ds = ray.data.from_pandas(df).repartition(2)
    state = search.fit_croston(ds, ["k"], "d", "v", alpha=alpha)
    y = np.asarray(vals, dtype=np.float64)
    dn = search._day_numbers(df["d"])
    nzi = np.flatnonzero(y != 0)
    m = state["model"].iloc[0]
    if len(nzi) == 0:
        assert m["__size"] == 0.0 and np.isnan(m["__interval"])
        return
    q, t = y[nzi], dn[nzi].astype(float)
    tau = np.diff(np.concatenate(([dn[0] - 1.0], t)))
    z, p = q[0], tau[0]
    for i in range(1, len(q)):
        z = alpha * q[i] + (1 - alpha) * z
        p = alpha * tau[i] + (1 - alpha) * p
    assert abs(m["__size"] - z) < 1e-9 * max(1.0, abs(z))
    assert abs(m["__interval"] - p) < 1e-9 * max(1.0, abs(p))


@settings(max_examples=8, deadline=None)
@given(st.lists(finite, min_size=2, max_size=60),
       st.floats(min_value=0.05, max_value=1.0))
def test_theta_recursion_parity_arbitrary(ray_session, vals, alpha):
    # Theta: centered OLS line + SES over the theta-2 line; the state must
    # equal the direct numpy computation for ANY series and alpha
    df = _series(vals)
    ds = ray.data.from_pandas(df).repartition(2)
    state = search.fit_theta(ds, ["k"], "d", "v", alpha=alpha)
    y = np.asarray(vals, dtype=np.float64)
    t = (df["d"].astype("datetime64[us]").astype("int64")
         // 86_400_000_000).to_numpy().astype(np.float64)
    mx, my = t.mean(), y.mean()
    tc = t - mx
    sxx = (tc * tc).sum()
    b = (tc * (y - my)).sum() / sxx if sxx > 0 else 0.0
    theta2 = 2.0 * y - (my + b * tc)
    level = theta2[0]
    for i in range(1, len(theta2)):
        level = alpha * theta2[i] + (1 - alpha) * level
    m = state["model"].iloc[0]
    scale = max(1.0, float(np.abs(y).max()))
    assert abs(m["__slope"] - b) < 1e-9 * max(1.0, abs(b))
    assert abs(m["__level"] - level) < 1e-9 * scale
    # scorer: half line + half level at an arbitrary horizon
    future = pd.DataFrame({"k": ["s"], "d": [df["d"].max()
                                             + pd.Timedelta(days=3)]})
    got = search.score_theta(ray.data.from_pandas(future), state,
                             ["k"], "d", "v", "p").to_pandas()
    tf = t[-1] + 3.0
    want = 0.5 * (my + b * (tf - mx)) + 0.5 * level
    assert abs(got["p"].iloc[0] - want) < 1e-9 * scale


@settings(max_examples=8, deadline=None)
@given(st.lists(finite, min_size=1, max_size=60),
       st.floats(min_value=0.05, max_value=1.0))
def test_ses_recursion_parity_arbitrary(ray_session, vals, alpha):
    df = _series(vals)
    ds = ray.data.from_pandas(df).repartition(2)
    state = search.fit_ses(ds, ["k"], "d", "v", alpha=alpha)
    y = np.asarray(vals, dtype=np.float64)
    level = y[0]
    for t in range(1, len(y)):
        level = alpha * y[t] + (1 - alpha) * level
    m = state["model"].iloc[0]
    scale = max(1.0, float(np.abs(y).max()))
    assert abs(m["__level"] - level) < 1e-9 * scale
