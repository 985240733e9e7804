"""TSB intermittent-demand estimator (pipelines/search.py)."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.pipelines.search import ESTIMATORS, fit_tsb, score_tsb


def _series(y):
    days = pd.date_range("2024-01-01", periods=len(y), freq="D") \
        .astype("datetime64[us]")
    return pd.DataFrame({"k": ["a"] * len(y), "d": days,
                         "v": np.asarray(y, dtype=np.float64)})


def _tsb_direct(y, alpha, beta):
    ind = (np.asarray(y, dtype=np.float64) != 0).astype(np.float64)
    p = ind[0]
    for i in range(1, len(ind)):
        p = beta * ind[i] + (1 - beta) * p
    nz = np.flatnonzero(np.asarray(y) != 0)
    if len(nz) == 0:
        return 0.0
    z = y[nz[0]]
    for i in nz[1:]:
        z = alpha * y[i] + (1 - alpha) * z
    return p * z


def test_tsb_matches_direct_recursion(ray_session):
    y = np.array([0, 4.0, 0, 0, 6.0, 0, 2.0, 0, 0, 0, 8.0, 0])
    ds = ray.data.from_pandas(_series(y))
    for alpha, beta in [(0.3, 0.2), (0.1, 0.5), (1.0, 0.5)]:
        st = fit_tsb(ds, ["k"], "d", "v", alpha=alpha, beta=beta)
        one = ray.data.from_pandas(_series(y).head(1))
        got = score_tsb(one, st, ["k"], "d", "v", "p").to_pandas()["p"][0]
        assert np.isclose(got, _tsb_direct(y, alpha, beta))


def test_tsb_all_zero_and_unseen(ray_session):
    y = np.zeros(6)
    ds = ray.data.from_pandas(_series(y))
    st = fit_tsb(ds, ["k"], "d", "v", alpha=0.2, beta=0.2)
    probe = _series([1.0, 2.0]).head(2)
    probe.loc[1, "k"] = "unseen"
    got = score_tsb(ray.data.from_pandas(probe), st, ["k"], "d", "v",
                    "p").to_pandas().set_index("k")["p"]
    assert got["a"] == 0.0
    assert np.isnan(got["unseen"])


def test_tsb_decays_through_zero_tail(ray_session):
    # unlike Croston, TSB's forecast shrinks as trailing zeros accumulate
    base = [0, 5.0, 0, 5.0]
    short = np.array(base + [0] * 2)
    long = np.array(base + [0] * 10)
    f_short = _tsb_direct(short, 0.2, 0.2)
    f_long = _tsb_direct(long, 0.2, 0.2)
    assert f_long < f_short


def test_tsb_registered():
    fit, score, params = ESTIMATORS["tsb"]
    assert fit is fit_tsb and score is score_tsb
    assert params == ("alpha", "beta")
