"""LTTB downsampling (stages/window_ops.op_lttb) — pinned against an
independent straight-from-the-paper reference implementation (Steinarsson
2013), since the sequential selection chain has no SQL twin."""

import numpy as np
import pandas as pd

from forecastframe_ray.stages.window_ops import op_lttb


def _lttb_reference(x, y, n_out):
    """Straightforward reference: endpoints kept; interior points split
    into n_out-2 buckets; each bucket keeps the point with max triangle
    area vs (previous selected, next bucket centroid)."""
    n = len(x)
    if n <= n_out:
        return list(range(n))
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    sel = [0]
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        if b + 2 <= n_out - 2:
            nlo, nhi = edges[b + 1], edges[b + 2]
        else:
            nlo, nhi = n - 1, n
        ax, ay = x[sel[-1]], y[sel[-1]]
        cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs((ax - cx) * (y[i] - ay) - (ax - x[i]) * (cy - ay))
            if area > best_area:
                best, best_area = i, area
        sel.append(best)
    sel.append(n - 1)
    return sel


def _series(values, key="a"):
    return pd.DataFrame({
        "k": [key] * len(values),
        "d": pd.date_range("2024-01-01", periods=len(values), freq="D"),
        "v": np.asarray(values, dtype=np.float64),
    })


def test_lttb_matches_reference():
    rng = np.random.default_rng(17)
    v = np.cumsum(rng.normal(size=200))
    df = _series(v)
    out = op_lttb(df.copy(), ["k"], "d", "v", n_out=20)
    got = np.flatnonzero(out["selected"].to_numpy())
    x = df["d"].astype("datetime64[us]").astype("int64") \
        .to_numpy().astype(float)
    want = np.asarray(_lttb_reference(x, v, 20))
    np.testing.assert_array_equal(got, want)
    assert got[0] == 0 and got[-1] == len(v) - 1   # endpoints kept
    assert len(got) == 20


def test_lttb_keeps_extremes_of_a_spike():
    v = np.zeros(100)
    v[40] = 50.0    # lone spike must survive any sensible downsample
    out = op_lttb(_series(v), ["k"], "d", "v", n_out=10)
    kept = out.loc[out["selected"] == 1, "v"]
    assert 50.0 in kept.to_numpy()


def test_lttb_short_series_keeps_everything():
    out = op_lttb(_series([1.0, 2.0, 3.0]), ["k"], "d", "v", n_out=20)
    assert (out["selected"] == 1).all()


def test_lttb_multi_series_independent():
    df = pd.concat([_series(np.arange(50.0), "a"),
                    _series(np.arange(5.0), "b")], ignore_index=True)
    out = op_lttb(df.copy(), ["k"], "d", "v", n_out=10)
    assert out.loc[out["k"] == "a", "selected"].sum() == 10
    assert out.loc[out["k"] == "b", "selected"].sum() == 5
