"""Banded DTW (pipelines/queries._dtw_band) vs an independent full DP."""

import numpy as np

from forecastframe_ray.pipelines.queries import _dtw_band


def _dtw_full(x, y):
    n, m = len(x), len(y)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = (x[i - 1] - y[j - 1]) ** 2
            D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return float(np.sqrt(D[n, m]))


def test_dtw_known_small_case():
    x = np.array([0.0, 1.0, 2.0])
    y = np.array([0.0, 2.0, 2.0])
    # optimal path: (0,0)->(1,1) cost 1 ->(2,2)+ (2,3): sqrt(1)
    assert np.isclose(_dtw_band(x, y, w=3), _dtw_full(x, y))
    assert _dtw_band(x, x, w=3) == 0.0


def test_dtw_band_wide_enough_matches_full_dp():
    rng = np.random.default_rng(11)
    for _ in range(5):
        x = rng.normal(size=20)
        y = rng.normal(size=20)
        assert np.isclose(_dtw_band(x, y, w=20), _dtw_full(x, y))


def test_dtw_envelope_properties():
    rng = np.random.default_rng(12)
    x = rng.normal(size=30)
    y = rng.normal(size=30)
    eu = float(np.sqrt(((x - y) ** 2).sum()))
    d = _dtw_band(x, y, w=3)
    assert 0.0 <= d <= eu + 1e-12  # warping can only reduce cost
    # narrower band can't beat a wider one
    assert _dtw_band(x, y, w=1) >= _dtw_band(x, y, w=5) - 1e-12


def test_dtw_unequal_lengths():
    x = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([0.0, 3.0])
    assert np.isclose(_dtw_band(x, y, w=1), _dtw_full(x, y))
