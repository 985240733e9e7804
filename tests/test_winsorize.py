"""Per-group winsorize scaler (functions/scalers.winsorize_clip)."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.functions.scalers import winsorize_clip


def test_winsorize_matches_pandas_quantiles(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 300),
        "id": np.arange(300),
        "v": rng.normal(size=300),
    })
    got = (winsorize_clip(ray.data.from_pandas(df).repartition(4),
                          ["g"], "v", q_lo=0.1, q_hi=0.9)
           .to_pandas().sort_values("id").reset_index(drop=True))
    q = df.groupby("g")["v"].quantile([0.1, 0.9]).unstack()
    want = df.sort_values("id").reset_index(drop=True)
    lo = want["g"].map(q[0.1]).to_numpy()
    hi = want["g"].map(q[0.9]).to_numpy()
    np.testing.assert_allclose(got["v_winsorized"],
                               np.clip(want["v"].to_numpy(), lo, hi),
                               atol=1e-12)
    # untouched interior values pass through bit-identical
    interior = (want["v"].to_numpy() > lo) & (want["v"].to_numpy() < hi)
    assert (got["v_winsorized"].to_numpy()[interior]
            == want["v"].to_numpy()[interior]).all()
