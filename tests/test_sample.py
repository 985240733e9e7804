"""Deterministic md5-bucket sampling (`stages/sample.py`, SURVEY O7
production form): cluster-shape stability, rate monotonicity, and parity
with the DuckDB oracle expression."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from forecastframe_ray.stages.sample import deterministic_sample


def _df(n=2000):
    return pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                         "v": np.arange(n, dtype=np.float64) * 0.5})


def _ids(ds):
    return set(ds.to_pandas()["k"].tolist())


def test_sample_stable_across_partitionings():
    df = _df()
    a = _ids(deterministic_sample(
        ray.data.from_pandas(df).repartition(2), "k", 0.25))
    b = _ids(deterministic_sample(
        ray.data.from_pandas(df).repartition(13), "k", 0.25))
    assert a == b and 0 < len(a) < len(df)
    # expected-rate sanity: binomial(2000, .25) within 5 sigma
    assert abs(len(a) - 500) < 5 * (2000 * 0.25 * 0.75) ** 0.5


def test_sample_rate_monotone():
    ds = ray.data.from_pandas(_df())
    small = _ids(deterministic_sample(ds, "k", 0.1))
    big = _ids(deterministic_sample(ds, "k", 0.4))
    assert small < big  # strict subset: same hash, larger cut


def test_sample_matches_duckdb_oracle():
    df = _df(500)
    got = sorted(_ids(deterministic_sample(ray.data.from_pandas(df), "k", 0.125)))
    con = duckdb.connect()
    con.register("t", df)
    want = [r[0] for r in con.execute("""
        SELECT k FROM t
        WHERE CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 8))
                   AS BIGINT) < CAST(floor(0.125 * 4294967296) AS BIGINT)
        ORDER BY k""").fetchall()]
    assert got == want


def test_sample_rate_validation():
    ds = ray.data.from_pandas(_df(10))
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            deterministic_sample(ds, "k", bad)


def test_hash_split_rejects_fractions_over_one():
    import pytest as _pytest

    from forecastframe_ray.stages.sample import hash_split

    with _pytest.raises(ValueError, match="sum to"):
        hash_split(None, "k", {"train": 0.8, "val": 0.5, "test": 0.1})


def test_mixture_weights_formula():
    from forecastframe_ray.stages.sample import mixture_weights
    df = pd.DataFrame({"g": ["a"] * 80 + ["b"] * 15 + ["c"] * 5,
                       "k": range(100)})
    w = mixture_weights(ray.data.from_pandas(df).repartition(3), "g",
                        temperature=0.5)
    p = np.array([0.80, 0.15, 0.05])
    want = p ** 2 / (p ** 2).sum()
    np.testing.assert_allclose(w.sort_values("g")["w"], want, rtol=1e-12)
    # T > 1 flattens: smallest group's weight rises above its share
    w2 = mixture_weights(ray.data.from_pandas(df), "g", temperature=5.0)
    w2 = w2.set_index("g")
    assert w2.loc["c", "w"] > w2.loc["c", "p"]
    with pytest.raises(ValueError):
        mixture_weights(ray.data.from_pandas(df), "g", temperature=0.0)


def test_mixture_sample_deterministic_and_rate_bounded():
    from forecastframe_ray.stages.sample import mixture_sample
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"g": rng.choice(["a", "b"], 2000, p=[0.9, 0.1]),
                       "k": np.arange(2000)})
    ds = ray.data.from_pandas(df).repartition(4)
    s1 = mixture_sample(ds, "g", "k", budget_frac=0.5,
                        temperature=0.5).to_pandas()
    s2 = mixture_sample(ray.data.from_pandas(df).repartition(7), "g", "k",
                        budget_frac=0.5, temperature=0.5).to_pandas()
    # identical membership across partitionings
    assert set(s1["k"]) == set(s2["k"])
    # T=0.5 over a 90/10 split concentrates the budget on the big group:
    # the small group's keep-rate must be well below the big group's
    kept = s1.groupby("g")["k"].count()
    tot = df.groupby("g")["k"].count()
    assert kept["a"] / tot["a"] > kept["b"] / tot["b"]
    # overall keep close to the budget (md5 buckets are uniform-ish)
    assert abs(len(s1) / len(df) - 0.5) < 0.08


def test_mixture_weights_size_col_token_weighted(ray_session):
    # weighting by a size column (token counts) must use summed sizes, not
    # row counts: group "b" has few rows but huge docs
    from forecastframe_ray.stages.sample import mixture_weights
    df = pd.DataFrame({
        "g": ["a"] * 90 + ["b"] * 10,
        "k": range(100),
        "n_tok": [10] * 90 + [910] * 10,   # a: 900 tokens, b: 9100
    })
    w = mixture_weights(ray.data.from_pandas(df).repartition(3), "g",
                        temperature=1.0, size_col="n_tok").set_index("g")
    assert w.loc["b", "p"] == pytest.approx(0.91)
    assert w.loc["b", "w"] == pytest.approx(0.91)   # T=1: w == p
