"""KMV distinct-count sketch: exact regime, estimator accuracy, merge
algebra (the property that makes it cascade-safe), and the distributed
stage vs a single-pass local sketch."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from forecastframe_ray import keys as K
from forecastframe_ray.stages import sketch as S


def _hashes(values) -> np.ndarray:
    return K.hash_key_columns(pd.DataFrame({"v": values}), ["v"])


def test_exact_regime_below_k():
    h = _hashes(np.arange(100))
    sk = S.kmv_from_hashes(h, k=1024)
    assert len(sk) == 100
    assert S.kmv_estimate(sk, 1024) == 100.0


def test_estimator_accuracy_at_scale():
    # 200k distinct values, k=1024 → σ ≈ 1/√k ≈ 3.1%; deterministic hash
    # so this is a fixed number, asserted within 3σ
    h = _hashes(np.arange(200_000))
    sk = S.kmv_from_hashes(h, k=1024)
    est = S.kmv_estimate(sk, 1024)
    assert abs(est - 200_000) / 200_000 < 0.10


def test_merge_equals_direct_and_is_associative():
    """k-min of a union == merge of per-part k-mins, in ANY grouping order
    — the exact property the 1h→1d→7d cascade relies on."""
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50_000, size=120_000)
    h = _hashes(vals)
    k = 512
    direct = S.kmv_from_hashes(h, k)

    parts = np.array_split(h, 7)
    merged = S.kmv_merge([S.kmv_from_hashes(p, k) for p in parts], k)
    assert np.array_equal(direct, merged)

    # associativity: ((p0+p1) + (p2..p6)) == flat merge
    left = S.kmv_merge([S.kmv_from_hashes(parts[0], k),
                        S.kmv_from_hashes(parts[1], k)], k)
    right = S.kmv_merge([S.kmv_from_hashes(p, k) for p in parts[2:]], k)
    assert np.array_equal(S.kmv_merge([left, right], k), direct)

    # bytes roundtrip
    assert np.array_equal(S.kmv_from_bytes(S.kmv_to_bytes(direct)), direct)


def test_distinct_sketch_stage_matches_local():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=5000),
        "v": rng.integers(0, 900, size=5000),
    })
    ds = ray.data.from_pandas(
        [df.iloc[i::6].reset_index(drop=True) for i in range(6)])
    out = ray.data.Dataset.to_pandas(
        S.distinct_sketch(ds, ["g"], "v", k=256, num_partitions=4)) \
        .set_index("g")

    for g, sub in df.groupby("g"):
        local = S.kmv_from_hashes(_hashes(sub["v"].to_numpy()), 256)
        assert np.array_equal(S.kmv_from_bytes(out.loc[g, "kmv"]), local)
        exact = sub["v"].nunique()
        est = out.loc[g, "distinct_est"]
        if exact < 256:
            assert out.loc[g, "is_exact"] and est == exact
        else:
            assert abs(est - exact) / exact < 0.2  # ~3σ at k=256


def test_cascade_hourly_to_daily_equals_direct_daily():
    """Per-(key, 1h-bucket) sketches merged up to 1d buckets must equal the
    sketch computed directly at 1d — byte-identical, not just close."""
    rng = np.random.default_rng(3)
    n = 20_000
    ts_us = rng.integers(0, 3 * 86_400_000_000, size=n)  # 3 days of micros
    vals = rng.integers(0, 5000, size=n)
    h = _hashes(vals)
    k = 128
    hour = (ts_us // 3_600_000_000)
    day = (ts_us // 86_400_000_000)

    hourly = {}
    for hb in np.unique(hour):
        hourly[hb] = S.kmv_from_hashes(h[hour == hb], k)
    for db in np.unique(day):
        direct = S.kmv_from_hashes(h[day == db], k)
        merged = S.kmv_merge(
            [sk for hb, sk in hourly.items() if hb // 24 == db], k)
        assert np.array_equal(direct, merged)


def test_distinct_tiers_cascade_matches_direct_distributed():
    """distinct_tiers: the 1d/7d tiers (sketch-merged from 1h) must be
    byte-identical to sketches computed directly on the raw stream at
    those widths, and exact when cardinality < k."""
    from forecastframe_ray.keys import TIER_US
    from forecastframe_ray.stages.sketch import (distinct_sketch,
                                                 distinct_tiers)

    rng = np.random.default_rng(21)
    n = 30_000
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], size=n),
        "ts": pd.to_datetime(
            rng.integers(0, 10 * 86_400_000_000, size=n), unit="us"),
        "u": rng.integers(0, 400, size=n),
    })
    ds = ray.data.from_pandas(
        [df.iloc[i::5].reset_index(drop=True) for i in range(5)])
    tiers = distinct_tiers(ds, "ts", "u", group_keys=["g"],
                           k=64, num_partitions=4)
    for tier in ("1d", "7d"):
        got = tiers[tier].to_pandas() \
            .sort_values(["g", "bucket_us"]).reset_index(drop=True)

        direct_in = df.copy()
        us = direct_in["ts"].astype("datetime64[us]").astype("int64")
        direct_in["bucket_us"] = (us // TIER_US[tier]) * TIER_US[tier]
        direct = distinct_sketch(
            ray.data.from_pandas(direct_in[["g", "bucket_us", "u"]]),
            ["g", "bucket_us"], "u", k=64, num_partitions=4) \
            .to_pandas().sort_values(["g", "bucket_us"]) \
            .reset_index(drop=True)

        assert len(got) == len(direct)
        for a, b in zip(got["kmv"], direct["kmv"]):
            assert a == b  # byte-identical sketches
        # exact-regime values equal pandas nunique
        exact = direct_in.groupby(["g", "bucket_us"])["u"].nunique()
        for r in got.itertuples(index=False):
            e = exact.loc[(r.g, r.bucket_us)]
            if r.is_exact:
                assert r.distinct_est == e


def test_hist_quantile_relative_error_bound():
    """Log-bucketed histogram quantiles: within (1+2ε) of the exact
    inverse-CDF quantile on a heavy-tailed distribution, and merge of
    parts == direct (count-exact associativity)."""
    rng = np.random.default_rng(2)
    x = rng.lognormal(3.0, 2.0, 80_000)
    eps = 0.01
    ids, cnt = S.hist_from_values(x, eps)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = S.hist_quantile(ids, cnt, q, eps)
        exact = np.quantile(x, q, method="inverted_cdf")
        assert exact <= est <= exact * (1 + 2 * eps) * (1 + 1e-9)

    parts = np.array_split(x, 9)
    merged = S.hist_merge([S.hist_from_values(p, eps) for p in parts])
    assert np.array_equal(merged[0], ids)
    assert np.array_equal(merged[1], cnt)
    rt = S.hist_from_bytes(S.hist_to_bytes(ids, cnt))
    assert np.array_equal(rt[0], ids) and np.array_equal(rt[1], cnt)


def test_hist_underflow_bucket_and_nan_mask():
    ids, cnt = S.hist_from_values(np.array([0.0, -3.0, np.nan, 2.0]), 0.01)
    assert cnt.sum() == 3  # NaN masked
    assert S.hist_quantile(ids, cnt, 0.3, 0.01) == 0.0  # zero/neg -> 0.0
    assert S.hist_quantile(ids, cnt, 0.99, 0.01) >= 2.0


def test_quantile_sketch_stage_matches_local():
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], size=4000),
        "v": rng.lognormal(2, 1, 4000),
    })
    ds = ray.data.from_pandas(
        [df.iloc[i::5].reset_index(drop=True) for i in range(5)])
    out = S.quantile_sketch(ds, ["g"], "v", eps=0.02, num_partitions=4) \
        .to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        ids, cnt = S.hist_from_bytes(out.loc[g, "qhist"])
        lids, lcnt = S.hist_from_values(sub["v"].to_numpy(), 0.02)
        assert np.array_equal(ids, lids) and np.array_equal(cnt, lcnt)
        assert out.loc[g, "n"] == len(sub)


def test_mg_truncate_and_merge_bounds():
    """Misra–Gries: never overcounts, undercounts ≤ 2n/(k+1), and every
    value above that threshold is present after a multi-part merge."""
    rng = np.random.default_rng(7)
    # Zipf-ish: a few heavy values + a long uniform tail
    heavy = np.repeat(np.array(["H0", "H1", "H2"]), [4000, 2500, 1500])
    tail = np.array([f"t{i}" for i in rng.integers(0, 3000, size=12_000)])
    x = np.concatenate([heavy, tail])
    rng.shuffle(x)
    n, k = len(x), 64

    parts = np.array_split(x, 11)
    summaries = []
    for p in parts:
        v, c = np.unique(p, return_counts=True)
        summaries.append(S.mg_truncate(v, c.astype(np.int64), k))
    v, c = S.mg_merge(summaries, k)
    assert len(v) <= k

    true = pd.Series(x).value_counts()
    bound = 2 * n / (k + 1)
    got = dict(zip(v, c))
    for val, tc in true.items():
        if val in got:
            assert got[val] <= tc          # never overcounts
            assert got[val] >= tc - bound  # bounded undercount
        else:
            assert tc <= bound             # misses only light values
    for h in ("H0", "H1", "H2"):
        assert h in got  # heavy hitters guaranteed present


def test_topk_sketch_stage_exact_below_k():
    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], size=6000),
        "v": rng.choice([f"u{i}" for i in range(40)], size=6000,
                        p=np.array([10] * 5 + [1] * 35, dtype=float)
                        / (50 + 35)),
    })
    ds = ray.data.from_pandas(
        [df.iloc[i::7].reset_index(drop=True) for i in range(7)])
    out = S.topk_sketch(ds, ["g"], "v", k=64, num_partitions=4).to_pandas()
    for g, sub in df.groupby("g"):
        true = sub["v"].value_counts()
        got = out[out["g"] == g].set_index("v")["mg_count"]
        assert len(got) == len(true)  # below k -> all values, exact
        for val, tc in true.items():
            assert got[val] == tc
        assert (out.loc[out["g"] == g, "n"] == len(sub)).all()


# property-based merge laws (hypothesis): arbitrary values and arbitrary
# split points — merge of parts must equal the direct sketch exactly
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=200), min_size=1,
                max_size=400),
       st.integers(min_value=1, max_value=8),
       st.integers(min_value=1, max_value=64))
def test_kmv_merge_equals_direct_property(vals, nparts, k):
    h = _hashes(np.array(vals))
    direct = S.kmv_from_hashes(h, k)
    parts = np.array_split(h, min(nparts, len(h)))
    merged = S.kmv_merge([S.kmv_from_hashes(p, k) for p in parts if len(p)],
                         k)
    assert np.array_equal(direct, merged)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e9,
                          allow_nan=False), min_size=1, max_size=400),
       st.integers(min_value=1, max_value=8))
def test_hist_merge_equals_direct_property(vals, nparts):
    x = np.array(vals, dtype=np.float64)
    eps = 0.01
    ids, cnt = S.hist_from_values(x, eps)
    parts = np.array_split(x, min(nparts, len(x)))
    mids, mcnt = S.hist_merge(
        [S.hist_from_values(p, eps) for p in parts if len(p)])
    assert np.array_equal(ids, mids)
    assert np.array_equal(cnt, mcnt)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                max_size=300),
       st.integers(min_value=2, max_value=40))
def test_mg_merge_never_overcounts_property(vals, k):
    x = np.array([f"v{v}" for v in vals])
    true = pd.Series(x).value_counts()
    parts = np.array_split(x, 5)
    summaries = []
    for p in parts:
        if not len(p):
            continue
        v, c = np.unique(p, return_counts=True)
        summaries.append(S.mg_truncate(v, c.astype(np.int64), k))
    v, c = S.mg_merge(summaries, k)
    assert len(v) <= k
    got = dict(zip(v, c))
    bound = 2 * len(x) / (k + 1)
    for val, tc in true.items():
        if val in got:
            assert got[val] <= tc
            assert got[val] >= tc - bound
        else:
            assert tc <= bound
