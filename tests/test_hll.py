"""HyperLogLog sketch properties (stages/sketch.py)."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.stages import sketch as S


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(7)
    h = S._mix64(rng.integers(0, 2**63, 200_000, dtype=np.uint64))
    regs = S.hll_from_hashes(h, 12)
    exact = len(np.unique(h))
    assert abs(S.hll_estimate(regs) - exact) / exact < 0.05
    # merge of any split == sketch of the whole (register-wise max)
    r1 = S.hll_from_hashes(h[:50_000], 12)
    r2 = S.hll_from_hashes(h[50_000:], 12)
    assert np.array_equal(S.hll_merge([r1, r2]), regs)
    # idempotent
    assert np.array_equal(S.hll_merge([regs, regs]), regs)


def test_hll_small_range_linear_counting():
    h = S._mix64(np.arange(100, dtype=np.uint64))
    est = S.hll_estimate(S.hll_from_hashes(h, 12))
    assert abs(est - 100) / 100 < 0.05


def test_clz64_exact_at_power_of_two_edges():
    x = np.array([1, 2, 3, 2**31, 2**32, 2**62, 2**63, 2**64 - 1],
                 dtype=np.uint64)
    expect = np.array([63, 62, 62, 32, 31, 1, 0, 0])
    assert np.array_equal(S._clz64(x), expect)


def test_hll_distinct_dataset(ray_session):
    df = pd.DataFrame({"k": ["a"] * 5000 + ["b"] * 3000,
                       "u": list(range(5000)) + list(range(1000)) * 3})
    out = S.hll_distinct(ray.data.from_pandas(df), ["k"], "u",
                         p=12, num_partitions=4).to_pandas()
    out = out.set_index("k")["distinct_est"]
    assert abs(out["a"] - 5000) / 5000 < 0.05
    assert abs(out["b"] - 1000) / 1000 < 0.05
