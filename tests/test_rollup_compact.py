"""CDC compaction (stages/agg.compact_latest), GROUPING SETS partial
cascade (pipelines/rollup.grouping_sets_rollup), and shingle containment
(pipelines/dedup.ngram_containment)."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.pipelines.dedup import ngram_containment, ngram_jaccard
from forecastframe_ray.pipelines.rollup import grouping_sets_rollup
from forecastframe_ray.stages.agg import compact_latest


def test_compact_latest_keeps_max_order_tuple(ray_session):
    rng = np.random.default_rng(5)
    n = 2_000
    df = pd.DataFrame({
        "k": rng.integers(0, 300, n),
        "ts": rng.integers(0, 10_000, n),
        "uid": np.arange(n, dtype=np.int64),
        "payload": rng.normal(size=n),
    })
    # many blocks so the per-batch combiner actually pre-compacts
    ds = ray.data.from_pandas([d for _, d in df.groupby(df.index // 100)])
    got = compact_latest(ds, ["k"], ["ts", "uid"], num_partitions=4) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = (df.sort_values(["ts", "uid"]).drop_duplicates("k", keep="last")
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert len(got) == df["k"].nunique()


def test_compact_latest_tie_break_deterministic(ray_session):
    # two rows with the SAME (k, ts): the greater uid must win
    df = pd.DataFrame({"k": [1, 1], "ts": [5, 5], "uid": [10, 11]})
    out = compact_latest(ray.data.from_pandas(df), ["k"], ["ts", "uid"],
                         num_partitions=2).to_pandas()
    assert out["uid"].tolist() == [11]


def test_grouping_sets_cascade_consistent(ray_session):
    rng = np.random.default_rng(9)
    n = 1_000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.integers(0, 10, n),
        "v": rng.normal(100, 10, n).round(4),
    })
    sets = grouping_sets_rollup(ray.data.from_pandas(df), "a", "b", "v",
                                num_partitions=4)
    ab = sets["ab"].to_pandas()
    a = sets["a"].to_pandas()
    b = sets["b"].to_pandas()
    tot = sets["total"].to_pandas()
    # every level against a direct pandas groupby
    want_ab = df.groupby(["a", "b"], as_index=False).agg(
        n=("v", "size"), sum_v=("v", "sum"))
    got_ab = ab.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_ab[["a", "b", "n"]],
        want_ab.sort_values(["a", "b"]).reset_index(drop=True)[["a", "b", "n"]],
        check_dtype=False)
    np.testing.assert_allclose(
        got_ab["sum_v"],
        want_ab.sort_values(["a", "b"])["sum_v"], rtol=1e-9)
    assert sorted(a["a"]) == sorted(df["a"].unique())
    np.testing.assert_allclose(a["sum_v"].sum(), df["v"].sum(), rtol=1e-9)
    np.testing.assert_allclose(b["sum_v"].sum(), df["v"].sum(), rtol=1e-9)
    assert tot["n"].iloc[0] == n and len(tot) == 1
    np.testing.assert_allclose(tot["sum_v"].iloc[0], df["v"].sum(), rtol=1e-9)


def test_compact_latest_null_order_values_lose(ray_session):
    # SQL row_number DESC NULLS LAST parity: a NULL order value must lose
    # to any real value (review r4)
    df = pd.DataFrame({"k": [1, 1], "ts": [pd.NaT, pd.Timestamp("2020-01-01")],
                       "uid": [2, 1]})
    out = compact_latest(ray.data.from_pandas(df), ["k"], ["ts", "uid"],
                         num_partitions=2).to_pandas()
    assert out["uid"].tolist() == [1]


def test_ngram_containment_excerpt():
    big = "the quick brown fox jumps over the lazy dog again and again"
    small = "quick brown fox"
    # every 5-shingle of the excerpt occurs in the superstring
    assert ngram_containment(small, big) == 1.0
    # but symmetric jaccard is far from 1
    assert ngram_jaccard(small, big) < 0.5
    assert ngram_containment("", "") == 1.0
    assert ngram_containment("", "abcdef") == 0.0
    assert ngram_containment("abcdefgh", "zzzzzzzz") == 0.0
