"""Grouped top-k: exact set-equality with a global sort-and-head, stable
under block layout, deterministic tiebreaks."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.stages.topk import grouped_topk


def _df(n=400, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "id": np.arange(n),
        # coarse values force ties → the tiebreak must decide
        "v": rng.integers(0, 20, n).astype(float),
    })


def _want(df: pd.DataFrame, k: int, descending=True) -> pd.DataFrame:
    srt = df.sort_values(["v", "id"], ascending=[not descending, True],
                         kind="mergesort")
    return (srt.groupby("g", sort=False).head(k)
            .sort_values(["g", "id"]).reset_index(drop=True))


def test_grouped_topk_matches_global(ray_session):
    df = _df()
    for nblocks in (1, 7):
        got = (grouped_topk(ray.data.from_pandas(df).repartition(nblocks),
                            ["g"], "v", k=5, tiebreak=["id"],
                            num_partitions=3)
               .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got[["g", "id", "v"]],
                                      _want(df, 5)[["g", "id", "v"]])


def test_grouped_topk_ascending(ray_session):
    df = _df(seed=11)
    got = (grouped_topk(ray.data.from_pandas(df).repartition(4), ["g"], "v",
                        k=2, descending=False, tiebreak=["id"],
                        num_partitions=2)
           .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["g", "id", "v"]],
        _want(df, 2, descending=False)[["g", "id", "v"]])


def test_grouped_topk_small_groups(ray_session):
    # groups smaller than k come back whole
    df = pd.DataFrame({"g": ["x", "y", "y"], "id": [1, 2, 3],
                       "v": [5.0, 1.0, 2.0]})
    got = (grouped_topk(ray.data.from_pandas(df), ["g"], "v", k=10,
                        tiebreak=["id"], num_partitions=2)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert len(got) == 3
