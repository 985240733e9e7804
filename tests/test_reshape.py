"""Pivot (long → wide) / melt (wide → long) reshape stages."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.stages.reshape import (distinct_categories, melt_long,
                                              pivot_wide)


def _long() -> pd.DataFrame:
    return pd.DataFrame({
        "d": pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-02",
                             "2024-01-03", "2024-01-03"]),
        "cat": ["a", "b", "a", "b", "c"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })


def test_pivot_wide_cells_and_nulls(ray_session):
    df = _long()
    ds = ray.data.from_pandas(df).repartition(3)
    cats = distinct_categories(ds, "cat", num_partitions=2)
    assert cats == ["a", "b", "c"]
    wide = (pivot_wide(ds, ["d"], "cat", "v", cats, num_partitions=2)
            .to_pandas().sort_values("d").reset_index(drop=True))
    want = df.pivot(index="d", columns="cat", values="v")
    for c in cats:
        got = wide[f"v_{c}"].to_numpy()
        exp = want[c].to_numpy()
        both_nan = np.isnan(got) & np.isnan(exp)
        assert (both_nan | (got == exp)).all(), c


def test_melt_roundtrip(ray_session):
    df = _long()
    ds = ray.data.from_pandas(df)
    wide = pivot_wide(ds, ["d"], "cat", "v", ["a", "b", "c"],
                      num_partitions=2)
    back = (melt_long(wide, ["d"], ["v_a", "v_b", "v_c"], var_name="cat",
                      value_name="v", drop_null=True)
            .to_pandas())
    back["cat"] = back["cat"].str.removeprefix("v_")
    back = back.sort_values(["d", "cat"]).reset_index(drop=True)
    orig = df.sort_values(["d", "cat"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["d", "cat", "v"]], orig)
