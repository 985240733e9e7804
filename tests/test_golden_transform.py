"""Reference golden tests ported: transforms & utilities
(/root/reference/tests/test_transform.py, tests/test_utilities.py)."""

import numpy as np
import pandas as pd

from tests.conftest import assert_close, tiny_sales_df, HIERARCHY


def _frame(**kw):
    from forecastframe_ray import RayForecastFrame
    return RayForecastFrame(
        tiny_sales_df(), datetime_column="datetime", target="sales_int",
        hierarchy=HIERARCHY, num_partitions=4, **kw,
    )


def test_fill_time_gaps():
    # ref tests/test_transform.py:8-28 — every group widened to the GLOBAL
    # 7-day range
    f = _frame()
    f.fill_time_gaps(mode="global")
    df = f.to_pandas()
    answer = pd.to_datetime(
        ["2019-12-30", "2019-12-31", "2020-01-01", "2020-01-02", "2020-01-03",
         "2020-01-04", "2020-01-05"] * 3
    )
    assert (df["datetime"].values == answer.values).all()


def test_fill_time_gaps_local_mode():
    # engine addition: per-group range only (scale-safe default)
    f = _frame()
    f.fill_time_gaps(mode="local")
    df = f.to_pandas()
    # Prod_3: 2020-01-01..05 → 5 rows; Prod_4/5: 2019-12-30..2020-01-02 → 4 each
    assert len(df) == 5 + 4 + 4
    p3 = df[df["product"] == "Prod_3"]
    assert p3["datetime"].tolist() == list(pd.date_range("2020-01-01", "2020-01-05"))



def _first(x):
    import numpy as _np
    return _np.atleast_1d(_np.asarray(x)).ravel()[0]

def test_fill_missings():
    # ref tests/test_transform.py:31-44
    f = _frame()
    f.fill_missings()
    df = f.to_pandas().set_index("datetime")
    assert _first(df.loc["2020-01-03", "sales_float"]) == 10000.00
    assert _first(df.loc[pd.Timestamp("2019-12-31"), "sales_float"]) == 5.1
    assert _first(df.loc[pd.Timestamp("2019-12-31"), "sales_int"]) == 5


def test_fill_missings_backward():
    # ref tests/test_transform.py:81-91
    f = _frame()
    f.fill_missings(method="bfill")
    df = f.to_pandas().set_index("datetime")
    assert _first(df.loc["2020-01-03", "sales_float"]) == 123.21
    assert _first(df.loc[pd.Timestamp("2019-12-31"), "sales_float"]) == 0


def test_fill_missings_subset():
    # ref tests/test_transform.py:94-106
    f = _frame()
    f.fill_missings(method="bfill", features="sales_float")
    df = f.to_pandas().set_index("datetime")
    assert _first(df.loc["2020-01-03", "sales_float"]) == 123.21
    assert _first(df.loc[pd.Timestamp("2019-12-31"), "sales_float"]) == 0
    assert np.isnan(_first(df.loc[pd.Timestamp("2019-12-31"), "sales_int"]))


def test_fill_missings_interpolate():
    # north_rule addition: linear-in-time interpolation inside gaps
    f = _frame()
    f.fill_time_gaps(mode="local")
    f.fill_missings(method="interpolate", features=["sales_float"])
    df = f.to_pandas()
    p3 = df[df["product"] == "Prod_3"].set_index("datetime")["sales_float"]
    # 10000 @01-02 … 123.21 @01-05 → linear at 01-03 / 01-04
    assert_close(p3.loc["2020-01-03"], 10000 + (123.21 - 10000) / 3)
    assert_close(p3.loc["2020-01-04"], 10000 + 2 * (123.21 - 10000) / 3)


def test_correct_negatives():
    # ref tests/test_transform.py:47-78
    f = _frame()
    f.correct_negatives()
    result = f.to_pandas()["sales_int"].values
    answer = [113.0, 10000.0, 214.0, 123.0, 5.0, np.nan, 0.0, 0.0, 2.0, 4.0, 10.0, 0.0]
    assert_close(result, answer)
    f.correct_negatives(features=["sales_int", "sales_float"])
    result = f.to_pandas()[["sales_int", "sales_float"]].values
    answer = np.array([
        [113.0, 113.21], [10000.0, 10000.0], [214.0, np.nan], [123.0, 123.21],
        [5.0, 5.1], [np.nan, np.nan], [0.0, 0.0], [0.0, 0.0],
        [2.0, 2.1], [4.0, 4.1], [10.0, 10.2], [0.0, 0.0],
    ])
    assert_close(result.ravel(), answer.ravel())


def test_log_features():
    # ref tests/test_transform.py:158-170
    f = _frame()
    f.correct_negatives(features=["sales_int", "sales_float"])
    f.log_features("sales_float")
    result = f.to_pandas()["sales_float"].values
    answer = np.log1p([113.21, 10000, np.nan, 123.21, 5.1, np.nan, 0, 0, 2.1, 4.1, 10.2, 0])
    assert_close(result, answer)


def test_log_features_raises_on_negatives():
    f = _frame()
    f.log_features("sales_float")
    try:
        f.to_pandas()
        raise AssertionError("expected ValueError for negative values")
    except Exception as e:
        assert "negative values" in str(e)


def test_standardize_features():
    # ref tests/test_transform.py:173-185 — we match the reference's actual
    # math (pandas ddof=1), not sklearn's ddof=0 (SURVEY.md M3)
    f = _frame()
    f.standardize_features(["sales_float", "sales_int"])
    df = f.to_pandas()
    src = tiny_sales_df()
    expected = (src[["sales_float", "sales_int"]] - src[["sales_float", "sales_int"]].mean()) \
        / src[["sales_float", "sales_int"]].std()
    assert_close(df[["sales_float", "sales_int"]].values.ravel(), expected.values.ravel())


def test_normalize_features():
    # ref tests/test_transform.py:188-200 (min-max matches sklearn exactly)
    f = _frame()
    f.normalize_features(["sales_float", "sales_int"])
    df = f.to_pandas()
    src = tiny_sales_df()[["sales_float", "sales_int"]]
    expected = (src - src.min()) / (src.max() - src.min())
    assert_close(df[["sales_float", "sales_int"]].values.ravel(), expected.values.ravel())


def test_descale_features():
    # ref tests/test_transform.py:203-219
    f = _frame()
    f.correct_negatives(features=["sales_int", "sales_float"])
    base = f.to_pandas()[["sales_int", "sales_float"]].values
    f.log_features(["sales_int"])
    f.standardize_features(["sales_float"])
    f.descale_features()
    result = f.to_pandas()[["sales_int", "sales_float"]].values
    assert_close(result.ravel(), base.ravel())
    assert f.transforms == {}


def test_descale_target():
    # ref tests/test_transform.py:222-246
    f = _frame()
    f.correct_negatives(features=["sales_int", "sales_float"])
    answer = f.to_pandas()["sales_int"].values
    f.log_features(["sales_int"])
    scaled = f.to_pandas()["sales_int"].values
    result = f.descale_target(scaled)
    assert_close(result, answer)
    f.descale_features()

    f.standardize_features(["sales_int"])
    result = f.descale_target(f.to_pandas()["sales_int"].values)
    assert_close(result, answer)
    f.descale_features()

    f.normalize_features(["sales_int"])
    result = f.descale_target(f.to_pandas()["sales_int"].values)
    assert_close(result, answer)
    f.descale_features()

    # no transforms → identity
    result = f.descale_target(f.to_pandas()["sales_int"].values)
    assert_close(result, answer)


def test_apply_transform_dict():
    # ref tests/test_transform.py:249-274
    from forecastframe_ray.functions.scalers import apply_transform_dict
    f = _frame()
    f.correct_negatives(features=["sales_int", "sales_float"])
    initial = f.to_pandas()
    out = apply_transform_dict(
        f.dataset,
        {
            "log1p": {"features": ["sales_int"]},
            "normalize": {"features": ["sales_float"],
                          "maxes": {"sales_float": 500}, "mins": {"sales_float": 100}},
        },
    ).to_pandas().sort_values(HIERARCHY + ["datetime"], kind="mergesort")
    assert_close(out["sales_int"].values, np.log1p(initial["sales_int"].values))
    assert_close(out["sales_float"].values, (initial["sales_float"].values - 100) / 400)


def test_encode_categoricals():
    # ref tests/test_transform.py:122-144
    f = _frame()
    f.encode_categoricals()
    result = f.to_pandas()[HIERARCHY].values.tolist()
    answer = (
        [[0, 0, 0, 0]] * 4 + [[1, 1, 0, 0]] * 4 + [[1, 2, 0, 0]] * 4
    )
    assert result == answer
    assert f.categorical_keys["product"] == {0: "Prod_3", 1: "Prod_4", 2: "Prod_5"}


def test_decode_categoricals():
    # ref tests/test_transform.py:147-155
    f = _frame()
    answer = f.to_pandas()[HIERARCHY].values.tolist()
    f.encode_categoricals()
    f.decode_categoricals()
    result = f.to_pandas()[HIERARCHY].values.tolist()
    assert result == answer


def test_assert_feature_not_transformed():
    # ref tests/test_utilities.py:9-16
    f = _frame()
    f.standardize_features(["sales_float", "sales_int"])
    try:
        f.standardize_features(["sales_float", "sales_int"])
        raise RuntimeError("should have raised")
    except AssertionError:
        pass


def test_compress():
    from forecastframe_ray import RayForecastFrame
    import pyarrow as pa
    df = tiny_sales_df()
    df["small_int"] = np.arange(12, dtype=np.int64)
    f = RayForecastFrame(df, "datetime", "sales_int", HIERARCHY, num_partitions=4)
    f.compress()
    schema = f.dataset.schema()
    t = dict(zip(schema.names, schema.types))["small_int"]
    assert t == pa.int8() or np.dtype(t) == np.int8


def test_calc_datetime_features():
    # ref tests/test_utilities.py:48-82
    f = _frame()
    f.calc_datetime_features()
    cols = ["day", "day_of_week", "weekend_flag", "week", "month", "year",
            "quarter", "month_year", "quarter_year"]
    result = f.to_pandas()[cols].values.tolist()
    answer = [
        [1, 2, False, 1, 1, 20, 1, "20M01", "20Q1"],
        [2, 3, False, 1, 1, 20, 1, "20M01", "20Q1"],
        [3, 4, False, 1, 1, 20, 1, "20M01", "20Q1"],
        [5, 6, True, 2, 1, 20, 1, "20M01", "20Q1"],
        [30, 0, False, 53, 12, 19, 4, "19M12", "19Q4"],
        [31, 1, False, 53, 12, 19, 4, "19M12", "19Q4"],
        [1, 2, False, 1, 1, 20, 1, "20M01", "20Q1"],
        [2, 3, False, 1, 1, 20, 1, "20M01", "20Q1"],
        [30, 0, False, 53, 12, 19, 4, "19M12", "19Q4"],
        [31, 1, False, 53, 12, 19, 4, "19M12", "19Q4"],
        [1, 2, False, 1, 1, 20, 1, "20M01", "20Q1"],
        [2, 3, False, 1, 1, 20, 1, "20M01", "20Q1"],
    ]
    assert result == answer


def test_validate_primary_key():
    # ref tests/test_io.py:9-22
    from forecastframe_ray import RayForecastFrame
    df = tiny_sales_df()
    dup = pd.concat([df, df.iloc[[0]]], ignore_index=True)
    f = RayForecastFrame(dup, "datetime", "sales_int", HIERARCHY, num_partitions=4)
    try:
        f.validate_primary_key()
        raise RuntimeError("should have raised")
    except AssertionError:
        pass
    _frame().validate_primary_key()  # clean fixture passes
