"""Reference golden tests ported to the Ray engine
(/root/reference/tests/test_feature_engineering.py) — each operator runs
through the real Ray pipeline on the 12-row fixture and must reproduce the
hand-computed answers within 1e-6."""

import numpy as np

from tests.conftest import assert_close


def test_calc_days_since_release(tiny_frame):
    # ref tests/test_feature_engineering.py:45-53
    tiny_frame.calc_days_since_release()
    result = tiny_frame.to_pandas()["days_since_release"].tolist()
    assert result == [0, 1, 2, 4, 0, 1, 2, 3, 0, 1, 2, 3]


def test_lag_features(tiny_frame):
    # ref tests/test_feature_engineering.py:56-82
    tiny_frame.lag_features(features=["sales_int", "sales_float"], lags=[1, 3])
    df = tiny_frame.to_pandas()
    result = df[["sales_int_lag1", "sales_int_lag3"]].fillna("missing").values.tolist()
    answer = [
        ["missing", "missing"],
        [113.0, "missing"],
        [10000.0, "missing"],
        [214.0, 113.0],
        ["missing", "missing"],
        [5.0, "missing"],
        ["missing", "missing"],
        [0.0, 5.0],
        ["missing", "missing"],
        [2.0, "missing"],
        [4.0, "missing"],
        [10.0, 2.0],
    ]
    assert result == answer


def test_calc_statistical_features(tiny_frame):
    # ref tests/test_feature_engineering.py:149-199
    tiny_frame.calc_statistical_features(
        ["sales_int", "sales_float"], windows=[2, 4], min_periods=1
    )
    df = tiny_frame.to_pandas()
    first_answer = [
        np.nan, np.nanmean([113.21]), np.nanmean([113.21, 10000]), np.nanmean([np.nan]),
        np.nan, np.nanmean([5.1]), np.nanmean([5.1, np.nan]), np.nanmean([np.nan, 0]),
        np.nan, np.nanmean([2.1]), np.nanmean([2.1, 4.1]), np.nanmean([4.1, 10.2]),
    ]
    second_answer = [
        np.nan, np.nanmean([113.21]), np.nanmean([113.21, 10000]),
        np.nanmean([113.21, 10000, np.nan]),
        np.nan, np.nanmean([5.1]), np.nanmean([5.1, np.nan]), np.nanmean([5.1, np.nan, 0]),
        np.nan, np.nanmean([2.1]), np.nanmean([2.1, 4.1]), np.nanmean([2.1, 4.1, 10.2]),
    ]
    assert_close(df["sales_float_mean_roll2_lag1"].values, first_answer)
    assert_close(df["sales_float_mean_roll4_lag1"].values, second_answer)


def test_calc_statistical_features_aggregates(tiny_frame):
    # ref tests/test_feature_engineering.py:85-146 — rollup groupers path
    tiny_frame.calc_statistical_features(
        ["sales_int", "sales_float"],
        aggregations="sum",
        windows=[2, 4],
        min_periods=1,
        groupers={
            "name": "across_products",
            "columns": ["store", "state", "category"],
            "operation": "sum",
        },
    )
    df = tiny_frame.to_pandas().sort_values(
        ["store", "state", "category", "product"], kind="mergesort"
    )
    first_answer = [
        np.nan, np.nansum([113.21]), np.nansum([113.21, 10000]), np.nansum([np.nan]),
        np.nan, np.nansum([5.1, 2.1]), np.nansum([5.1, 2.1, 4.1, np.nan]),
        np.nansum([4.1, np.nan, 0, 10.2]),
        np.nan, np.nansum([5.1, 2.1]), np.nansum([5.1, 2.1, 4.1, np.nan]),
        np.nansum([4.1, np.nan, 0, 10.2]),
    ]
    second_answer = [
        np.nan, np.nansum([113.21]), np.nansum([113.21, 10000]),
        np.nansum([113.21, 10000, np.nan]),
        np.nan, np.nansum([5.1, 2.1]), np.nansum([5.1, 2.1, 4.1, np.nan]),
        np.nansum([4.1, np.nan, 0, 10.2, 5.1, 2.1]),
        np.nan, np.nansum([5.1, 2.1]), np.nansum([5.1, 2.1, 4.1, np.nan]),
        np.nansum([4.1, np.nan, 0, 10.2, 5.1, 2.1]),
    ]
    # the reference compares with nansum-diff (NaN pattern not asserted —
    # its all-NaN rolled sums are 0.0, ours too via pandas-sum parity)
    r1 = df["sales_float_sum_across_products_roll2_lag1"].values
    r2 = df["sales_float_sum_across_products_roll4_lag1"].values
    assert abs(np.nansum(r1 - np.array(first_answer))) <= 1e-6, list(zip(r1, first_answer))
    assert abs(np.nansum(r2 - np.array(second_answer))) <= 1e-6, list(zip(r2, second_answer))


def test_calc_statistical_features_momentum_and_percentages(tiny_frame):
    # ref tests/test_feature_engineering.py:202-294
    tiny_frame.calc_statistical_features(
        ["sales_int", "sales_float"],
        aggregations=["mean", "sum"],
        windows=[2, 4],
        min_periods=1,
        momentums=True,
        percentages=True,
    )
    df = tiny_frame.to_pandas()
    first_answer = [
        np.nan, 113.21 / np.nanmean([113.21]), 10000 / np.nanmean([113.21, 10000]), np.nan,
        np.nan, 5.1 / np.nanmean([5.1]), np.nan, 0 / np.nanmean([np.nan, 0]),
        np.nan, 2.1 / np.nanmean([2.1]), 4.1 / np.nanmean([2.1, 4.1]),
        10.2 / np.nanmean([4.1, 10.2]),
    ]
    second_answer = [
        np.nan, 113.21 / np.nanmean([113.21]), 10000 / np.nanmean([113.21, 10000]), np.nan,
        np.nan, 5.1 / np.nanmean([5.1]), np.nan, 0 / np.nanmean([5.1, np.nan, 0]),
        np.nan, 2.1 / np.nanmean([2.1]), 4.1 / np.nanmean([2.1, 4.1]),
        10.2 / np.nanmean([2.1, 4.1, 10.2]),
    ]
    third_answer = [
        np.nan, 113.21 / np.nansum([113.21]), 10000 / np.nansum([113.21, 10000]), np.nan,
        np.nan, 5.1 / np.nansum([5.1]), np.nan, 0 / np.nansum([np.nan, 0]),
        np.nan, 2.1 / np.nansum([2.1]), 4.1 / np.nansum([2.1, 4.1]),
        10.2 / np.nansum([4.1, 10.2]),
    ]
    fourth_answer = [
        np.nan, 113.21 / np.nansum([113.21]), 10000 / np.nansum([113.21, 10000]), np.nan,
        np.nan, 5.1 / np.nansum([5.1]), np.nan, 0 / np.nansum([5.1, np.nan, 0]),
        np.nan, 2.1 / np.nansum([2.1]), 4.1 / np.nansum([2.1, 4.1]),
        10.2 / np.nansum([2.1, 4.1, 10.2]),
    ]
    assert_close(df["sales_float_mean_roll2_lag1_momentum"].values, first_answer)
    assert_close(df["sales_float_mean_roll4_lag1_momentum"].values, second_answer)
    assert_close(df["sales_float_sum_roll2_lag1_perc"].values, third_answer)
    assert_close(df["sales_float_sum_roll4_lag1_perc"].values, fourth_answer)


def test_calc_ewma(tiny_frame):
    # ref tests/test_feature_engineering.py:322-379
    tiny_frame.calc_ewma(
        features=["sales_int", "sales_float"], windows=[2, 3, 4],
        min_periods=1, adjust=True, crossovers=True,
    )
    df = tiny_frame.to_pandas()
    first_answer = np.array([
        np.nan, 113.21, 7528.302499999999, 7528.302499999999,
        np.nan, 5.1, 5.1, 0.51,
        np.nan, 2.1, 3.5999999999999996, 8.169230769230767,
    ])
    second_answer = np.array([
        np.nan, 113.21, 6292.45375, 6292.45375,
        np.nan, 5.1, 5.1, 1.35,
        np.nan, 2.1, 3.3499999999999996, 6.8448979591836725,
    ])
    assert_close(df["sales_float_ewma_roll2_lag1"].values, first_answer)
    assert_close(df["sales_float_ewma_roll4_lag1"].values, second_answer)
    assert_close(df["sales_float_ewma_roll2_lag1_cross4"].values, first_answer / second_answer)


def test_calc_percent_relative_to_threshold(tiny_frame):
    # ref tests/test_feature_engineering.py:382-401
    tiny_frame.calc_percent_relative_to_threshold(windows=[2, 4])
    df = tiny_frame.to_pandas()
    first_answer = [np.nan, 1, 1, 1, np.nan, 1, 0.5, 0, np.nan, 1, 1, 1]
    second_answer = [np.nan, 1, 1, 1, np.nan, 1, 0.5, 1 / 3, np.nan, 1, 1, 1]
    assert_close(df["sales_int_perc_greater0_roll2_lag1"].values, first_answer)
    assert_close(df["sales_int_perc_greater0_roll4_lag1"].values, second_answer)


def test_differences_features(tiny_frame):
    # ref tests/test_feature_engineering.py:404-427
    tiny_frame.difference_features(features="sales_int")
    df = tiny_frame.to_pandas()
    answer = [
        np.nan, 10000 - 113, 214 - 10000, 123 - 214,
        np.nan, np.nan, np.nan, -20 - 0,
        np.nan, 4 - 2, 10 - 4, -10 - 10,
    ]
    assert_close(df["sales_int_differenced_1"].values, answer)


def test_calc_percent_change(tiny_frame):
    # ref tests/test_utilities.py:85-111
    tiny_frame.calc_percent_change()
    df = tiny_frame.to_pandas()
    answer = [
        np.nan, np.nan, (10000 - 113) / 113, (214 - 10000) / 10000,
        np.nan, np.nan, np.nan, np.nan,
        np.nan, np.nan, (4 - 2) / 2, (10 - 4) / 4,
    ]
    assert_close(df["sales_int_pct_change_lag1"].values, answer)


def test_fused_ops_single_stage(tiny_frame):
    """Engine-specific: several group-local ops queued back-to-back fuse into
    one keyed stage and still give the reference answers."""
    tiny_frame.lag_features(["sales_int"], [1])
    tiny_frame.difference_features("sales_int")
    tiny_frame.calc_percent_change()
    assert len(tiny_frame._pending) == 3  # fused, not yet executed
    df = tiny_frame.to_pandas()
    assert_close(
        df["sales_int_differenced_1"].values,
        [np.nan, 9887, -9786, -91, np.nan, np.nan, np.nan, -20, np.nan, 2, 6, -20],
    )
    assert "sales_int_lag1" in df.columns and "sales_int_pct_change_lag1" in df.columns
