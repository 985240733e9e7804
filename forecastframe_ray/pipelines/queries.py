"""Driver-contract query implementations over the ``/root/testdata`` tables.

Each public ``q_*`` function takes ``sf_dir`` and returns a pandas DataFrame
(small results) or a Ray Dataset, matching a DuckDB oracle in
``__ray_entry__.oracle_sql`` column-for-column. The pipelines exercise the
engine's real operators (tier cascade, keyed window stage, scalers,
broadcast joins, dedup/similarity/text stages) — not ad-hoc reimplementations.

Float policy: any column whose value is produced by order-sensitive float
arithmetic (sums, means) is ``round(…, k)`` on BOTH sides so the driver's
value-hash compares stable digits; NULL-able float columns are filled with
the ``NULLF`` sentinel on both sides (pandas NaN and SQL NULL hash
differently).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data

from forecastframe_ray.stages.agg import hash_aggregate, hash_count

from forecastframe_ray.frame import RayForecastFrame
from forecastframe_ray.functions import encoding, metrics, scalers
from forecastframe_ray.pipelines import dedup, rollup, similarity, textstats
from forecastframe_ray.stages import gorilla
from forecastframe_ray.stages.join import broadcast_semi_join

NULLF = -999.0
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000

# modest parallelism for sf0.01-scale driver checks; bench overrides
_NP = 8


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round(df: pd.DataFrame, cols: list[str], digits: int = 6) -> pd.DataFrame:
    df = df.copy()  # callers may pass a column-slice view
    for c in cols:
        # + 0.0 folds −0.0 (a mathematically-zero value computed as ~−1e−13
        # then rounded) onto +0.0 — the two compare equal but HASH apart,
        # and which side of zero the float error lands on is batch-shape
        # dependent (BLAS blocking), i.e. flaky
        df[c] = np.round(df[c].to_numpy(dtype=np.float64), digits) + 0.0
    return df


def _fill(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].fillna(NULLF)
    return df


# ---------------------------------------------------------------------------
# tier rollups over events (the flagship operator on driver tables)
# ---------------------------------------------------------------------------


def _tier_output(tier_ds, tier: str) -> pd.DataFrame:
    df = tier_ds.to_pandas()
    df = df[["event_type", "bucket_us", "pages", "sum_val", "min_val", "max_val",
             "mean_val", "std_val"]].copy()
    df = _round(df, ["sum_val", "min_val", "max_val", "mean_val"], 6)
    df["std_val"] = np.round(df["std_val"].to_numpy(dtype=np.float64), 6)
    df = _fill(df, ["std_val"])  # single-point buckets: NaN ↔ SQL NULL
    return df.reset_index(drop=True)


def _event_tiers(sf_dir: str, tiers=("1h", "1d", "7d")) -> dict:
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    return rollup.rollup_tiers(ev, ["event_type"], "ts", value_col="value",
                               size_col=None, num_salts=8, tiers=tiers)


def q_tier_1h_events(sf_dir: str) -> pd.DataFrame:
    return _tier_output(_event_tiers(sf_dir, ("1h",))["1h"], "1h")


def q_tier_1d_events(sf_dir: str) -> pd.DataFrame:
    """1d tier produced by CASCADE from 1h (exactness of the algebraic
    (count,sum,min,max,Σx²) carry is what the oracle checks)."""
    return _tier_output(_event_tiers(sf_dir, ("1d",))["1d"], "1d")


def q_tier_7d_events(sf_dir: str) -> pd.DataFrame:
    return _tier_output(_event_tiers(sf_dir, ("7d",))["7d"], "7d")


def q_tier_incremental_1d_events(sf_dir: str) -> pd.DataFrame:
    """Continuous-aggregate maintenance (north_rule retention tiers,
    incremental form): build the 1d tier from the even-epoch-day half of
    events into a checkpoint store, fold the odd-day half in as a delta via
    the partition-granular algebraic merge
    (``checkpoint.merge_partitioned``), re-apply the same delta (must
    no-op: delta_id idempotence), and read the store back. The oracle is
    the FULL-build 1d tier SQL — incremental == rebuild, exactly."""
    import shutil
    import tempfile

    from forecastframe_ray.state import checkpoint

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def half(b: pd.DataFrame, keep_even: bool) -> pd.DataFrame:
        day = b["ts"].astype("int64") // DAY_US
        return b[(day % 2 == 0) == keep_even]

    def tier_1d(ds):
        return rollup.rollup_tiers(ds, ["event_type"], "ts",
                                   value_col="value", size_col=None,
                                   num_salts=8, tiers=("1d",))["1d"]

    out = tempfile.mkdtemp(prefix="ffray_inc1d_")
    try:
        base = ev.map_batches(lambda b: half(b, True), batch_format="pandas")
        checkpoint.write_partitioned(
            tier_1d(base), out, "1d", ["event_type"], num_partitions=4,
            sort_cols=["event_type", "bucket_us"])
        delta = tier_1d(ev.map_batches(lambda b: half(b, False),
                                       batch_format="pandas")).materialize()
        for _ in range(2):  # second application must be a no-op
            checkpoint.merge_partitioned(
                delta, out, "1d", ["event_type"],
                ["event_type", "bucket_us"], rollup.TIER_PLAN,
                delta_id="odd-days", num_partitions=4,
                sort_cols=["event_type", "bucket_us"],
                finalize_fn=lambda d: rollup.finalize_tier_batch(d, "1d"))
        return _tier_output(checkpoint.read_tier(out, "1d"), "1d")
    finally:
        shutil.rmtree(out, ignore_errors=True)


#: retention cutoff for the expiry query: 2024-01-16T00:00Z (mid-range of
#: the testdata's 30-day events window), in epoch microseconds
_RETENTION_CUTOFF_US = 1_705_363_200_000_000


def q_tier_retention_1h_events(sf_dir: str) -> pd.DataFrame:
    """Retention expiry (north_rule retention tiers): checkpoint the 1h
    tier, sweep buckets older than the cutoff with
    ``checkpoint.expire_tier`` (then sweep again — must be metadata-only),
    and read the store back. Oracle = the full-build 1h tier restricted to
    ``bucket_us >= cutoff``."""
    import shutil
    import tempfile

    from forecastframe_ray.state import checkpoint

    out = tempfile.mkdtemp(prefix="ffray_ret1h_")
    try:
        checkpoint.write_partitioned(
            _event_tiers(sf_dir, ("1h",))["1h"], out, "1h", ["event_type"],
            num_partitions=4, sort_cols=["event_type", "bucket_us"])
        checkpoint.expire_tier(out, "1h", _RETENTION_CUTOFF_US)
        again = checkpoint.expire_tier(out, "1h", _RETENTION_CUTOFF_US)
        assert again == [], "repeat sweep must be metadata-only"
        return _tier_output(checkpoint.read_tier(out, "1h"), "1h")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _tier_sql(width_us: int) -> str:
    return f"""
    SELECT event_type,
           (epoch_us(ts) // {width_us}) * {width_us} AS bucket_us,
           CAST(count(*) AS DOUBLE) AS pages,
           round(sum(value), 6) AS sum_val,
           round(min(value), 6) AS min_val,
           round(max(value), 6) AS max_val,
           round(avg(value), 6) AS mean_val,
           COALESCE(round(stddev_samp(value), 6), {NULLF}) AS std_val
    FROM events GROUP BY 1, 2
    """


TIER_SQL = {t: _tier_sql(w) for t, w in
            (("1h", HOUR_US), ("1d", DAY_US), ("7d", 7 * DAY_US))}


# ---------------------------------------------------------------------------
# bucketed series + keyed window ops (daily / hourly event series)
# ---------------------------------------------------------------------------


def _bucket_series(sf_dir: str, width_us: int, ts_name: str):
    """events → (event_type, ts_name, v=round(sum(value),6)) series Dataset."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def floor_fn(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        b = b[["event_type", "value"]].copy()
        b[ts_name] = pd.to_datetime((us // width_us) * width_us, unit="us")
        return b

    agg = hash_aggregate(ev.map_batches(floor_fn, batch_format="pandas"),
                         ["event_type", ts_name], {"v": ("value", "sum")},
                         num_partitions=_NP)

    def round_fn(b: pd.DataFrame) -> pd.DataFrame:
        b["v"] = np.round(b["v"].to_numpy(dtype=np.float64), 6)
        return b

    return agg.map_batches(round_fn, batch_format="pandas")


_DAILY_SQL = """
    SELECT event_type, date_trunc('day', ts) AS d, round(sum(value), 6) AS v
    FROM events GROUP BY 1, 2
"""
_HOURLY_SQL = """
    SELECT event_type, date_trunc('hour', ts) AS h, round(sum(value), 6) AS v
    FROM events GROUP BY 1, 2
"""


def _daily_frame(sf_dir: str) -> RayForecastFrame:
    daily = _bucket_series(sf_dir, DAY_US, "d")
    return RayForecastFrame(daily, datetime_column="d", target="v",
                            hierarchy=["event_type"], num_partitions=_NP)


def q_lag_daily_events(sf_dir: str) -> pd.DataFrame:
    fr = _daily_frame(sf_dir).lag_features("v", [1, 2])
    df = fr.to_pandas()[["event_type", "d", "v", "v_lag1", "v_lag2"]]
    return _fill(df, ["v_lag1", "v_lag2"])


SQL_LAG_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           COALESCE(LAG(v, 1) OVER w, {NULLF}) AS v_lag1,
           COALESCE(LAG(v, 2) OVER w, {NULLF}) AS v_lag2
    FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
"""


def q_diff_daily_events(sf_dir: str) -> pd.DataFrame:
    fr = _daily_frame(sf_dir).difference_features("v", periods=1)
    df = fr.to_pandas()[["event_type", "d", "v", "v_differenced_1"]]
    return _fill(df, ["v_differenced_1"])


SQL_DIFF_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           COALESCE(v - LAG(v, 1) OVER w, {NULLF}) AS v_differenced_1
    FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
"""


def q_pct_change_daily_events(sf_dir: str) -> pd.DataFrame:
    fr = _daily_frame(sf_dir).calc_percent_change("v", lag=1)
    df = fr.to_pandas()[["event_type", "d", "v", "v_pct_change_lag1"]]
    df = _round(df, ["v_pct_change_lag1"], 6)
    return _fill(df, ["v_pct_change_lag1"])


SQL_PCT_CHANGE_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           COALESCE(round((LAG(v, 1) OVER w - LAG(v, 2) OVER w)
                          / LAG(v, 2) OVER w, 6), {NULLF}) AS v_pct_change_lag1
    FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
"""


_ROLL_COLS = [f"v_{a}_roll7_lag1" for a in ("mean", "sum", "min", "max")]


def q_rolling7_daily_events(sf_dir: str) -> pd.DataFrame:
    fr = _daily_frame(sf_dir).calc_statistical_features(
        "v", windows=7, aggregations=["mean", "sum", "min", "max"],
        lag=1, min_periods=1)
    df = fr.to_pandas()[["event_type", "d", "v"] + _ROLL_COLS]
    df = _round(df, _ROLL_COLS, 6)
    return _fill(df, _ROLL_COLS)


SQL_ROLLING7_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               epoch_us(d) // {DAY_US} AS dn,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    )
    SELECT event_type, d, v,
           COALESCE(round(avg(lv) OVER w, 6), {NULLF}) AS v_mean_roll7_lag1,
           COALESCE(round(sum(lv) OVER w, 6), {NULLF}) AS v_sum_roll7_lag1,
           COALESCE(round(min(lv) OVER w, 6), {NULLF}) AS v_min_roll7_lag1,
           COALESCE(round(max(lv) OVER w, 6), {NULLF}) AS v_max_roll7_lag1
    FROM l WINDOW w AS (PARTITION BY event_type ORDER BY dn
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


_MEDSTD_COLS = ["v_median_roll7_lag1", "v_std_roll7_lag1"]


def q_rolling_median_daily(sf_dir: str) -> pd.DataFrame:
    """W1 NON-algebraic rolling aggs (median + ddof=1 std) — the aggs the
    tier cascade refuses to compose, computed from the finest grain."""
    fr = _daily_frame(sf_dir).calc_statistical_features(
        "v", windows=7, aggregations=["median", "std"], lag=1, min_periods=1)
    df = fr.to_pandas()[["event_type", "d", "v"] + _MEDSTD_COLS]
    df = _round(df, _MEDSTD_COLS, 6)
    return _fill(df, _MEDSTD_COLS)


SQL_ROLLING_MEDIAN_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v, epoch_us(d) // {DAY_US} AS dn,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    )
    SELECT event_type, d, v,
           COALESCE(round(median(lv) OVER w, 6), {NULLF})
               AS v_median_roll7_lag1,
           COALESCE(round(stddev_samp(lv) OVER w, 6), {NULLF})
               AS v_std_roll7_lag1
    FROM l WINDOW w AS (PARTITION BY event_type ORDER BY dn
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_threshold_daily_events(sf_dir: str) -> pd.DataFrame:
    fr = _daily_frame(sf_dir).calc_percent_relative_to_threshold(
        features="v", windows=7, lag=1, min_periods=1,
        threshold=100, operator="greater")
    col = "v_perc_greater100_roll7_lag1"
    df = fr.to_pandas()[["event_type", "d", "v", col]]
    df = _round(df, [col], 6)
    return _fill(df, [col])


SQL_THRESHOLD_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v, epoch_us(d) // {DAY_US} AS dn,
               LAG(CASE WHEN v > 100 THEN 1.0 ELSE 0.0 END, 1)
                   OVER (PARTITION BY event_type ORDER BY d) AS lf
        FROM daily
    )
    SELECT event_type, d, v,
           COALESCE(round(avg(lf) OVER w, 6), {NULLF}) AS v_perc_greater100_roll7_lag1
    FROM l WINDOW w AS (PARTITION BY event_type ORDER BY dn
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_days_since_release_events(sf_dir: str) -> pd.DataFrame:
    fr = _daily_frame(sf_dir).calc_days_since_release(ignore_leading_zeroes=True)
    df = fr.to_pandas()[["event_type", "d", "days_since_release"]]
    df["days_since_release"] = df["days_since_release"].astype("int64")
    return df


SQL_DAYS_SINCE = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d,
           CAST(datediff('day',
               min(CASE WHEN v > 0 THEN d END) OVER (PARTITION BY event_type),
               d) AS BIGINT) AS days_since_release
    FROM daily
"""


def q_gapfill_ffill_hourly_events(sf_dir: str) -> pd.DataFrame:
    """W8 gap-fill to each type's own [min,max] hourly grid + W9 ffill."""
    hourly = _bucket_series(sf_dir, HOUR_US, "h")
    fr = RayForecastFrame(hourly, datetime_column="h", target="v",
                          hierarchy=["event_type"], num_partitions=_NP)
    fr.fill_time_gaps(freq="h", mode="local").fill_missings(method="ffill", features=["v"])
    df = fr.to_pandas()[["event_type", "h", "v"]]
    return _fill(df, ["v"])


SQL_GAPFILL_FFILL_HOURLY = f"""
    WITH hourly AS ({_HOURLY_SQL}),
    bounds AS (SELECT event_type, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1),
    grid AS (
        SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    )
    SELECT g.event_type, g.h,
           COALESCE(LAST_VALUE(hr.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), {NULLF}) AS v
    FROM grid g LEFT JOIN hourly hr USING (event_type, h)
"""


def q_ewma_daily_events(sf_dir: str) -> pd.DataFrame:
    """W4 EWMA + crossovers — not SQL-expressible (row-sequential state);
    rows-only driver check, exact values pinned by the ported golden tests."""
    fr = _daily_frame(sf_dir).calc_ewma("v", windows=[3, 7], lag=1,
                                        crossovers=True, adjust=True)
    cols = ["event_type", "d", "v", "v_ewma_roll3_lag1", "v_ewma_roll7_lag1",
            "v_ewma_roll3_lag1_cross7"]
    df = fr.to_pandas()[cols]
    return _fill(_round(df, cols[3:], 6), cols[3:])


def q_calendar_daily_events(sf_dir: str) -> pd.DataFrame:
    daily = _bucket_series(sf_dir, DAY_US, "d")
    fr = RayForecastFrame(daily, datetime_column="d", target="v",
                          hierarchy=["event_type"], num_partitions=_NP)
    fr.calc_datetime_features(["day", "day_of_week", "weekend_flag", "week",
                               "month", "year", "quarter", "month_year",
                               "quarter_year"])
    df = fr.to_pandas()
    intcols = ["day", "day_of_week", "week", "month", "year", "quarter"]
    for c in intcols:
        df[c] = df[c].astype("int64")
    return df[["event_type", "d"] + intcols + ["weekend_flag", "month_year",
                                               "quarter_year"]]


SQL_CALENDAR_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d,
           CAST(EXTRACT(day FROM d) AS BIGINT) AS day,
           CAST(isodow(d) - 1 AS BIGINT) AS day_of_week,
           CAST(CAST(strftime(d, '%U') AS INTEGER) + 1 AS BIGINT) AS week,
           CAST(EXTRACT(month FROM d) AS BIGINT) AS month,
           CAST(EXTRACT(year FROM d) % 100 AS BIGINT) AS year,
           CAST(EXTRACT(quarter FROM d) AS BIGINT) AS quarter,
           isodow(d) - 1 >= 5 AS weekend_flag,
           strftime(d, '%y') || 'M' || strftime(d, '%m') AS month_year,
           strftime(d, '%y') || 'Q' || CAST(EXTRACT(quarter FROM d) AS VARCHAR)
               AS quarter_year
    FROM daily
"""


# ---------------------------------------------------------------------------
# aggregation / scalers / encoding / joins / sort over TPC-H-ish tables
# ---------------------------------------------------------------------------


def q_rollup_q1_lineitem(sf_dir: str) -> pd.DataFrame:
    """A1 hierarchy rollup in TPC-H q1 shape: salted-combiner groupby."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def disc(b: pd.DataFrame) -> pd.DataFrame:
        b["l_disc_price"] = b["l_extendedprice"] * (1.0 - b["l_discount"])
        return b

    li = li.map_batches(disc, batch_format="pandas")
    agg = hash_aggregate(li, ["l_returnflag", "l_linestatus"], {
        "sum_qty": ("l_quantity", "sum"),
        "sum_base_price": ("l_extendedprice", "sum"),
        "sum_disc_price": ("l_disc_price", "sum"),
        "count_order": ("l_quantity", "size"),
    }, num_partitions=_NP)
    df = agg.to_pandas()
    df["avg_qty"] = np.round(df["sum_qty"] / df["count_order"], 6)
    df = _round(df, ["sum_qty"], 4)
    df = _round(df, ["sum_base_price", "sum_disc_price"], 2)
    df["count_order"] = df["count_order"].astype("int64")
    return df[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "avg_qty", "count_order"]]


SQL_ROLLUP_Q1 = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_quantity) / count(*), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem GROUP BY 1, 2
"""


def q_standardize_lineitem(sf_dir: str) -> pd.DataFrame:
    """M3 two-phase standardize (ddof=1), applied distributed."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    li = li.materialize()
    params = scalers.fit_standardize(li, ["l_quantity"])
    out = li.map_batches(lambda b: scalers.apply_standardize(b, params),
                         batch_format="pandas").to_pandas()
    out = out.rename(columns={"l_quantity": "q_std"})
    return _round(out, ["q_std"], 6)


SQL_STANDARDIZE_LINEITEM = """
    SELECT l_orderkey, l_linenumber,
           round((l_quantity - avg(l_quantity) OVER ())
                 / stddev_samp(l_quantity) OVER (), 6) AS q_std
    FROM lineitem
"""


def q_normalize_events(sf_dir: str) -> pd.DataFrame:
    ev = _read(sf_dir, "events", ["event_id", "value"]).materialize()
    params = scalers.fit_normalize(ev, ["value"])
    out = ev.map_batches(lambda b: scalers.apply_normalize(b, params),
                         batch_format="pandas").to_pandas()
    out = out.rename(columns={"value": "v_norm"})
    return _round(out, ["v_norm"], 6)


SQL_NORMALIZE_EVENTS = """
    SELECT event_id,
           round((value - min(value) OVER ())
                 / (max(value) OVER () - min(value) OVER ()), 6) AS v_norm
    FROM events
"""


def q_log1p_lineitem(sf_dir: str) -> pd.DataFrame:
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    out = li.map_batches(lambda b: scalers.apply_log1p(b, ["l_quantity"]),
                         batch_format="pandas").to_pandas()
    out = out.rename(columns={"l_quantity": "q_log"})
    return _round(out, ["q_log"], 9)


SQL_LOG1P_LINEITEM = """
    SELECT l_orderkey, l_linenumber, round(ln(1.0 + l_quantity), 9) AS q_log
    FROM lineitem
"""


def q_correct_negatives_events(sf_dir: str) -> pd.DataFrame:
    """M1 clamp, on a centered copy so negatives actually occur."""
    from forecastframe_ray.functions import scalar

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def center(b: pd.DataFrame) -> pd.DataFrame:
        b["v_clamped"] = b["value"] - 100.0
        return b[["event_id", "v_clamped"]]

    out = ev.map_batches(center, batch_format="pandas").map_batches(
        lambda b: scalar.correct_negatives_batch(b, ["v_clamped"], 0),
        batch_format="pandas").to_pandas()
    return _round(out, ["v_clamped"], 6)


SQL_CORRECT_NEGATIVES = """
    SELECT event_id,
           round(CASE WHEN value - 100.0 < 0 THEN 0 ELSE value - 100.0 END, 6)
               AS v_clamped
    FROM events
"""


def q_encode_priority_orders(sf_dir: str) -> pd.DataFrame:
    """M6 globally-consistent ordinal encoding (code = rank in sorted
    distinct values)."""
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    keys = encoding.fit_categories(od, ["o_orderpriority"])
    out = od.map_batches(encoding.encode_batch_fn(keys),
                         batch_format="pandas").to_pandas()
    out = out.rename(columns={"o_orderpriority": "priority_code"})
    out["priority_code"] = out["priority_code"].astype("int64")
    return out


SQL_ENCODE_PRIORITY = """
    SELECT o_orderkey,
           CAST(DENSE_RANK() OVER (ORDER BY o_orderpriority) - 1 AS BIGINT)
               AS priority_code
    FROM orders
"""


def q_join_orders_customer(sf_dir: str) -> pd.DataFrame:
    """J2 broadcast small-side join + rollup: per-nation order totals."""
    od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    from forecastframe_ray.stages.join import broadcast_left_join
    joined = broadcast_left_join(
        od, cust.rename(columns={"c_custkey": "o_custkey"}), on=["o_custkey"])
    agg = hash_aggregate(joined, ["c_nationkey"], {
        "total_price": ("o_totalprice", "sum"),
        "n_orders": ("o_totalprice", "size"),
    }, num_partitions=_NP).to_pandas()
    agg["c_nationkey"] = agg["c_nationkey"].astype("int64")
    agg["n_orders"] = agg["n_orders"].astype("int64")
    return _round(agg, ["total_price"], 2)[["c_nationkey", "total_price", "n_orders"]]


SQL_JOIN_ORDERS_CUSTOMER = """
    SELECT c_nationkey, round(sum(o_totalprice), 2) AS total_price,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
"""


def q_semi_join_orders(sf_dir: str) -> pd.DataFrame:
    """J6 broadcast semi-join: orders from high-balance customers, counted
    per status."""
    od = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_acctbal"]).to_pandas()
    keys = cust[cust["c_acctbal"] > 5000][["c_custkey"]] \
        .rename(columns={"c_custkey": "o_custkey"})
    kept = broadcast_semi_join(od, keys, on=["o_custkey"])
    out = hash_count(kept, ["o_orderstatus"], num_partitions=4).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out[["o_orderstatus", "n"]]


SQL_SEMI_JOIN_ORDERS = """
    SELECT o_orderstatus, count(*) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    GROUP BY 1
"""


def q_topk_orders(sf_dir: str) -> pd.DataFrame:
    """O4 top-k: distributed sort (range shuffle) + limit."""
    od = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = od.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return top.to_pandas()


SQL_TOPK_ORDERS = """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_distinct_event_types(sf_dir: str) -> pd.DataFrame:
    """A5/O5: distinct + counts."""
    ev = _read(sf_dir, "events", ["event_type"])
    out = hash_count(ev, ["event_type"], num_partitions=4).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "n"]]


SQL_DISTINCT_EVENT_TYPES = "SELECT event_type, count(*) AS n FROM events GROUP BY 1"


def q_error_metrics_naive(sf_dir: str) -> pd.DataFrame:
    """A6 error metrics of the naive lag-1 daily forecast (partial+final
    distributed aggregation, never materializing the error table)."""
    fr = _daily_frame(sf_dir).lag_features("v", [1])
    preds = fr.dataset.map_batches(
        lambda b: b[b["v_lag1"].notna()], batch_format="pandas")
    out = metrics.error_summary(preds, "v", "v_lag1")
    out = out[["n", "MAPE", "MAPA", "MSE", "RMSE"]].copy()
    out["n"] = out["n"].astype("int64")
    out = _round(out, ["MAPE", "MAPA"], 6)
    out = _round(out, ["MSE"], 2)
    return _round(out, ["RMSE"], 4)


SQL_ERROR_METRICS_NAIVE = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    )
    SELECT count(*) AS n,
           round(avg(abs((v - lv) / v)), 6) AS MAPE,
           round(1.0 - avg(abs((v - lv) / v)), 6) AS MAPA,
           round(avg((v - lv) * (v - lv)), 2) AS MSE,
           round(sqrt(avg((v - lv) * (v - lv))), 4) AS RMSE
    FROM l WHERE lv IS NOT NULL
"""


def q_error_metrics_by_type(sf_dir: str) -> pd.DataFrame:
    """A6 grouped error metrics (reference per-group scoring,
    ``interpret.py:104-115`` with ``groupers``): the same naive lag-1
    forecast scored per event_type through ``error_summary(group_cols=…)``
    — partial errors in map_batches, then one small keyed shuffle."""
    fr = _daily_frame(sf_dir).lag_features("v", [1])
    preds = fr.dataset.map_batches(
        lambda b: b[b["v_lag1"].notna()], batch_format="pandas")
    out = metrics.error_summary(preds, "v", "v_lag1",
                                group_cols=["event_type"])
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out[["event_type", "n", "MAPE", "MAPA", "MSE", "RMSE"]].copy()
    out["n"] = out["n"].astype("int64")
    out = _round(out, ["MAPE", "MAPA"], 6)
    out = _round(out, ["MSE"], 2)
    return _round(out, ["RMSE"], 4)


def q_sample_orders(sf_dir: str) -> pd.DataFrame:
    """O7 sampling, production form: deterministic md5-bucket sample
    (expected 12.5%) — reproducible across any cluster shape / resume,
    unlike ``Dataset.random_sample`` (dev-only, per-block RNG)."""
    from forecastframe_ray.stages.sample import deterministic_sample

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = deterministic_sample(orders, "o_orderkey", rate=0.125).to_pandas()
    return out[["o_orderkey", "o_totalprice"]].astype({"o_orderkey": "int64"})


SQL_SAMPLE_ORDERS = """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) < CAST(floor(0.125 * 4294967296) AS BIGINT)
"""


SQL_ERROR_METRICS_BY_TYPE = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    )
    SELECT event_type, count(*) AS n,
           round(avg(abs((v - lv) / v)), 6) AS MAPE,
           round(1.0 - avg(abs((v - lv) / v)), 6) AS MAPA,
           round(avg((v - lv) * (v - lv)), 2) AS MSE,
           round(sqrt(avg((v - lv) * (v - lv))), 4) AS RMSE
    FROM l WHERE lv IS NOT NULL
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# dedup / text analysis / similarity over documents + embeddings
# ---------------------------------------------------------------------------


def q_exact_dedup_documents(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: surviving doc_ids (min id per distinct text)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup.exact_dedup(docs).to_pandas()
    return out[["doc_id"]]


SQL_EXACT_DEDUP_DOCS = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def q_dup_counts_documents(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup.duplicate_counts(docs).to_pandas()
    out["n_copies"] = out["n_copies"].astype("int64")
    return out[["__digest", "n_copies"]]


SQL_DUP_COUNTS_DOCS = """
    SELECT md5(text) AS __digest, count(*) AS n_copies
    FROM documents GROUP BY 1
"""


def q_token_counts_documents(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(textstats.token_counts_batch,
                           batch_format="pyarrow").to_pandas()
    return out[["doc_id", "n_chars_text", "n_tokens_ws"]]


SQL_TOKEN_COUNTS_DOCS = r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_text,
           CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens_ws
    FROM documents
"""


def q_text_analysis_documents(sf_dir: str) -> pd.DataFrame:
    """Lang-ID + quality + fingerprint (heuristic stages — rows-only check)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = textstats.analyze_documents(docs).to_pandas()
    cols = ["alpha_ratio", "punct_ratio", "stopword_frac", "quality_score"]
    out = _round(out, cols, 6)
    out["doc_fingerprint"] = out["doc_fingerprint"].astype("uint64")
    return out[["doc_id", "lang_pred"] + cols + ["doc_fingerprint"]]


def q_minhash_pairs_documents(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dup candidate pairs, n-gram-Jaccard-verified
    (rows-only: the banding itself is not SQL-expressible)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).to_pandas()
    return _round(pairs[["id_a", "id_b", "jaccard"]], ["jaccard"], 6)


def q_simhash_pairs_documents(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=3).to_pandas()
    pairs["hamming"] = pairs["hamming"].astype("int64")
    return pairs[["id_a", "id_b", "hamming"]]


def q_embedding_near_dup(sf_dir: str) -> pd.DataFrame:
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    from forecastframe_ray.stages.agg import ensure_columns

    pairs = ensure_columns(
        dedup.embedding_near_dup_pairs(emb, threshold=0.3,
                                       num_planes=4).to_pandas(),
        {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"})
    return _round(pairs[["id_a", "id_b", "cos_sim"]], ["cos_sim"], 6)


def _query_vectors(sf_dir: str, ids=(0, 1)) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    df = t.to_pandas().set_index("vec_id")
    return np.stack([np.asarray(df.loc[i, "embedding"], dtype=np.float64)
                     for i in ids])


def q_ann_bruteforce_embeddings(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-10 for query vectors vec_id 0 and 1 (ids-only output
    so the oracle compares integer ranks, not float paths)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    top = similarity.brute_force_topk(emb, _query_vectors(sf_dir), k=10)
    top["query_ix"] = top["query_ix"].astype("int64")
    return top[["query_ix", "rank", "vec_id"]]


SQL_ANN_BRUTEFORCE = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id IN (0, 1)),
    s AS (SELECT qid, e.vec_id,
                 list_cosine_similarity(e.embedding, qv) AS sim
          FROM embeddings e CROSS JOIN q),
    r AS (SELECT qid, vec_id, row_number() OVER (
              PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn FROM s)
    SELECT CAST(qid AS BIGINT) AS query_ix, CAST(rn - 1 AS BIGINT) AS rank,
           vec_id
    FROM r WHERE rn <= 10
"""


def q_ann_ivf_embeddings(sf_dir: str) -> pd.DataFrame:
    """IVF approximate top-10 (rows-only: approximate by construction)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    top = similarity.ivf_topk(emb, _query_vectors(sf_dir), k=10,
                              num_centroids=16, nprobe=4)
    top["query_ix"] = top["query_ix"].astype("int64")
    return top[["query_ix", "rank", "vec_id"]]


def q_gorilla_roundtrip_events(sf_dir: str) -> pd.DataFrame:
    """Gorilla XOR + delta-of-delta codec over the daily series, decoded back
    and re-aggregated — proves bit-exact roundtrip distributed (rows-only)."""
    daily = _bucket_series(sf_dir, DAY_US, "d")

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket_us"] = b["d"].astype("datetime64[us]").astype("int64")
        return b[["event_type", "bucket_us", "v"]]

    series = daily.map_batches(to_us, batch_format="pandas")
    chunks = gorilla.encode_series_dataset(series, ["event_type"], "bucket_us",
                                           "v", tier="1d", num_partitions=4)
    decoded = gorilla.decode_chunk_dataset(chunks, ["event_type"],
                                           ts_col="bucket_us", value_col="v")
    out = hash_aggregate(decoded, ["event_type"], {
        "n_points": ("v", "size"), "sum_v": ("v", "sum"),
    }, num_partitions=4).to_pandas()
    out["n_points"] = out["n_points"].astype("int64")
    return _round(out, ["sum_v"], 6)[["event_type", "n_points", "sum_v"]]


SQL_GORILLA_ROUNDTRIP = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, count(*) AS n_points, round(sum(v), 6) AS sum_v
    FROM daily GROUP BY 1
"""


def q_multimodal_decode(sf_dir: str) -> pd.DataFrame:
    """Actor-pool media decode plumbing over a media table derived from the
    documents corpus (payload = UTF-8 text bytes). Metadata columns are
    SQL-checkable; the stubbed decode features are verified in-query against
    a direct recomputation on a sample (blake2b is not SQL-expressible)."""
    from forecastframe_ray.pipelines import multimodal

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    mds = multimodal.media_from_documents(docs)
    out = multimodal.decode_features(mds, concurrency=(1, 4), batch_size=64)
    df = out.to_pandas()

    # value check of the actor-pool decode path against the direct function
    stage = multimodal.DecodeStage(real=False, feat_dim=16)
    sample = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).to_pandas().head(10)
    feats = {int(m): f for m, f in zip(df["media_id"], df["features"])}
    for _, row in sample.iterrows():
        expect = stage._fake_decode((row["text"] or "").encode("utf-8"))
        got = np.asarray(feats[int(row["doc_id"])], dtype=np.float64)
        assert np.array_equal(expect, got), ("decode mismatch", row["doc_id"])

    df["payload_bytes"] = df["payload_bytes"].astype("int64")
    return df[["media_id", "kind", "payload_bytes"]]


SQL_MULTIMODAL_DECODE = """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(strlen(text) AS BIGINT) AS payload_bytes
    FROM documents
"""


def q_rollup_grouper_stats_events(sf_dir: str) -> pd.DataFrame:
    """W1 with ``groupers`` (A1 aggregate → window at rollup grain → J1
    broadcast join back): base grain (event_type, seg, day), rolling mean
    computed at the event_type level and joined to every seg row."""
    ev = _read(sf_dir, "events", ["event_type", "user_id", "ts", "value"])

    def floor_fn(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        out = pd.DataFrame({
            "event_type": b["event_type"],
            "seg": (b["user_id"] % 4).astype("int64"),
            "d": pd.to_datetime((us // DAY_US) * DAY_US, unit="us"),
            "value": b["value"],
        })
        return out

    base = hash_aggregate(ev.map_batches(floor_fn, batch_format="pandas"),
                          ["event_type", "seg", "d"], {"v": ("value", "sum")},
                          num_partitions=_NP)

    def round_fn(b: pd.DataFrame) -> pd.DataFrame:
        b["v"] = np.round(b["v"].to_numpy(dtype=np.float64), 6)
        return b

    base = base.map_batches(round_fn, batch_format="pandas")
    fr = RayForecastFrame(base, datetime_column="d", target="v",
                          hierarchy=["event_type", "seg"], num_partitions=_NP)
    fr.calc_statistical_features(
        "v", windows=7, aggregations=["mean"], lag=1, min_periods=1,
        groupers={"name": "total", "columns": ["event_type"], "operation": "sum"})
    col = "v_mean_total_roll7_lag1"
    df = fr.to_pandas()[["event_type", "seg", "d", "v", col]]
    df = _round(df, [col], 6)
    return _fill(df, [col])


SQL_ROLLUP_GROUPER_STATS = f"""
    WITH base AS (
        SELECT event_type, user_id % 4 AS seg, date_trunc('day', ts) AS d,
               round(sum(value), 6) AS v
        FROM events GROUP BY 1, 2, 3
    ),
    lvl AS (SELECT event_type, d, sum(v) AS vt FROM base GROUP BY 1, 2),
    l2 AS (
        SELECT event_type, d, epoch_us(d) // {DAY_US} AS dn,
               LAG(vt) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM lvl
    ),
    r AS (
        SELECT event_type, d,
               COALESCE(round(avg(lv) OVER (PARTITION BY event_type ORDER BY dn
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6), {NULLF})
                   AS v_mean_total_roll7_lag1
        FROM l2
    )
    SELECT b.event_type, b.seg, b.d, b.v, r.v_mean_total_roll7_lag1
    FROM base b JOIN r USING (event_type, d)
"""


def q_interpolate_hourly_events(sf_dir: str) -> pd.DataFrame:
    """W8 gap-fill + W9 LINEAR-in-time interpolation (north_rule addition;
    interior gaps only, edges stay null → sentinel)."""
    hourly = _bucket_series(sf_dir, HOUR_US, "h")
    fr = RayForecastFrame(hourly, datetime_column="h", target="v",
                          hierarchy=["event_type"], num_partitions=_NP)
    fr.fill_time_gaps(freq="h", mode="local")
    fr.fill_missings(method="interpolate", features=["v"])
    df = fr.to_pandas()[["event_type", "h", "v"]]
    df = _round(df, ["v"], 6)
    return _fill(df, ["v"])


SQL_INTERPOLATE_HOURLY = f"""
    WITH hourly AS ({_HOURLY_SQL}),
    bounds AS (SELECT event_type, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1),
    grid AS (
        SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    j AS (SELECT g.event_type, g.h, hr.v
          FROM grid g LEFT JOIN hourly hr USING (event_type, h)),
    w AS (
        SELECT event_type, h, v,
               LAST_VALUE(v IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               FIRST_VALUE(v IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM j
    )
    SELECT event_type, h,
           round(CASE
               WHEN v IS NOT NULL THEN v
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   pv + (nv - pv) * (epoch_us(h) - epoch_us(pt))
                        / (epoch_us(nt) - epoch_us(pt))
               ELSE {NULLF}
           END, 6) AS v
    FROM w
"""


_MOM_COLS = ["v_mean_roll7_lag1", "v_sum_roll7_lag1",
             "v_mean_roll7_lag1_momentum", "v_sum_roll7_lag1_perc"]


def q_momentum_daily_events(sf_dir: str) -> pd.DataFrame:
    """W1 momentums + percentages: shift(lag) over rolling mean / rolling
    sum (feature_engineering.py:400-422, grouped-shift form)."""
    fr = _daily_frame(sf_dir).calc_statistical_features(
        "v", windows=7, aggregations=["mean", "sum"], lag=1, min_periods=1,
        momentums=True, percentages=True)
    df = fr.to_pandas()[["event_type", "d", "v"] + _MOM_COLS]
    df = _round(df, _MOM_COLS, 6)
    return _fill(df, _MOM_COLS)


SQL_MOMENTUM_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v, epoch_us(d) // {DAY_US} AS dn,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    ),
    r AS (
        SELECT event_type, d, v, lv,
               avg(lv) OVER w AS m7, sum(lv) OVER w AS s7
        FROM l WINDOW w AS (PARTITION BY event_type ORDER BY dn
                            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, v,
           COALESCE(round(m7, 6), {NULLF}) AS v_mean_roll7_lag1,
           COALESCE(round(s7, 6), {NULLF}) AS v_sum_roll7_lag1,
           COALESCE(round(lv / m7, 6), {NULLF}) AS v_mean_roll7_lag1_momentum,
           COALESCE(round(lv / s7, 6), {NULLF}) AS v_sum_roll7_lag1_perc
    FROM r
"""


def q_minhash_clusters_documents(sf_dir: str) -> pd.DataFrame:
    """Near-dup cluster assignment: LSH pairs → driver union-find →
    (doc_id, rep_id) for every doc in a cluster (rows-only)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).to_pandas()
    rep = dedup.clusters_from_pairs(pairs)
    out = pd.DataFrame(sorted(rep.items()), columns=["doc_id", "rep_id"])
    out["doc_id"] = out["doc_id"].astype("int64")
    out["rep_id"] = out["rep_id"].astype("int64")
    return out


def q_c4_boilerplate_documents(sf_dir: str) -> pd.DataFrame:
    """C4-style line cleaning + corpus-level boilerplate-line removal
    (two-pass distributed). The oracle recomputes both passes in SQL over
    exploded lines (content counts stand in for the engine's uint64 line
    hashes — equal barring a 2^-64 collision)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    stripped = textstats.remove_boilerplate_lines(docs, max_repeats=3)
    cleaned = stripped.map_batches(
        lambda b: textstats.c4_clean_batch(b, min_words_per_line=3,
                                           require_terminal=False),
        batch_format="pandas")
    out = cleaned.to_pandas()
    cols = ["doc_id", "n_lines_kept", "n_boilerplate_removed", "n_chars_clean"]
    if out.empty or "text_clean" not in out.columns:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    out["n_chars_clean"] = out["text_clean"].str.len().astype("int64")
    return out[cols]


SQL_C4_BOILERPLATE = r"""
    WITH lns AS (
        SELECT doc_id, trim(ln, ' ' || chr(9) || chr(13) || chr(12) || chr(11)) AS s
        FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln
              FROM documents)
        WHERE trim(ln, ' ' || chr(9) || chr(13) || chr(12) || chr(11)) <> ''
    ),
    cnt AS (SELECT s, count(*) AS c FROM lns GROUP BY 1),
    j AS (SELECT l.doc_id, l.s, (c.c > 3) AS is_bp
          FROM lns l JOIN cnt c USING (s)),
    agg AS (
        SELECT doc_id,
            SUM(CASE WHEN is_bp THEN 1 ELSE 0 END) AS n_bp,
            SUM(CASE WHEN NOT is_bp
                  AND length(regexp_extract_all(s, '\S+')) >= 3
                  AND NOT contains(s, '{') AND NOT contains(s, '}')
                  AND NOT contains(lower(s), 'lorem ipsum')
                THEN 1 ELSE 0 END) AS n_kept,
            SUM(CASE WHEN NOT is_bp
                  AND length(regexp_extract_all(s, '\S+')) >= 3
                  AND NOT contains(s, '{') AND NOT contains(s, '}')
                  AND NOT contains(lower(s), 'lorem ipsum')
                THEN length(s) ELSE 0 END) AS kept_chars
        FROM j GROUP BY 1
    )
    SELECT doc_id,
           CAST(n_kept AS BIGINT) AS n_lines_kept,
           CAST(n_bp AS BIGINT) AS n_boilerplate_removed,
           CAST(kept_chars + greatest(n_kept - 1, 0) AS BIGINT) AS n_chars_clean
    FROM agg WHERE n_kept >= 1
"""


# ---------------------------------------------------------------------------
# round-2 oracle-gap queries: every implemented-but-oracle-less §2 op
# ---------------------------------------------------------------------------


def q_descale_roundtrip_lineitem(sf_dir: str) -> pd.DataFrame:
    """M5 descale roundtrip: log1p(l_quantity) + standardize(l_extendedprice)
    then ``descale_features`` — the inverse formulas must restore the
    original values (transform.py:238-364 semantics)."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                "l_shipdate"])
    fr = RayForecastFrame(li, datetime_column="l_shipdate", target="l_quantity",
                          hierarchy=None, num_partitions=_NP)
    fr.log_features(["l_quantity"]).standardize_features(["l_extendedprice"])
    fr.descale_features()
    out = fr.to_pandas()[["l_orderkey", "l_linenumber", "l_quantity",
                          "l_extendedprice"]]
    out = _round(out, ["l_quantity"], 6)
    return _round(out, ["l_extendedprice"], 4)


SQL_DESCALE_ROUNDTRIP = """
    SELECT l_orderkey, l_linenumber,
           round(l_quantity, 6) AS l_quantity,
           round(l_extendedprice, 4) AS l_extendedprice
    FROM lineitem
"""


def q_decode_priority_orders(sf_dir: str) -> pd.DataFrame:
    """M7 decode roundtrip: globally-consistent ordinal encode then decode
    via the stored code→value dictionary restores the original strings."""
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    keys = encoding.fit_categories(od, ["o_orderpriority"])
    enc = od.map_batches(encoding.encode_batch_fn(keys), batch_format="pandas")
    dec = enc.map_batches(encoding.decode_batch_fn(keys), batch_format="pandas")
    return dec.to_pandas()[["o_orderkey", "o_orderpriority"]]


SQL_DECODE_PRIORITY = "SELECT o_orderkey, o_orderpriority FROM orders"


def q_compress_lineitem(sf_dir: str) -> pd.DataFrame:
    """M10 compress: global-stat lossless integer downcast; the oracle
    verifies every value survives the narrowing."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"])
    fr = RayForecastFrame(li, datetime_column="l_shipdate", target="l_quantity",
                          hierarchy=None, num_partitions=_NP)
    fr.compress()
    out = fr.to_pandas()[["l_orderkey", "l_linenumber", "l_quantity"]]
    out["l_orderkey"] = out["l_orderkey"].astype("int64")
    out["l_linenumber"] = out["l_linenumber"].astype("int64")
    return _round(out, ["l_quantity"], 2)


SQL_COMPRESS_LINEITEM = """
    SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS l_quantity
    FROM lineitem
"""


def q_remove_min_lags_daily(sf_dir: str) -> pd.DataFrame:
    """M11 remove_min_lags: lags 1-3 built, minimum lag 2 → the lag-1 column
    is dropped (schema check is the point; model.py:631-651)."""
    fr = _daily_frame(sf_dir).lag_features("v", [1, 2, 3])
    fr.remove_min_lags({"v": 2})
    cols = list(fr.dataset.schema().names)
    assert "v_lag1" not in cols, cols
    df = fr.to_pandas()[["event_type", "d", "v", "v_lag2", "v_lag3"]]
    return _fill(df, ["v_lag2", "v_lag3"])


SQL_REMOVE_MIN_LAGS = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           COALESCE(LAG(v, 2) OVER w, {NULLF}) AS v_lag2,
           COALESCE(LAG(v, 3) OVER w, {NULLF}) AS v_lag3
    FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
"""


def q_merge_actuals_daily(sf_dir: str) -> pd.DataFrame:
    """J3 merge_actuals: predictions for even days FULL-OUTER-joined with the
    actuals on hierarchy + datetime (distributed hash join)."""
    fr = _daily_frame(sf_dir)
    base = fr.to_pandas()
    dn = base["d"].astype("datetime64[us]").astype("int64") // DAY_US
    preds = base.loc[dn % 2 == 0, ["event_type", "d"]].copy()
    preds["pred"] = np.round(base.loc[dn % 2 == 0, "v"].to_numpy() * 0.9, 6)
    merged = fr.merge_actuals(preds).to_pandas()
    merged = merged[["event_type", "d", "pred", "v"]]
    merged = _round(merged, ["v"], 6)
    return _fill(merged, ["pred", "v"])


SQL_MERGE_ACTUALS = f"""
    WITH daily AS ({_DAILY_SQL}),
    preds AS (
        SELECT event_type, d, round(v * 0.9, 6) AS pred
        FROM daily WHERE (epoch_us(d) // {DAY_US}) % 2 = 0
    )
    SELECT COALESCE(p.event_type, a.event_type) AS event_type,
           COALESCE(p.d, a.d) AS d,
           COALESCE(p.pred, {NULLF}) AS pred,
           COALESCE(round(a.v, 6), {NULLF}) AS v
    FROM preds p FULL OUTER JOIN daily a
        ON p.event_type = a.event_type AND p.d = a.d
"""


def q_update_values_daily(sf_dir: str) -> pd.DataFrame:
    """J4 update_values: every 5th day patched with v+1000 via the broadcast
    non-NA coalesce (utilities.py:189-211 semantics)."""
    fr = _daily_frame(sf_dir)
    base = fr.to_pandas()
    dn = base["d"].astype("datetime64[us]").astype("int64") // DAY_US
    patch = base.loc[dn % 5 == 0, ["event_type", "d", "v"]].copy()
    patch["v"] = np.round(patch["v"].to_numpy() + 1000.0, 6)
    fr.update_values(patch)
    out = fr.to_pandas()[["event_type", "d", "v"]]
    return _round(out, ["v"], 6)


SQL_UPDATE_VALUES = f"""
    WITH daily AS ({_DAILY_SQL}),
    patch AS (
        SELECT event_type, d, round(v + 1000.0, 6) AS pv
        FROM daily WHERE (epoch_us(d) // {DAY_US}) % 5 = 0
    )
    SELECT a.event_type, a.d, round(COALESCE(p.pv, a.v), 6) AS v
    FROM daily a LEFT JOIN patch p USING (event_type, d)
"""


def q_future_frame_daily(sf_dir: str) -> pd.DataFrame:
    """W10 future frame: distinct hierarchy × the next 7 days after the
    global max date, NaN target, unioned with history (model.py:717-791)."""
    fr = _daily_frame(sf_dir)
    out_fr = fr.make_future_frame(periods=7, freq="D", include_history=True,
                                  apply_plan=False)
    df = out_fr.to_pandas()[["event_type", "d", "v"]]
    df = _round(df, ["v"], 6)
    return _fill(df, ["v"])


SQL_FUTURE_FRAME = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, round(v, 6) AS v FROM daily
    UNION ALL
    SELECT t.event_type, f.d, {NULLF} AS v
    FROM (SELECT DISTINCT event_type FROM daily) t
    CROSS JOIN (
        SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                      maxd + INTERVAL 7 DAY,
                                      INTERVAL 1 DAY)) AS d
        FROM (SELECT max(d) AS maxd FROM daily)
    ) f
"""


def q_save_load_roundtrip_events(sf_dir: str) -> pd.DataFrame:
    """S2/S3 save/load: parquet + JSON-manifest persistence roundtrip — the
    reloaded frame (data AND fitted scaler state) matches the source."""
    import shutil

    path = "/tmp/ffray_query_saveload"
    shutil.rmtree(path, ignore_errors=True)
    fr = _daily_frame(sf_dir).log_features(["v"])
    fr.save(path)
    fr2 = RayForecastFrame.load(path)
    assert fr2.transforms.get("log1p", {}).get("features") == ["v"], fr2.transforms
    out = fr2.to_pandas()[["event_type", "d", "v"]]
    return _round(out, ["v"], 9)


SQL_SAVE_LOAD = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, round(ln(1.0 + v), 9) AS v FROM daily
"""


def q_missing_percentages_hourly(sf_dir: str) -> pd.DataFrame:
    """A7 missing-percentage profile over the gap-filled hourly series: one
    partial+final aggregate pass, never materializing the table."""
    hourly = _bucket_series(sf_dir, HOUR_US, "h")
    fr = RayForecastFrame(hourly, datetime_column="h", target="v",
                          hierarchy=["event_type"], num_partitions=_NP)
    fr.fill_time_gaps(freq="h", mode="local")
    ser = fr.missing_percentages()
    out = pd.DataFrame({"column_name": ser.index.to_numpy(dtype=object),
                        "missing_pct": ser.to_numpy(dtype=np.float64)})
    return _round(out, ["missing_pct"], 6)


SQL_MISSING_PCT = f"""
    WITH hourly AS ({_HOURLY_SQL}),
    bounds AS (SELECT event_type, min(h) AS lo, max(h) AS hi
               FROM hourly GROUP BY 1),
    grid AS (
        SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    j AS (SELECT g.event_type, g.h, hr.v
          FROM grid g LEFT JOIN hourly hr USING (event_type, h))
    SELECT 'event_type' AS column_name, 0.0 AS missing_pct FROM (SELECT 1)
    UNION ALL SELECT 'h', 0.0
    UNION ALL
    SELECT 'v', round(1.0 - CAST(count(v) AS DOUBLE) / count(*), 6) FROM j
"""


def q_cv_folds_daily(sf_dir: str) -> pd.DataFrame:
    """§3.4 leakage-safe CV: 3 expanding-window folds with gap=1 over the
    distinct dates; per (fold, series, role) row counts and value sums — the
    sums also prove the masked test actuals were restored."""
    from forecastframe_ray.pipelines import cv

    fr = _daily_frame(sf_dir)
    parts = []
    for fold_ix, (fold, ffr) in enumerate(cv.fold_frames(fr, n_splits=3, gap=1)):
        agg = hash_aggregate(ffr.dataset, ["event_type", "__is_test"], {
            "n_rows": ("v", "size"), "sum_v": ("v", "sum"),
        }, num_partitions=4).to_pandas()
        agg["fold"] = fold_ix
        parts.append(agg)
    out = pd.concat(parts, ignore_index=True)
    out["role"] = np.where(out["__is_test"].astype(bool), "test", "train")
    out["fold"] = out["fold"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    out = _round(out, ["sum_v"], 6)
    return out[["fold", "event_type", "role", "n_rows", "sum_v"]]


SQL_CV_FOLDS = f"""
    WITH daily AS ({_DAILY_SQL}),
    dd AS (SELECT d, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS rn
           FROM (SELECT DISTINCT d FROM daily)),
    params AS (SELECT count(*) AS n, count(*) // 4 AS ts FROM dd),
    folds AS (SELECT unnest([0, 1, 2]) AS fold),
    bounds AS (SELECT fold, n - (3 - fold) * ts AS tsix, ts
               FROM folds CROSS JOIN params),
    lab AS (
        SELECT b.fold, dd.d,
               CASE WHEN dd.rn <= b.tsix - 2 THEN 'train'
                    WHEN dd.rn >= b.tsix AND dd.rn < b.tsix + b.ts THEN 'test'
               END AS role
        FROM bounds b CROSS JOIN dd
    )
    SELECT CAST(l.fold AS BIGINT) AS fold, dy.event_type, l.role,
           count(*) AS n_rows, round(sum(dy.v), 6) AS sum_v
    FROM lab l JOIN daily dy ON dy.d = l.d
    WHERE l.role IS NOT NULL
    GROUP BY 1, 2, 3
"""


#: EWMA closed form (adjust=True): ewma_t = Σ x_i (1-α)^(t-i) / Σ (1-α)^(t-i)
#: — the common (1-α)^t factor cancels, so both sums use pow(1/(1-α), rn).
#: α = 2/(span+1): span 3 → 1/(1-α) = 2, span 7 → 4/3. min_periods =
#: ceil(span^0.8) = 3 and 5 (feature_engineering.py:479-483, 559-567).
SQL_EWMA_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS x,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    e AS (
        SELECT event_type, d, v,
               SUM(x * pow(2.0, rn)) OVER w
                   / SUM(CASE WHEN x IS NOT NULL THEN pow(2.0, rn) END) OVER w
                   AS e3,
               SUM(x * pow(4.0 / 3.0, rn)) OVER w
                   / SUM(CASE WHEN x IS NOT NULL THEN pow(4.0 / 3.0, rn) END)
                     OVER w AS e7,
               COUNT(x) OVER w AS cnt
        FROM l
        WINDOW w AS (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, v,
           CASE WHEN cnt >= 3 THEN round(e3, 6) ELSE {NULLF} END
               AS v_ewma_roll3_lag1,
           CASE WHEN cnt >= 5 THEN round(e7, 6) ELSE {NULLF} END
               AS v_ewma_roll7_lag1,
           CASE WHEN cnt >= 5 THEN round(e3 / e7, 6) ELSE {NULLF} END
               AS v_ewma_roll3_lag1_cross7
    FROM e
"""


def q_text_ratios_documents(sf_dir: str) -> pd.DataFrame:
    """Quality-scoring character/stopword ratios (the SQL-expressible subset
    of the text-analysis stage; quality_batch definitions)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(lambda b: textstats.quality_batch(b),
                           batch_format="pandas").to_pandas()
    cols = ["alpha_ratio", "digit_ratio", "punct_ratio", "mean_word_len",
            "stopword_frac"]
    return _round(out[["doc_id"] + cols], cols, 6)


_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(
    "the of and to in a is that it for on with as was at by an be this have "
    "from or are not but had his they you which one all were her she there".split()))

SQL_TEXT_RATIOS = rf"""
    WITH f AS (
        SELECT doc_id, text,
               greatest(length(text), 1) AS n,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS na,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd,
               length(regexp_replace(text, '[^0-9A-Za-z_]', '', 'g')) AS nw,
               length(text) - length(regexp_replace(text, '\s', '', 'g'))
                   AS nspace,
               list_transform(regexp_extract_all(text, '\S+'),
                              t -> trim(lower(t), '.,;:!?"''()[]')) AS toks
        FROM documents
    )
    SELECT doc_id,
           round_even(CAST(na AS DOUBLE) / n, 6) AS alpha_ratio,
           round_even(CAST(nd AS DOUBLE) / n, 6) AS digit_ratio,
           round_even(CAST(length(text) - nw - nspace AS DOUBLE) / n, 6)
               AS punct_ratio,
           round_even(CAST(length(text) - nspace AS DOUBLE)
                 / greatest(length(toks), 1), 6) AS mean_word_len,
           round_even(CAST(length(list_filter(toks, t -> t IN ({_STOP_SQL})))
                      AS DOUBLE) / greatest(length(toks), 1), 6)
               AS stopword_frac
    FROM f
"""


def q_embedding_neardup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact embedding-cosine near-dup pairs (the verification baseline the
    LSH variant approximates): per-batch matmul against the full normalized
    matrix shipped worker-side via block refs — no driver collection."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    refs = emb.to_arrow_refs()
    threshold = 0.3

    class PairFinder:
        def __init__(self):
            import pyarrow as pa
            t = pa.concat_tables(
                [t for t in ray.get(list(refs)) if t.num_rows])
            self.ids = t["vec_id"].to_numpy(zero_copy_only=False)
            M = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            self.M = M / norms[:, None]
            order = np.argsort(self.ids)
            self.ids, self.M = self.ids[order], self.M[order]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["vec_id"].to_numpy()
            B = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(B, axis=1)
            norms[norms == 0] = 1.0
            B = B / norms[:, None]
            C = B @ self.M.T
            # emit each unordered pair once: from the batch row with lower id
            mask = (C >= threshold) & (ids[:, None] < self.ids[None, :])
            ia, ib = np.where(mask)
            return pd.DataFrame({"id_a": ids[ia], "id_b": self.ids[ib],
                                 "cos_sim": C[ia, ib]})

    pairs = emb.map_batches(PairFinder, batch_format="pandas",
                            concurrency=(1, 8)).to_pandas()
    from forecastframe_ray.stages.agg import ensure_columns
    pairs = ensure_columns(pairs, {"id_a": "int64", "id_b": "int64",
                                   "cos_sim": "float64"})
    return _round(pairs[["id_a", "id_b", "cos_sim"]], ["cos_sim"], 6)


#: embeddings are stored float32; cast to DOUBLE[] so the oracle's cosine is
#: computed in the same precision as the engine (float32 math shifts the 6th
#: decimal and flips threshold-boundary pairs; round() is also a no-op on
#: FLOAT in DuckDB).
SQL_EMBEDDING_NEARDUP_EXACT = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.3
"""


def q_ann_ivf_recall(sf_dir: str) -> pd.DataFrame:
    """IVF recall@10 gate vs the exact brute-force top-k: the driver-visible
    oracle row asserts recall ≥ 0.9 per query (nprobe=8 of 16 centroids)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    Q = _query_vectors(sf_dir)
    bf = similarity.brute_force_topk(emb, Q, k=10)
    ivf = similarity.ivf_topk(emb, Q, k=10, num_centroids=16, nprobe=8)
    rows = []
    for qi in range(len(Q)):
        exact = set(bf.loc[bf["query_ix"] == qi, "vec_id"])
        approx = set(ivf.loc[ivf["query_ix"] == qi, "vec_id"])
        rows.append((qi, len(exact & approx) / max(len(exact), 1) >= 0.9))
    return pd.DataFrame(rows, columns=["query_ix", "recall_ok"]) \
        .astype({"query_ix": "int64", "recall_ok": "bool"})


SQL_ANN_IVF_RECALL = """
    SELECT CAST(0 AS BIGINT) AS query_ix, true AS recall_ok
    UNION ALL SELECT CAST(1 AS BIGINT), true
"""


def q_ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact n-gram (5-byte shingle) Jaccard for the fixed pair list
    (2i, 2i+1) — the dedup verification primitive with its own value oracle
    (the engine compares distinct shingle HASHES; the oracle compares the
    distinct substrings themselves — equal barring a 2^-64 collision)."""
    from forecastframe_ray.pipelines.dedup import ngram_jaccard

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pair_up(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["pair_id"] = b["doc_id"] // 2
        return b[["pair_id", "doc_id", "text"]]

    def jac(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        if len(g) != 2:
            return pd.DataFrame({"pair_id": [], "jaccard": []})
        j = ngram_jaccard(g["text"].iloc[0] or "", g["text"].iloc[1] or "",
                          width=5)
        return pd.DataFrame({"pair_id": [int(g["pair_id"].iloc[0])],
                             "jaccard": [j]})

    from forecastframe_ray.stages.agg import bucketed_map_groups

    pairs = bucketed_map_groups(docs.map_batches(pair_up, batch_format="pandas"),
                                ["pair_id"], jac, num_partitions=8)
    out = pairs.to_pandas()
    out["pair_id"] = out["pair_id"].astype("int64")
    return _round(out[["pair_id", "jaccard"]], ["jaccard"], 6)


SQL_NGRAM_JACCARD = """
    WITH sh AS (
        SELECT doc_id // 2 AS pair_id, doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(strlen(text) - 4, 1)),
                   i -> substr(text, i, 5))) AS s
        FROM documents
    ),
    p AS (
        SELECT a.pair_id, a.s AS sa, b.s AS sb
        FROM sh a JOIN sh b
            ON a.pair_id = b.pair_id AND a.doc_id < b.doc_id
    )
    SELECT pair_id,
           round(CAST(length(list_intersect(sa, sb)) AS DOUBLE)
                 / (length(sa) + length(sb) - length(list_intersect(sa, sb))),
                 6) AS jaccard
    FROM p
"""


def q_lang_id_documents(sf_dir: str) -> pd.DataFrame:
    """Language-ID heuristic (stopword-profile argmax over {de,en,es,fr},
    ``und`` when no profile hits) — previously only rows-only inside
    ``text_analysis_documents``; the oracle recomputes the token extraction,
    per-language occurrence counts and the argmax-first tie-break in SQL
    (VERDICT r3 #6: split SQL-expressible heuristic columns out)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(lambda b: textstats.lang_id_batch(b),
                           batch_format="pandas").to_pandas()
    return out[["doc_id", "lang_pred"]].astype({"doc_id": "int64"})


def _lang_list_sql(lang: str) -> str:
    from forecastframe_ray.pipelines.textstats import _LANG_STOPS
    return "[" + ", ".join(f"'{w}'" for w in sorted(_LANG_STOPS[lang])) + "]"


#: numpy argmax takes the FIRST maximum in sorted language order
#: (de, en, es, fr) — the CASE ladder reproduces exactly that tie-break.
SQL_LANG_ID = rf"""
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(coalesce(text, '')),
                                  '[a-záéíóúäöüßàèùâêîôûç]+') AS t
        FROM documents
    ),
    scores AS (
        SELECT doc_id,
          length(list_filter(t, x -> list_contains({_lang_list_sql("de")}, x))) AS s_de,
          length(list_filter(t, x -> list_contains({_lang_list_sql("en")}, x))) AS s_en,
          length(list_filter(t, x -> list_contains({_lang_list_sql("es")}, x))) AS s_es,
          length(list_filter(t, x -> list_contains({_lang_list_sql("fr")}, x))) AS s_fr
        FROM toks
    )
    SELECT doc_id,
      CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
           WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_fr THEN 'es'
           ELSE 'fr' END AS lang_pred
    FROM scores
"""


def q_doc_fingerprint_documents(sf_dir: str) -> pd.DataFrame:
    """Document fingerprint (rolling-hash min ⊕ byte length) — the last
    heuristic column of ``text_analysis_documents`` promoted to a full SQL
    oracle (VERDICT r3 #6 tail): DuckDB recomputes the width-8 polynomial
    rolling hash over the UTF-8 bytes with the same wrapped-mod-2^64
    powers, including the pad-to-width short-doc path. uint64 fingerprints
    are reinterpreted as int64 bit patterns on BOTH sides."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(lambda b: textstats.fingerprint_batch(b),
                           batch_format="pandas").to_pandas()
    out["doc_fingerprint"] = \
        out["doc_fingerprint"].to_numpy(dtype=np.uint64).astype(np.int64)
    return out[["doc_id", "doc_fingerprint"]].astype({"doc_id": "int64"})


def _fp_terms() -> str:
    base = 1099511628211  # _FP_BASE (FNV prime), powers wrapped mod 2^64
    return " + ".join(
        "CAST(CAST(concat('0x', substr(h, 2*(p + {j}) + 1, 2)) AS INT) "
        "AS HUGEINT) * {w}::HUGEINT".format(j=j, w=pow(base, 7 - j, 2 ** 64))
        for j in range(8))


SQL_DOC_FINGERPRINT = f"""
    WITH b AS (
        SELECT doc_id, hex(encode(coalesce(text, ''))) AS h,
               octet_length(encode(coalesce(text, ''))) AS n
        FROM documents
    ),
    padded AS (  -- rolling_hashes zero-pads docs shorter than the width
        SELECT doc_id,
               CASE WHEN n < 8 THEN h || repeat('00', 8 - n) ELSE h END AS h,
               n, CASE WHEN n = 0 THEN 0 ELSE greatest(n - 7, 1) END AS nwin
        FROM b
    ),
    w AS (SELECT doc_id, n, unnest(range(nwin)) AS p, h
          FROM padded WHERE n > 0),
    hashes AS (
        SELECT doc_id, n,
               ({_fp_terms()}) % 18446744073709551616::HUGEINT AS rh
        FROM w
    ),
    mins AS (SELECT doc_id, n, min(rh) AS m FROM hashes GROUP BY 1, 2),
    fp AS (
        SELECT doc_id, xor(m, n::HUGEINT) AS f FROM mins
        UNION ALL
        SELECT doc_id, 0::HUGEINT FROM b WHERE n = 0
    )
    SELECT doc_id,
           CAST(CASE WHEN f >= 9223372036854775808::HUGEINT
                     THEN f - 18446744073709551616::HUGEINT
                     ELSE f END AS BIGINT) AS doc_fingerprint
    FROM fp
"""


def q_minhash_recall(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH recall gate (VERDICT r3 #6): the LSH pair output at
    threshold 0.7 must contain ≥90% of ALL true pairs with exact Jaccard ≥
    0.8 (threshold + margin — where the 16×4 banding's detection
    probability is ≥0.9998). The TRUE pair count is computed exactly on
    both sides: here by brute-force shingle intersects (with the size-ratio
    prune that j ≥ 0.8 mathematically implies), in SQL by the exploded
    hashed-shingle oracle — so ``n_true`` is a real cross-checked value and
    ``recall_ok`` flips the driver to FAIL if LSH ever loses true pairs."""
    docs_df = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ids = docs_df["doc_id"].to_numpy()
    texts = docs_df["text"].fillna("")
    flat, off, cnt = dedup.batch_shingle_windows(texts, 5)
    sets = [np.unique(flat[o: o + c]) for o, c in zip(off, cnt)]
    sizes = np.fromiter((len(s) for s in sets), np.int64, len(sets))
    true_pairs = set()
    n = len(sets)
    for i in range(n):
        si, zi = sets[i], sizes[i]
        for j in range(i + 1, n):
            zj = sizes[j]
            if min(zi, zj) < 0.8 * max(zi, zj):  # j >= .8 needs ratio >= .8
                continue
            if zi == 0 and zj == 0:
                jac = 1.0
            else:
                inter = len(np.intersect1d(si, sets[j], assume_unique=True))
                jac = inter / (zi + zj - inter)
            if jac >= 0.8:
                true_pairs.add((ids[i], ids[j]))

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.7).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    hit = sum(p in found for p in true_pairs)
    recall = hit / max(len(true_pairs), 1)
    return pd.DataFrame({"n_true": pd.Series([len(true_pairs)], dtype="int64"),
                         "recall_ok": pd.Series([recall >= 0.9],
                                                dtype="bool")})


SQL_MINHASH_RECALL = """
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(strlen(text) - 4, 1)),
                   i -> hash(substr(text, i, 5)))) AS s
        FROM documents
    ),
    cand AS (
        SELECT a.s AS sa, b.s AS sb
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE least(length(a.s), length(b.s))
              >= 0.8 * greatest(length(a.s), length(b.s))
    ),
    j AS (
        SELECT CAST(length(list_intersect(sa, sb)) AS DOUBLE)
               / (length(sa) + length(sb) - length(list_intersect(sa, sb)))
               AS jac
        FROM cand
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true, true AS recall_ok
    FROM j WHERE jac >= 0.8
"""


def q_simhash_recall(sf_dir: str) -> pd.DataFrame:
    """SimHash banding completeness gate (VERDICT r3 #6, ann_ivf_recall
    style): every pair within Hamming distance ≤3 of the 64-bit SimHash
    MUST appear in the banded pipeline's output — the 4×16-bit band trick
    is EXACT for ≤3 flipped bits (pigeonhole: ≥1 band survives intact), so
    the gate is recall == 1.0, computed against a chunked brute-force
    all-pairs Hamming truth. SimHash itself is not SQL-expressible, so the
    oracle row is constant-shape (the assertion lives on the Ray side and a
    miss flips ``recall_ok`` → driver hash mismatch → FAIL)."""
    docs_df = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    sh = dedup.simhash_batch(docs_df, "text")["simhash"].to_numpy(np.uint64)
    ids = docs_df["doc_id"].to_numpy()
    truth = set()
    n = len(sh)
    chunk = max(1, (4 << 20) // max(n, 1))
    for r0 in range(0, n, chunk):
        r1 = min(r0 + chunk, n)
        H = dedup.popcount64(sh[r0:r1, None] ^ sh[None, :])
        ia, ib = np.nonzero(H <= 3)
        keep = (ia + r0) < ib
        truth.update(zip(ids[ia[keep] + r0], ids[ib[keep]]))

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sp = dedup.simhash_near_dup_pairs(docs, max_hamming=3).to_pandas()
    found = set(zip(sp["id_a"], sp["id_b"]))
    missing = len(truth - found)
    return pd.DataFrame({"gate": pd.Series([0], dtype="int64"),
                         "recall_ok": pd.Series([missing == 0],
                                                dtype="bool")})


SQL_SIMHASH_RECALL = """
    SELECT CAST(0 AS BIGINT) AS gate, true AS recall_ok
"""


def q_multimodal_resize(sf_dir: str) -> pd.DataFrame:
    """Multimodal resize/frame-sample stage (actor pool): deterministic
    metadata math (scale to max side 256) and the payload-shrink contract,
    both recomputed exactly by the oracle."""
    from forecastframe_ray.pipelines import multimodal

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    mds = multimodal.media_from_documents(docs)
    out = mds.map_batches(
        multimodal.ResizeStage, fn_constructor_kwargs={"max_side": 256},
        concurrency=(1, 4), batch_size=64, batch_format="pyarrow")
    df = out.to_pandas()
    df["payload_bytes"] = df["payload"].map(len).astype("int64")
    df["new_w"] = df["width"].astype("int64")
    df["new_h"] = df["height"].astype("int64")
    return df[["media_id", "new_w", "new_h", "payload_bytes"]]


SQL_MULTIMODAL_RESIZE = """
    WITH m AS (
        SELECT doc_id AS media_id,
               CAST(16 + (doc_id * 7) % 4000 AS DOUBLE) AS w,
               CAST(16 + (doc_id * 13) % 3000 AS DOUBLE) AS h,
               CAST(strlen(text) AS DOUBLE) AS pb
        FROM documents
    ),
    s AS (SELECT media_id, w, h, pb,
                 least(1.0, 256.0 / greatest(greatest(w, h), 1.0)) AS sc
          FROM m)
    SELECT media_id,
           CAST(greatest(1, round_even(w * sc, 0)) AS BIGINT) AS new_w,
           CAST(greatest(1, round_even(h * sc, 0)) AS BIGINT) AS new_h,
           CAST(greatest(16, floor(pb * sc * sc)) AS BIGINT) AS payload_bytes
    FROM s
"""


def q_csv_roundtrip_events(sf_dir: str) -> pd.DataFrame:
    """S1 CSV source: events written to CSV (shortest-roundtrip floats) and
    read back via ``ray.data.read_csv``, aggregated distributed."""
    import os
    import shutil

    import pyarrow.csv as pacsv

    path = "/tmp/ffray_events_csv"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "value"])
    pacsv.write_csv(t, f"{path}/events.csv")
    ds = ray.data.read_csv(f"{path}/events.csv")
    agg = hash_aggregate(ds, ["event_type"], {
        "n": ("value", "size"), "sum_v": ("value", "sum"),
    }, num_partitions=4).to_pandas()
    agg["n"] = agg["n"].astype("int64")
    return _round(agg, ["sum_v"], 6)[["event_type", "n", "sum_v"]]


SQL_CSV_ROUNDTRIP = """
    SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_v
    FROM events GROUP BY 1
"""


def q_anti_join_orders(sf_dir: str) -> pd.DataFrame:
    """J6 anti-join: orders from customers NOT in the high-balance key set,
    counted per status (broadcast key-set filter, ``anti=True``)."""
    od = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_acctbal"]).to_pandas()
    keys = cust[cust["c_acctbal"] > 5000][["c_custkey"]] \
        .rename(columns={"c_custkey": "o_custkey"})
    kept = broadcast_semi_join(od, keys, on=["o_custkey"], anti=True)
    out = hash_count(kept, ["o_orderstatus"], num_partitions=4).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out[["o_orderstatus", "n"]]


SQL_ANTI_JOIN_ORDERS = """
    SELECT o_orderstatus, count(*) AS n
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                            WHERE c_acctbal > 5000)
    GROUP BY 1
"""


def q_ensemble_pred_daily(sf_dir: str) -> pd.DataFrame:
    """§2.8 ensemble-feature hook (``calc_prophet_predictions`` engine path):
    per-(series, day-of-week) seasonal-mean model fit distributed, broadcast,
    scored by an actor-pool stage."""
    fr = _daily_frame(sf_dir).calc_ensemble_predictions()
    df = fr.to_pandas()[["event_type", "d", "v", "v_ensemble_pred"]]
    df = _round(df, ["v_ensemble_pred"], 6)
    return _fill(df, ["v_ensemble_pred"])


SQL_ENSEMBLE_PRED = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           COALESCE(round(avg(v) OVER (PARTITION BY event_type, isodow(d)), 6),
                    {NULLF}) AS v_ensemble_pred
    FROM daily
"""


def q_fourier_dow_fit_daily(sf_dir: str) -> pd.DataFrame:
    """Prophet-style Fourier regression, oracle-EXACT: fit the weekly
    harmonic model (order=3, no trend, l2=0) per series by distributed
    normal equations (:func:`search.fit_fourier` — per-(series,dow)
    sufficient stats → one coarse-hash aggregate → batched driver solve),
    then score. Because intercept + all three weekly harmonics span the
    full day-of-week indicator space, the OLS fitted values equal the
    per-(series, dow) conditional means — which is precisely what the SQL
    oracle computes. Checks the whole distributed regression path (design,
    gram accumulation, solve, broadcast score) for exactness."""
    from forecastframe_ray.pipelines.search import fit_fourier, score_fourier

    # materialized once: the fit aggregate and the scoring map both consume
    # it — unmaterialized, the upstream bucket shuffle would execute twice
    daily = _bucket_series(sf_dir, DAY_US, "d").materialize()
    state = fit_fourier(daily, ["event_type"], "d", "v",
                        order=3, trend=False)
    scored = score_fourier(daily, state, ["event_type"], "d", "v",
                           "fourier_pred")

    def to_dow(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["event_type", "fourier_pred"]].copy()
        out["dow"] = b["d"].dt.dayofweek.astype("int64")
        # identical floats within a (series, dow): safe to dedup pre-round
        return out.drop_duplicates()

    df = scored.map_batches(to_dow, batch_format="pandas") \
        .to_pandas().drop_duplicates()
    df = _round(df, ["fourier_pred"], 4)
    return df[["event_type", "dow", "fourier_pred"]] \
        .sort_values(["event_type", "dow"]).reset_index(drop=True)


SQL_FOURIER_DOW_FIT = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, CAST(isodow(d) - 1 AS BIGINT) AS dow,
           round(avg(v), 4) AS fourier_pred
    FROM daily GROUP BY 1, 2
"""


def q_search_cv_daily(sf_dir: str) -> pd.DataFrame:
    """Grid-search cross-validation driver (reference grid/random search,
    ``model.py:319-513`` + ``cross_validate``, ``model.py:1313-1417``): the
    "fast" premade grid (2 seasons × 2 blends) of the stand-in seasonal-mean
    estimator, scored on 2 expanding-window folds. The oracle recomputes the
    distributed fit (train-only per-(series, day-of-week) and per-series
    means), the broadcast score and the null-masked RMSE/MAPE per
    (candidate, fold) entirely in SQL."""
    from forecastframe_ray.pipelines import search

    fr = _daily_frame(sf_dir)
    results, _best = search.search_cv(fr, grid=search.premade_grids("fast"),
                                      n_splits=2, gap=0)
    out = results[["candidate", "blend", "season", "fold",
                   "n_test", "rmse", "mape"]].copy()
    for c in ("candidate", "fold", "n_test"):
        out[c] = out[c].astype("int64")
    out = _round(out, ["rmse"], 4)
    return _round(out, ["mape"], 6)


#: fold bounds mirror SQL_CV_FOLDS with n_splits=2, gap=0 (test chunks are
#: the last 2 of 3 equal date blocks); candidate order is the sorted-name
#: itertools.product of the "fast" grid: (blend, season) =
#: (0,dow),(0,none),(0.5,dow),(0.5,none). ``isodow`` relabels pandas'
#: Monday=0 buckets bijectively, which leaves the grouped means unchanged.
SQL_SEARCH_CV = f"""
    WITH daily AS ({_DAILY_SQL}),
    dd AS (SELECT d, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS rn
           FROM (SELECT DISTINCT d FROM daily)),
    params AS (SELECT count(*) AS n, count(*) // 3 AS ts FROM dd),
    folds AS (SELECT unnest([0, 1]) AS fold),
    bounds AS (SELECT fold, n - (2 - fold) * ts AS tsix, ts
               FROM folds CROSS JOIN params),
    lab AS (
        SELECT b.fold, dd.d,
               CASE WHEN dd.rn < b.tsix THEN 'train'
                    WHEN dd.rn < b.tsix + b.ts THEN 'test'
               END AS role
        FROM bounds b CROSS JOIN dd
    ),
    rows_ AS (
        SELECT l.fold, l.role, dy.event_type, dy.d, dy.v, isodow(dy.d) AS dw
        FROM lab l JOIN daily dy ON dy.d = l.d
        WHERE l.role IS NOT NULL
    ),
    s AS (SELECT fold, event_type, dw, avg(v) AS sm
          FROM rows_ WHERE role = 'train' GROUP BY 1, 2, 3),
    g AS (SELECT fold, event_type, avg(v) AS gm
          FROM rows_ WHERE role = 'train' GROUP BY 1, 2),
    cand AS (
        SELECT * FROM (VALUES (0, 0.0, 'dow'), (1, 0.0, 'none'),
                              (2, 0.5, 'dow'), (3, 0.5, 'none'))
        AS t(candidate, blend, season)
    ),
    scored AS (
        SELECT c.candidate, c.blend, c.season, r.fold, r.v,
               CASE WHEN c.season = 'dow'
                    THEN (1.0 - c.blend) * COALESCE(s.sm, g.gm)
                         + c.blend * g.gm
                    ELSE g.gm END AS pred
        FROM rows_ r
        JOIN g ON g.fold = r.fold AND g.event_type = r.event_type
        LEFT JOIN s ON s.fold = r.fold AND s.event_type = r.event_type
                   AND s.dw = r.dw
        CROSS JOIN cand c
        WHERE r.role = 'test'
    )
    SELECT CAST(candidate AS BIGINT) AS candidate, blend, season,
           CAST(fold AS BIGINT) AS fold, count(*) AS n_test,
           round(sqrt(avg((v - pred) * (v - pred))), 4) AS rmse,
           round(avg(abs((v - pred) / v)), 6) AS mape
    FROM scored GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# LLM-pipeline flagship queries (pipelines/llm.py)
# ---------------------------------------------------------------------------


def q_llm_exact_funnel_documents(sf_dir: str) -> pd.DataFrame:
    """The LLM pipeline's exact (non-approximate) funnel end-to-end:
    corpus-level boilerplate removal → C4 line cleaning → exact dedup
    keeping min(doc_id) per distinct cleaned text. The SQL oracle rebuilds
    the cleaned text per doc over exploded lines and applies the same
    min-id window dedup — content-exact, not just counts."""
    from forecastframe_ray.pipelines import llm

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    stripped = textstats.remove_boilerplate_lines(docs, max_repeats=3)
    cleaned = stripped.map_batches(
        lambda b: textstats.c4_clean_batch(b, min_words_per_line=3,
                                           require_terminal=False)
        [["doc_id", "text_clean"]],
        batch_format="pandas").materialize()
    kept = dedup.exact_dedup(cleaned, text_col="text_clean", id_col="doc_id")
    out = kept.to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "text_clean": pd.Series([], dtype="object")})
    return out[["doc_id", "text_clean"]].sort_values("doc_id") \
        .reset_index(drop=True)


SQL_LLM_EXACT_FUNNEL = r"""
    WITH raw AS (
        SELECT doc_id, string_split(text, chr(10)) AS l FROM documents
    ),
    lns AS (
        SELECT doc_id, unnest(l) AS ln, generate_subscripts(l, 1) AS i
        FROM raw
    ),
    t AS (
        SELECT doc_id, i,
               trim(ln, ' ' || chr(9) || chr(13) || chr(12) || chr(11)) AS s
        FROM lns
        WHERE trim(ln, ' ' || chr(9) || chr(13) || chr(12) || chr(11)) <> ''
    ),
    cnt AS (SELECT s, count(*) AS c FROM t GROUP BY 1),
    good AS (
        SELECT t.doc_id, t.i, t.s
        FROM t JOIN cnt USING (s)
        WHERE cnt.c <= 3
          AND length(regexp_extract_all(t.s, '\S+')) >= 3
          AND NOT contains(t.s, '{') AND NOT contains(t.s, '}')
          AND NOT contains(lower(t.s), 'lorem ipsum')
    ),
    docs_clean AS (
        SELECT doc_id, string_agg(s, chr(10) ORDER BY i) AS text_clean
        FROM good GROUP BY doc_id
    )
    SELECT doc_id, text_clean
    FROM (SELECT doc_id, text_clean,
                 min(doc_id) OVER (PARTITION BY text_clean) AS keep_id
          FROM docs_clean)
    WHERE doc_id = keep_id
    ORDER BY doc_id
"""


def q_llm_pipeline_documents(sf_dir: str) -> pd.DataFrame:
    """Full LLM flagship chain including MinHash near-dup clustering and
    representative selection (LSH candidate generation is approximate by
    contract → rows-only; the exact funnel half is oracled as
    ``llm_exact_funnel_documents`` and the Jaccard verification as
    ``ngram_jaccard_pairs``)."""
    from forecastframe_ray.pipelines import llm

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    final, _ = llm.dedup_pipeline(docs, minhash_threshold=0.5,
                                  min_words_per_line=3,
                                  require_terminal=False, num_partitions=_NP)
    out = final.to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# interpretation stack, data side (pipelines/interpret.py; reference
# interpret.py get_errors/describe, summarize_cv key stats, SHAP-importance
# intent via permutation importance)
# ---------------------------------------------------------------------------

#: stable rounding digits per describe metric — magnitudes differ by orders
#: (APE ~1, SE ~1e6), so a single digit count would either under-round the
#: small metrics or exceed float64's stable digits on the large ones
_DESCRIBE_DIGITS = {"AE": 4, "APE": 6, "SE": 2,
                    "actuals": 4, "predictions": 4}


def q_errors_describe_daily(sf_dir: str) -> pd.DataFrame:
    """``get_errors(describe=True)`` (reference interpret.py:128-208) over
    the naive lag-1 daily forecast: count/mean/std/min/quartiles/max for
    Actuals, Predictions, AE, APE, SE. Moments are streaming Welford/Chan
    partials; quartiles are exact order statistics from one narrow sort +
    point lookups (pipelines/interpret.py)."""
    from forecastframe_ray.pipelines import interpret as interp

    fr = _daily_frame(sf_dir).lag_features("v", [1])
    out = interp.errors_describe(fr.dataset, "v", "v_lag1")
    out["n"] = out["n"].astype("int64")
    stat_cols = ["mean", "std", "min", "q25", "q50", "q75", "max"]
    dg = out["metric"].map(_DESCRIBE_DIGITS).to_numpy()
    for c in stat_cols:
        v = out[c].to_numpy(dtype=np.float64)
        out[c] = np.array([np.round(x, int(d)) for x, d in zip(v, dg)])
    return out


SQL_ERRORS_DESCRIBE = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    ),
    e AS (
        SELECT 'actuals' AS metric, v AS x, 4 AS dg FROM l
        UNION ALL SELECT 'predictions', lv, 4 FROM l WHERE lv IS NOT NULL
        UNION ALL SELECT 'AE', abs(v - lv), 4 FROM l WHERE lv IS NOT NULL
        UNION ALL SELECT 'APE', abs((v - lv) / v), 6
            FROM l WHERE lv IS NOT NULL AND v <> 0
        UNION ALL SELECT 'SE', (v - lv) * (v - lv), 2
            FROM l WHERE lv IS NOT NULL
    )
    SELECT metric, count(*) AS n,
           round(avg(x), CAST(max(dg) AS INT)) AS mean,
           round(stddev_samp(x), CAST(max(dg) AS INT)) AS std,
           round(min(x), CAST(max(dg) AS INT)) AS min,
           round(quantile_cont(x, 0.25), CAST(max(dg) AS INT)) AS q25,
           round(quantile_cont(x, 0.50), CAST(max(dg) AS INT)) AS q50,
           round(quantile_cont(x, 0.75), CAST(max(dg) AS INT)) AS q75,
           round(max(x), CAST(max(dg) AS INT)) AS max
    FROM e GROUP BY metric ORDER BY metric
"""


def q_cv_fit_summary_daily(sf_dir: str) -> pd.DataFrame:
    """``summarize_cv`` key stats (reference interpret.py:446-653) on the
    last expanding-window fold: per sample the null-masked median APE, the
    actuals-weighted average APE, the tail-skew direction and the
    qualitative threshold scores, with the in/out-of-sample median
    difference. Predictions from the stand-in seasonal-mean estimator
    (season=dow, blend=0) fitted on the train slice only."""
    from forecastframe_ray.pipelines import interpret as interp

    fr = _daily_frame(sf_dir)
    out = interp.cv_fit_summary(fr, n_splits=2, round_digits=6)
    out["n"] = out["n"].astype("int64")
    return out


SQL_CV_FIT_SUMMARY = f"""
    WITH daily AS ({_DAILY_SQL}),
    dd AS (SELECT d, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS rn
           FROM (SELECT DISTINCT d FROM daily)),
    params AS (SELECT count(*) AS n, count(*) // 3 AS ts FROM dd),
    bounds AS (SELECT n - ts AS tsix, ts FROM params),
    lab AS (
        SELECT dd.d,
               CASE WHEN dd.rn < b.tsix THEN 'In-Sample'
                    WHEN dd.rn < b.tsix + b.ts THEN 'Out-of-Sample'
               END AS sample
        FROM bounds b CROSS JOIN dd
    ),
    rows_ AS (
        SELECT l.sample, dy.event_type, dy.v, isodow(dy.d) AS dw
        FROM lab l JOIN daily dy ON dy.d = l.d
        WHERE l.sample IS NOT NULL
    ),
    s AS (SELECT event_type, dw, avg(v) AS sm
          FROM rows_ WHERE sample = 'In-Sample' GROUP BY 1, 2),
    g AS (SELECT event_type, avg(v) AS gm
          FROM rows_ WHERE sample = 'In-Sample' GROUP BY 1),
    scored AS (
        SELECT r.sample, r.v, COALESCE(s.sm, g.gm) AS pred
        FROM rows_ r
        JOIN g ON g.event_type = r.event_type
        LEFT JOIN s ON s.event_type = r.event_type AND s.dw = r.dw
    ),
    ap AS (SELECT sample, abs((v - pred) / v) AS ape, v AS w
           FROM scored WHERE pred IS NOT NULL AND v <> 0),
    st AS (SELECT sample, count(*) AS n,
                  round(quantile_cont(ape, 0.5), 6) AS median_ape,
                  round(sum(ape * w) / sum(w), 6) AS wavg_ape
           FROM ap GROUP BY 1),
    f AS (SELECT round(abs(
              max(CASE WHEN sample = 'Out-of-Sample' THEN median_ape END)
            - max(CASE WHEN sample = 'In-Sample' THEN median_ape END)), 6)
          AS difference FROM st)
    SELECT st.sample, st.n, st.median_ape, st.wavg_ape,
           CASE WHEN st.wavg_ape < st.median_ape THEN 'left-tailed'
                ELSE 'right-tailed' END AS skew,
           CASE WHEN st.median_ape <= 0.10 THEN 'best'
                WHEN st.median_ape <= 0.15 THEN 'good'
                WHEN st.median_ape <= 0.25 THEN 'bad'
                WHEN st.median_ape <= 1.0 THEN 'worst' END AS sample_score,
           f.difference,
           CASE WHEN f.difference <= 0.10 THEN 'best'
                WHEN f.difference <= 0.15 THEN 'good'
                WHEN f.difference <= 0.25 THEN 'bad'
                WHEN f.difference <= 1.0 THEN 'worst' END AS difference_score
    FROM st CROSS JOIN f ORDER BY st.sample
"""


def q_perm_importance_daily(sf_dir: str) -> pd.DataFrame:
    """Permutation feature importance (the SHAP-importance stand-in,
    reference interpret.py:211-347 intent): distributed OLS of daily v on
    (v_lag1, v_lag7), then RMSE increase when each feature is cyclically
    rotated within its series — deterministic, cluster-shape-independent,
    and reproduced term-for-term by the SQL oracle (same Cramer solve)."""
    from forecastframe_ray.pipelines import interpret as interp

    fr = _daily_frame(sf_dir).lag_features("v", [1, 7])
    ds = fr.dataset.select_columns(
        ["event_type", "d", "v", "v_lag1", "v_lag7"]).map_batches(
        lambda b: b[b["v_lag1"].notna() & b["v_lag7"].notna()],
        batch_format="pandas")
    out = interp.permutation_importance(ds, ["event_type"], "d",
                                        ("v_lag1", "v_lag7"), "v",
                                        num_partitions=_NP)
    return _round(out, ["rmse_base", "rmse_permuted", "importance"], 4)


SQL_PERM_IMPORTANCE = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER w AS lv1, LAG(v, 7) OVER w AS lv7
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    e AS (SELECT * FROM l WHERE lv1 IS NOT NULL AND lv7 IS NOT NULL),
    p AS (
        SELECT event_type, d, v, lv1, lv7,
               COALESCE(LAG(lv1) OVER w, last_value(lv1) OVER wf) AS lv1p,
               COALESCE(LAG(lv7) OVER w, last_value(lv7) OVER wf) AS lv7p
        FROM e
        WINDOW w AS (PARTITION BY event_type ORDER BY d),
               wf AS (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(lv1) AS s1, sum(lv7) AS s2,
               sum(lv1 * lv1) AS s11, sum(lv7 * lv7) AS s22,
               sum(lv1 * lv7) AS s12,
               sum(v) AS sy, sum(lv1 * v) AS s1y, sum(lv7 * v) AS s2y
        FROM e
    ),
    det AS (
        SELECT
          n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2) AS d,
          sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y) AS d0,
          n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2) AS d1,
          n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2) AS d2
        FROM s
    ),
    b AS (SELECT d0 / d AS b0, d1 / d AS b1, d2 / d AS b2 FROM det),
    base AS (
        SELECT sqrt(avg((v - (b.b0 + b.b1 * e.lv1 + b.b2 * e.lv7))
                      * (v - (b.b0 + b.b1 * e.lv1 + b.b2 * e.lv7))))
               AS rmse_base
        FROM e CROSS JOIN b
    ),
    perms AS (
        SELECT 'v_lag1' AS feature,
               sqrt(avg((v - (b.b0 + b.b1 * p.lv1p + b.b2 * p.lv7))
                      * (v - (b.b0 + b.b1 * p.lv1p + b.b2 * p.lv7))))
               AS rmse_permuted
        FROM p CROSS JOIN b
        UNION ALL
        SELECT 'v_lag7',
               sqrt(avg((v - (b.b0 + b.b1 * p.lv1 + b.b2 * p.lv7p))
                      * (v - (b.b0 + b.b1 * p.lv1 + b.b2 * p.lv7p))))
        FROM p CROSS JOIN b
    )
    SELECT feature, round(base.rmse_base, 4) AS rmse_base,
           round(rmse_permuted, 4) AS rmse_permuted,
           round(rmse_permuted - base.rmse_base, 4) AS importance
    FROM perms CROSS JOIN base ORDER BY feature
"""


def q_linear_shap_daily(sf_dir: str) -> pd.DataFrame:
    """Exact Linear-SHAP attributions (reference interpret.py:282-286
    ``calc_shap_values``, engine path): distributed OLS of daily v on
    (v_lag1, v_lag7), then per-row φⱼ = βⱼ(xⱼ − x̄ⱼ) with base = ȳ — the
    closed-form Shapley values of a linear model. The oracle recomputes the
    Cramer solve, the means, and every per-row attribution in SQL."""
    from forecastframe_ray.pipelines import interpret as interp

    fr = _daily_frame(sf_dir).lag_features("v", [1, 7])
    ds = fr.dataset.select_columns(
        ["event_type", "d", "v", "v_lag1", "v_lag7"]).map_batches(
        lambda b: b[b["v_lag1"].notna() & b["v_lag7"].notna()],
        batch_format="pandas").materialize()  # fit + attribute share it
    out = interp.linear_shap(ds, "v_lag1", "v_lag7", "v").to_pandas()
    cols = ["v_lag1_shap", "v_lag7_shap", "base_value", "pred"]
    out = _round(out[["event_type", "d"] + cols], cols, 4)
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_LINEAR_SHAP = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER w AS lv1, LAG(v, 7) OVER w AS lv7
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    e AS (SELECT * FROM l WHERE lv1 IS NOT NULL AND lv7 IS NOT NULL),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(lv1) AS s1, sum(lv7) AS s2,
               sum(lv1 * lv1) AS s11, sum(lv7 * lv7) AS s22,
               sum(lv1 * lv7) AS s12,
               sum(v) AS sy, sum(lv1 * v) AS s1y, sum(lv7 * v) AS s2y
        FROM e
    ),
    det AS (
        SELECT s1 / n AS m1, s2 / n AS m2, sy / n AS base,
          n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2) AS d,
          sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y) AS d0,
          n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2) AS d1,
          n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2) AS d2
        FROM s
    ),
    b AS (SELECT m1, m2, base, d0 / d AS b0, d1 / d AS b1, d2 / d AS b2
          FROM det)
    SELECT e.event_type, e.d,
           round(b.b1 * (e.lv1 - b.m1), 4) AS v_lag1_shap,
           round(b.b2 * (e.lv7 - b.m2), 4) AS v_lag7_shap,
           round(b.base, 4) AS base_value,
           round(b.b0 + b.b1 * e.lv1 + b.b2 * e.lv7, 4) AS pred
    FROM e CROSS JOIN b
"""


def q_predict_future_daily(sf_dir: str) -> pd.DataFrame:
    """The predict driver (reference model.py:1313-1417 data side): fit the
    stand-in seasonal-mean estimator on ALL history, score the next-7-day
    future grid (W10). Oracle recomputes the fit (per-(series, dow) and
    per-series means over all history) and the COALESCE fallback in SQL."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", season="dow", blend=0.0)
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    return _fill(df, ["predicted_v"])


SQL_PREDICT_FUTURE = f"""
    WITH daily AS ({_DAILY_SQL}),
    s AS (SELECT event_type, isodow(d) AS dw, avg(v) AS sm
          FROM daily GROUP BY 1, 2),
    g AS (SELECT event_type, avg(v) AS gm FROM daily GROUP BY 1),
    f AS (
        SELECT t.event_type, fd.d
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    )
    SELECT f.event_type, f.d,
           COALESCE(round(COALESCE(s.sm, g.gm), 6), {NULLF}) AS predicted_v
    FROM f
    JOIN g ON g.event_type = f.event_type
    LEFT JOIN s ON s.event_type = f.event_type AND s.dw = isodow(f.d)
"""


_IMP_FEATURES = ["v_lag1", "v_lag2", "v_mean_roll7_lag1", "v_sum_roll7_lag1",
                 "v_min_roll7_lag1", "v_max_roll7_lag1", "day_of_week"]


def q_importance_summary_daily(sf_dir: str) -> pd.DataFrame:
    """The reference's SHAP narrative + alert, data side (reference
    interpret.py:196-255 ``summarize_shap`` → ``self.alerts["shap"]``):
    engineer the daily features, rank them by single-feature R² against
    the target, compute importance shares, classify "statistical"
    features by the reference's substring rule and raise the alert when
    their combined share exceeds 0.33. Oracle recomputes every feature
    with window functions and the R² as ``round(corr(x, v)^2, 6)``."""
    from forecastframe_ray.pipelines import interpret as interp

    fr = _daily_frame(sf_dir)
    fr.lag_features("v", [1, 2])
    fr.calc_statistical_features("v", windows=7,
                                 aggregations=["mean", "sum", "min", "max"],
                                 lag=1, min_periods=1)
    fr.calc_datetime_features(["day_of_week"])
    return interp.importance_summary(fr.dataset, _IMP_FEATURES, "v")


SQL_IMPORTANCE_SUMMARY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               epoch_us(d) // {DAY_US} AS dn,
               LAG(v, 1) OVER w AS v_lag1,
               LAG(v, 2) OVER w AS v_lag2
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    feats AS (
        SELECT v, v_lag1, v_lag2,
               avg(v_lag1) OVER w AS v_mean_roll7_lag1,
               sum(v_lag1) OVER w AS v_sum_roll7_lag1,
               min(v_lag1) OVER w AS v_min_roll7_lag1,
               max(v_lag1) OVER w AS v_max_roll7_lag1,
               CAST(isodow(d) - 1 AS DOUBLE) AS day_of_week
        FROM l WINDOW w AS (PARTITION BY event_type ORDER BY dn
                            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    c AS (
        SELECT round(pow(corr(v_lag1, v), 2), 6) AS v_lag1,
               round(pow(corr(v_lag2, v), 2), 6) AS v_lag2,
               round(pow(corr(v_mean_roll7_lag1, v), 2), 6)
                   AS v_mean_roll7_lag1,
               round(pow(corr(v_sum_roll7_lag1, v), 2), 6)
                   AS v_sum_roll7_lag1,
               round(pow(corr(v_min_roll7_lag1, v), 2), 6)
                   AS v_min_roll7_lag1,
               round(pow(corr(v_max_roll7_lag1, v), 2), 6)
                   AS v_max_roll7_lag1,
               round(pow(corr(day_of_week, v), 2), 6) AS day_of_week
        FROM feats
    ),
    u AS (UNPIVOT c ON COLUMNS(*) INTO NAME feature VALUE r2),
    t AS (
        SELECT feature, r2,
               (feature LIKE '%ewma_roll%' OR feature LIKE '%sum_roll%'
                OR feature LIKE '%mean_roll%') AS is_statistical,
               sum(r2) OVER () AS tot,
               sum(CASE WHEN (feature LIKE '%ewma_roll%'
                              OR feature LIKE '%sum_roll%'
                              OR feature LIKE '%mean_roll%')
                        THEN r2 ELSE 0 END) OVER () AS stat_tot
        FROM u
    )
    SELECT feature, r2,
           round(r2 / tot, 6) AS share,
           CAST(row_number() OVER (ORDER BY r2 DESC, feature ASC) AS BIGINT)
               AS rank,
           is_statistical,
           round(stat_tot / tot, 6) AS stat_share,
           round(stat_tot / tot, 6) > 0.33 AS alert
    FROM t ORDER BY feature
"""


def q_quantile_loss_naive(sf_dir: str) -> pd.DataFrame:
    """The reference's M5 quantile (pinball) scoring metric
    (model.py:136-149) over the naive lag-1 daily forecast, at the three
    quantiles the M5 premade grids sweep — distributed partial sums, one
    tiny driver merge. Oracle recomputes the pinball loss per quantile."""
    fr = _daily_frame(sf_dir).lag_features("v", [1])
    out = metrics.quantile_loss(fr.dataset, "v", "v_lag1",
                                quantiles=[0.1, 0.5, 0.9])
    return _round(out[["quantile", "n", "loss"]], ["loss"], 4)


SQL_QUANTILE_LOSS_NAIVE = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    ),
    e AS (SELECT v, lv FROM l WHERE lv IS NOT NULL AND v IS NOT NULL),
    q AS (SELECT unnest([0.1, 0.5, 0.9]) AS quantile)
    SELECT q.quantile,
           count(*) AS n,
           round(avg(CASE WHEN v >= lv THEN q.quantile * (v - lv)
                          ELSE (1 - q.quantile) * (lv - v) END), 4) AS loss
    FROM e CROSS JOIN q GROUP BY q.quantile ORDER BY q.quantile
"""


def q_distinct_users_daily_kmv(sf_dir: str) -> pd.DataFrame:
    """Mergeable KMV distinct-count sketch per (event_type, day) — the
    continuous-aggregate COUNT(DISTINCT) the exact tier cascade cannot
    carry algebraically (north_rule retention-tier scope; sketch merge is
    associative like the (count, sum, min, max, Σx²) carry). k=1024 sits
    above this table's per-bucket cardinality, so the sketch runs in its
    exact regime and the oracle pins count(DISTINCT) bit-for-bit; the
    SAME code path estimates past k (gated by distinct_users_kmv_gate)."""
    from forecastframe_ray.stages.sketch import distinct_sketch

    ev = _read(sf_dir, "events", ["event_type", "ts", "user_id"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["d"] = b["ts"].dt.floor("D")
        return b.drop(columns=["ts"])

    sk = distinct_sketch(ev.map_batches(day_fn, batch_format="pandas"),
                         ["event_type", "d"], "user_id",
                         k=1024, num_partitions=_NP)
    df = sk.to_pandas()
    assert bool(df["is_exact"].all())  # cardinality < k on this table
    df["distinct_users"] = df["distinct_est"].astype("int64")
    return df[["event_type", "d", "distinct_users"]]


SQL_DISTINCT_USERS_DAILY = """
    SELECT event_type, date_trunc('day', ts) AS d,
           count(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY 1, 2
"""


def q_distinct_users_kmv_gate(sf_dir: str) -> pd.DataFrame:
    """KMV estimation-regime gate (ann_ivf_recall pattern): a k=64 sketch
    per event_type over the full span (distinct users > k → the
    (k−1)/U(k) estimator is live) must land within 25% of exact
    (≈ 2σ at k=64); ``n_exact`` itself comes from the engine's k=4096
    exact-regime sketch and is value-oracled against count(DISTINCT)."""
    from forecastframe_ray.stages.sketch import distinct_sketch

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    est = distinct_sketch(ev, ["event_type"], "user_id",
                          k=64, num_partitions=8).to_pandas()
    exact = distinct_sketch(ev, ["event_type"], "user_id",
                            k=4096, num_partitions=8).to_pandas()
    assert bool(exact["is_exact"].all())
    out = exact[["event_type"]].copy()
    out["n_exact"] = exact["distinct_est"].astype("int64")
    rel_err = np.abs(est.set_index("event_type").loc[
        out["event_type"], "distinct_est"].to_numpy()
        - out["n_exact"].to_numpy()) / out["n_exact"].to_numpy()
    out["err_ok"] = rel_err <= 0.25
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DISTINCT_USERS_KMV_GATE = """
    SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS err_ok
    FROM events GROUP BY 1 ORDER BY 1
"""


def q_distinct_users_daily_cascade(sf_dir: str) -> pd.DataFrame:
    """The CASCADE path of the distinct-count continuous aggregate: per-1h
    KMV sketches of user_id merged up to daily buckets by pure sketch
    merge (distinct_tiers '1d' tier) — never re-reading the raw stream,
    exactly how the retention tiers maintain COUNT(DISTINCT) at scale.
    k=1024 keeps this table in the exact regime, so the oracle pins the
    merged result against count(DISTINCT) bit-for-bit."""
    from forecastframe_ray.stages.sketch import distinct_tiers

    ev = _read(sf_dir, "events", ["event_type", "ts", "user_id"])
    tiers = distinct_tiers(ev, "ts", "user_id", group_keys=["event_type"],
                           k=1024, num_partitions=_NP)
    df = tiers["1d"].to_pandas()
    assert bool(df["is_exact"].all())
    df["d"] = pd.to_datetime(df["bucket_us"], unit="us")
    df["distinct_users"] = df["distinct_est"].astype("int64")
    return df[["event_type", "d", "distinct_users"]]


def q_quantile_sketch_gate_daily(sf_dir: str) -> pd.DataFrame:
    """Mergeable quantile-histogram gate (DDSketch/HdrHistogram bucket
    family, stages/sketch.py): the ε=1% log-bucketed histogram's p50/p90
    must land within 5% of the exact distributed quantiles (2ε plus
    disc-vs-interpolated slack); the exact quantiles themselves are
    value-oracled against DuckDB ``quantile_cont``."""
    from forecastframe_ray.pipelines import interpret as interp
    from forecastframe_ray.stages import sketch as SK

    daily = _bucket_series(sf_dir, DAY_US, "d")
    exact = interp.grouped_quantiles(daily, ["event_type"], "v",
                                     qs=(0.5, 0.9))
    sk = SK.quantile_sketch(daily, ["event_type"], "v",
                            eps=0.01, num_partitions=8).to_pandas() \
        .set_index("event_type")
    out = exact.copy()
    for q, col in ((0.5, "q50"), (0.9, "q90")):
        est = np.array([
            SK.hist_quantile(*SK.hist_from_bytes(
                sk.loc[et, "qhist"]), q, eps=0.01)
            for et in out["event_type"]])
        out[f"{col}_sketch_ok"] = np.abs(
            est / out[col].to_numpy() - 1.0) <= 0.05
    out = _round(out, ["q50", "q90"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_QUANTILE_SKETCH_GATE = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type,
           round(quantile_cont(v, 0.5), 6) AS q50,
           round(quantile_cont(v, 0.9), 6) AS q90,
           true AS q50_sketch_ok,
           true AS q90_sketch_ok
    FROM daily GROUP BY 1 ORDER BY 1
"""


def q_top_users_sketch_daily(sf_dir: str) -> pd.DataFrame:
    """Heavy-hitters continuous aggregate (Misra–Gries, stages/sketch.py):
    top-3 users per event_type by event count. k=512 exceeds this table's
    per-group cardinality, so the summary is in its exact-counts regime
    and the oracle pins counts and ranking bit-for-bit (ties broken by
    user_id); the estimation regime's never-overcount / bounded-undercount
    / guaranteed-containment contract is pinned by tests/test_sketch.py."""
    from forecastframe_ray.stages.sketch import topk_sketch

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    sk = topk_sketch(ev, ["event_type"], "user_id",
                     k=512, num_partitions=8).to_pandas()
    sk = sk.sort_values(["event_type", "mg_count", "user_id"],
                        ascending=[True, False, True])
    top = sk.groupby("event_type", sort=True).head(3).reset_index(drop=True)
    top["rank"] = top.groupby("event_type").cumcount() + 1
    top["mg_count"] = top["mg_count"].astype("int64")
    top["rank"] = top["rank"].astype("int64")
    return top[["event_type", "rank", "user_id", "mg_count"]]


SQL_TOP_USERS_SKETCH = """
    WITH c AS (
        SELECT event_type, user_id, count(*) AS mg_count
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, user_id, mg_count,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY mg_count DESC, user_id ASC)
                   AS rank
        FROM c
    )
    SELECT event_type, rank, user_id, mg_count
    FROM r WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# real fitted estimator: per-series linear trend (OLS / ridge)
# ---------------------------------------------------------------------------

def q_predict_linear_daily(sf_dir: str) -> pd.DataFrame:
    """The predict driver with a REAL fitted estimator (reference
    model.py:802-953 fit + model.py:1313-1417 predict, engine-native): fit a
    per-series linear trend (OLS of v on the day index, centered per series)
    on ALL history via distributed partial sums, then score the next-7-day
    future grid (W10). The oracle recomputes the identical closed-form fit
    (base-centered Σx/Σy/Σx²/Σxy → slope/intercept) in SQL term-for-term."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", estimator="linear_trend",
                       l2=0.0)
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    return _fill(df, ["predicted_v"])


SQL_PREDICT_LINEAR = f"""
    WITH daily AS ({_DAILY_SQL}),
    d2 AS (SELECT event_type, epoch_us(d) // {DAY_US} AS dn, v
           FROM daily WHERE v IS NOT NULL),
    b AS (SELECT event_type, min(dn) AS base FROM d2 GROUP BY 1),
    s AS (SELECT d2.event_type,
                 CAST(count(*) AS DOUBLE) AS n,
                 sum(CAST(dn - base AS DOUBLE)) AS sx,
                 sum(v) AS sy,
                 sum(CAST(dn - base AS DOUBLE)
                     * CAST(dn - base AS DOUBLE)) AS sxx,
                 sum(CAST(dn - base AS DOUBLE) * v) AS sxy,
                 min(base) AS base
          FROM d2 JOIN b USING (event_type) GROUP BY d2.event_type),
    m0 AS (SELECT event_type, base, n, sx, sy,
                  CASE WHEN (sxx - sx * sx / n + 0.0) = 0.0 THEN 0.0
                       ELSE (sxy - sx * sy / n) / (sxx - sx * sx / n + 0.0)
                  END AS slope
           FROM s),
    m AS (SELECT event_type, base, slope,
                 sy / n - slope * (sx / n) AS icept
          FROM m0),
    f AS (SELECT t.event_type, fd.d
          FROM (SELECT DISTINCT event_type FROM daily) t
          CROSS JOIN (
              SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                            maxd + INTERVAL 7 DAY,
                                            INTERVAL 1 DAY)) AS d
              FROM (SELECT max(d) AS maxd FROM daily)
          ) fd)
    SELECT f.event_type, f.d,
           COALESCE(round(m.icept + m.slope
                          * CAST(epoch_us(f.d) // {DAY_US} - m.base
                                 AS DOUBLE), 6),
                    {NULLF}) AS predicted_v
    FROM f JOIN m ON m.event_type = f.event_type
"""


# ---------------------------------------------------------------------------
# as-of join (nearest-prior-timestamp attach; stages/join.py asof_join)
# ---------------------------------------------------------------------------

def q_asof_join_events(sf_dir: str) -> pd.DataFrame:
    """Distributed as-of join: attach to every ``purchase`` event the user's
    most recent PRIOR ``click`` activity (summed per (user, ts) so ties are
    impossible and the match is deterministic). Oracle is DuckDB's native
    ``ASOF LEFT JOIN`` — same backward/inclusive semantics as the engine's
    per-partition ``merge_asof`` kernel."""
    from forecastframe_ray.stages.join import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts", "value"])

    def purchases(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["event_type"] == "purchase",
                     ["event_id", "user_id", "ts"]]

    def clicks(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["event_type"] == "click", ["user_id", "ts", "value"]]

    left = ev.map_batches(purchases, batch_format="pandas")
    right = hash_aggregate(ev.map_batches(clicks, batch_format="pandas"),
                           ["user_id", "ts"], {"click_v": ("value", "sum")},
                           num_partitions=_NP)

    def round_right(b: pd.DataFrame) -> pd.DataFrame:
        b["click_v"] = np.round(b["click_v"].to_numpy(dtype=np.float64), 6)
        return b

    out = asof_join(left, right.map_batches(round_right,
                                            batch_format="pandas"),
                    on=["user_id"], left_ts="ts", num_partitions=_NP)
    df = out.to_pandas()[["event_id", "user_id", "ts", "ts_r", "click_v"]]
    return _fill(df, ["click_v"])


SQL_ASOF_JOIN_EVENTS = f"""
    WITH l AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    r AS (SELECT user_id, ts AS ts_r, round(sum(value), 6) AS click_v
          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT l.event_id, l.user_id, l.ts, r.ts_r,
           COALESCE(r.click_v, {NULLF}) AS click_v
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts_r
"""


# ---------------------------------------------------------------------------
# range (interval) join — purchases inside 7-day signup windows
# ---------------------------------------------------------------------------

def q_range_join_events(sf_dir: str) -> pd.DataFrame:
    """Distributed range join (stages/join.py range_join): attach every
    ``purchase`` event to each 7-day window opened by the same user's
    ``signup`` events ([ts, ts+7d), inner — a purchase in k overlapping
    windows emits k rows). Oracle is the plain inequality join in SQL."""
    from forecastframe_ray.stages.join import range_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts", "value"])

    def purchases(b: pd.DataFrame) -> pd.DataFrame:
        out = b.loc[b["event_type"] == "purchase",
                    ["event_id", "user_id", "ts", "value"]].copy()
        out["pv"] = np.round(out["value"].to_numpy(dtype=np.float64), 6)
        return out.drop(columns="value")

    def windows(b: pd.DataFrame) -> pd.DataFrame:
        w = b.loc[b["event_type"] == "signup",
                  ["event_id", "user_id", "ts"]].copy()
        w = w.rename(columns={"event_id": "signup_id", "ts": "w_start"})
        w["w_end"] = w["w_start"] + pd.Timedelta(days=7)
        return w

    out = range_join(ev.map_batches(purchases, batch_format="pandas"),
                     ev.map_batches(windows, batch_format="pandas"),
                     on=["user_id"], left_ts="ts", start_col="w_start",
                     end_col="w_end", how="inner", closed="left",
                     num_partitions=_NP)
    return out.to_pandas()[["event_id", "user_id", "ts", "pv",
                            "signup_id", "w_start", "w_end"]]


SQL_RANGE_JOIN_EVENTS = """
    WITH p AS (SELECT event_id, user_id, ts, round(value, 6) AS pv
               FROM events WHERE event_type = 'purchase'),
    w AS (SELECT event_id AS signup_id, user_id, ts AS w_start,
                 ts + INTERVAL 7 DAY AS w_end
          FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id, p.ts, p.pv,
           w.signup_id, w.w_start, w.w_end
    FROM p JOIN w ON p.user_id = w.user_id
                 AND p.ts >= w.w_start AND p.ts < w.w_end
"""


# ---------------------------------------------------------------------------
# sessionization (gap-based session assignment; stages/window_ops.op_sessionize)
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800  # 30-minute inactivity gap (classic web-analytics cut)


def _sessionized_events(sf_dir: str):
    """events → per-user gap-based session ids via the fused keyed window
    stage (one hash shuffle on user_id, vectorized diff+cumsum kernel)."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return keyed_window_stage(
        ev, ["user_id"], "ts",
        [{"op": "sessionize", "gap_seconds": _SESSION_GAP_S}],
        num_partitions=_NP)


def q_sessionize_events(sf_dir: str) -> pd.DataFrame:
    """Row-level session assignment: (event_id, user_id, ts, session_id)
    where session_id is 1-based per user and increments whenever the gap to
    the user's previous event exceeds 30 minutes."""
    df = _sessionized_events(sf_dir).to_pandas()
    df = df[["event_id", "user_id", "ts", "session_id"]]
    df["session_id"] = df["session_id"].astype("int64")
    return df.sort_values("event_id", kind="mergesort").reset_index(drop=True)


SQL_SESSIONIZE_EVENTS = f"""
    WITH b AS (
        SELECT event_id, user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL {_SESSION_GAP_S} SECOND
                    THEN 1 ELSE 0 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT event_id, user_id, ts,
           CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM b
"""


def q_session_stats_events(sf_dir: str) -> pd.DataFrame:
    """Per-session aggregates over the sessionized stream: event count,
    start/end, duration in seconds. One extra coarse-hash aggregate on the
    already-partitioned (user_id, session_id) keys."""
    sess = _sessionized_events(sf_dir)
    agg = hash_aggregate(
        sess, ["user_id", "session_id"],
        {"n_events": ("event_id", "count"),
         "session_start": ("ts", "min"),
         "session_end": ("ts", "max")},
        num_partitions=_NP)
    df = agg.to_pandas()
    df["session_id"] = df["session_id"].astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    df["duration_us"] = ((df["session_end"] - df["session_start"])
                         .astype("timedelta64[us]").astype("int64"))
    df = df[["user_id", "session_id", "n_events", "session_start",
             "session_end", "duration_us"]]
    return df.sort_values(["user_id", "session_id"],
                          kind="mergesort").reset_index(drop=True)


SQL_SESSION_STATS_EVENTS = f"""
    WITH s AS ({SQL_SESSIONIZE_EVENTS})
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT)
               AS duration_us
    FROM s GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# expanding (cumulative) stats + per-series row numbers
# ---------------------------------------------------------------------------

def q_expanding_daily_events(sf_dir: str) -> pd.DataFrame:
    """Expanding sum/mean/max of the daily value series plus the 1-based
    row number, all fused into ONE keyed window stage pass (one shuffle)."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    out = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "expanding_stats", "features": ["v"],
          "aggregations": ["sum", "mean", "max"]},
         {"op": "row_number", "out_name": "rn"}],
        num_partitions=_NP)
    df = out.to_pandas()[["event_type", "d", "v", "v_expanding_sum",
                          "v_expanding_mean", "v_expanding_max", "rn"]]
    df = _round(df, ["v_expanding_sum", "v_expanding_mean",
                     "v_expanding_max"], 6)
    return df.sort_values(["event_type", "d"],
                          kind="mergesort").reset_index(drop=True)


SQL_EXPANDING_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           round(SUM(v) OVER w, 6) AS v_expanding_sum,
           round(AVG(v) OVER w, 6) AS v_expanding_mean,
           round(MAX(v) OVER w, 6) AS v_expanding_max,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
                AS BIGINT) AS rn
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d ROWS UNBOUNDED PRECEDING)
"""


# ---------------------------------------------------------------------------
# hopping (sliding) event-time windows (pipelines/rollup.hopping_window_aggregate)
# ---------------------------------------------------------------------------

_HOP_WINDOW_US = 3 * HOUR_US
_HOP_SLIDE_US = HOUR_US


def q_hopping_3h1h_events(sf_dir: str) -> pd.DataFrame:
    """3-hour windows hopping hourly over the event stream, per event_type:
    each event lands in exactly 3 overlapping windows."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    out = rollup.hopping_window_aggregate(
        ev, ["event_type"], "ts", "value",
        window_us=_HOP_WINDOW_US, slide_us=_HOP_SLIDE_US,
        num_partitions=_NP)
    df = out.to_pandas()
    df["n_events"] = df["n_events"].astype("int64")
    df = _round(df, ["sum_val"], 6)
    df = df[["event_type", "window_start_us", "n_events", "sum_val"]]
    return df.sort_values(["event_type", "window_start_us"],
                          kind="mergesort").reset_index(drop=True)


SQL_HOPPING_3H1H_EVENTS = f"""
    WITH e AS (SELECT event_type, epoch_us(ts) AS us, value FROM events),
    x AS (SELECT event_type, value,
                 unnest(generate_series((us - {_HOP_WINDOW_US}) // {_HOP_SLIDE_US} + 1,
                                        us // {_HOP_SLIDE_US}, 1)) AS k
          FROM e)
    SELECT event_type, CAST(k * {_HOP_SLIDE_US} AS BIGINT) AS window_start_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_val
    FROM x GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# reshape: pivot (long → wide) and melt (wide → long) — stages/reshape.py
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_daily_events(sf_dir: str) -> pd.DataFrame:
    """Daily value series pivoted wide: one row per day, one column per
    event_type (null-sentinel where a type had no events that day)."""
    from forecastframe_ray.stages import reshape

    daily = _bucket_series(sf_dir, DAY_US, "d")
    cats = reshape.distinct_categories(daily, "event_type",
                                       num_partitions=_NP)
    assert cats == _EVENT_TYPES, cats  # oracle hardcodes the column axis
    wide = reshape.pivot_wide(daily, ["d"], "event_type", "v", cats,
                              num_partitions=_NP)
    df = wide.to_pandas()
    names = [f"v_{c}" for c in _EVENT_TYPES]
    df = _round(df, names, 6)
    df = _fill(df, names)
    return df[["d"] + names].sort_values("d").reset_index(drop=True)


SQL_PIVOT_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT d,
           {", ".join(
               f"COALESCE(round(max(CASE WHEN event_type = '{c}' THEN v END), 6), {NULLF}) AS v_{c}"
               for c in _EVENT_TYPES)}
    FROM daily GROUP BY d
"""


def q_melt_roundtrip_daily(sf_dir: str) -> pd.DataFrame:
    """Pivot wide then melt back to long (dropping the null cells): the
    roundtrip must reproduce the daily series exactly."""
    from forecastframe_ray.stages import reshape

    daily = _bucket_series(sf_dir, DAY_US, "d")
    wide = reshape.pivot_wide(daily, ["d"], "event_type", "v", _EVENT_TYPES,
                              num_partitions=_NP)
    names = [f"v_{c}" for c in _EVENT_TYPES]
    long = reshape.melt_long(wide, ["d"], names, var_name="variable",
                             value_name="value", drop_null=True)
    df = long.to_pandas()
    df = _round(df, ["value"], 6)
    return df[["d", "variable", "value"]].sort_values(
        ["d", "variable"], kind="mergesort").reset_index(drop=True)


SQL_MELT_ROUNDTRIP_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT d, 'v_' || event_type AS variable, round(v, 6) AS value
    FROM daily
"""


# ---------------------------------------------------------------------------
# grouped top-k (stages/topk.py) — k best rows per group, no global sort
# ---------------------------------------------------------------------------

def q_topk_per_type_events(sf_dir: str) -> pd.DataFrame:
    """Top-3 events by value within each event_type (event_id tiebreak →
    deterministic across any block layout)."""
    from forecastframe_ray.stages.topk import grouped_topk

    ev = _read(sf_dir, "events", ["event_id", "event_type", "ts", "value"])
    top = grouped_topk(ev, ["event_type"], "value", k=3, descending=True,
                       tiebreak=["event_id"], num_partitions=_NP)
    df = top.to_pandas()
    df = _round(df, ["value"], 6)
    df = df[["event_type", "event_id", "ts", "value"]]
    return df.sort_values(["event_type", "event_id"],
                          kind="mergesort").reset_index(drop=True)


SQL_TOPK_PER_TYPE_EVENTS = """
    SELECT event_type, event_id, ts, round(value, 6) AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY value DESC, event_id) AS rn
          FROM events)
    WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# winsorize (per-group quantile clip) — functions/scalers.winsorize_clip
# ---------------------------------------------------------------------------

def q_winsorize_events(sf_dir: str) -> pd.DataFrame:
    """Clip event values to each type's exact [p5, p95] quantile band."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    out = scalers.winsorize_clip(ev, ["event_type"], "value",
                                 q_lo=0.05, q_hi=0.95)
    df = out.to_pandas()
    df = _round(df, ["value", "value_winsorized"], 6)
    df = df[["event_id", "event_type", "value", "value_winsorized"]]
    return df.sort_values("event_id").reset_index(drop=True)


SQL_WINSORIZE_EVENTS = """
    WITH q AS (SELECT event_type,
                      quantile_cont(value, 0.05) AS ql,
                      quantile_cont(value, 0.95) AS qh
               FROM events GROUP BY 1)
    SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
           round(least(greatest(e.value, q.ql), q.qh), 6)
               AS value_winsorized
    FROM events e JOIN q USING (event_type)
"""


# ---------------------------------------------------------------------------
# bloom-prefiltered semi-join (stages/bloom.py) — exact result, scale path
# ---------------------------------------------------------------------------

def q_bloom_semi_join_orders(sf_dir: str) -> pd.DataFrame:
    """Orders from customers with acctbal > 7000, via the Bloom prefilter +
    exact verify path — result must equal the plain semi-join."""
    from forecastframe_ray.stages.bloom import bloom_semi_join

    od = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus",
                                  "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    rich = (cust.map_batches(
        lambda b: b.loc[b["c_acctbal"] > 7000, ["c_custkey"]]
                   .rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas"))
    kept = bloom_semi_join(od, rich, on=["o_custkey"], fpp=0.01,
                           num_partitions=_NP)
    agg = hash_aggregate(kept, ["o_orderstatus"],
                         {"n": ("o_custkey", "count"),
                          "total": ("o_totalprice", "sum")},
                         num_partitions=4)
    df = agg.to_pandas()
    df["n"] = df["n"].astype("int64")
    df = _round(df, ["total"], 4)
    return df[["o_orderstatus", "n", "total"]].sort_values(
        "o_orderstatus").reset_index(drop=True)


SQL_BLOOM_SEMI_JOIN_ORDERS = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_acctbal > 7000)
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# rolling correlation between two series features (op_rolling_corr)
# ---------------------------------------------------------------------------

def q_rolling_corr_daily(sf_dir: str) -> pd.DataFrame:
    """7-row rolling Pearson correlation between each event_type's daily
    value sum and daily event count."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def floor_fn(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        b = b[["event_type", "value"]].copy()
        b["d"] = pd.to_datetime((us // DAY_US) * DAY_US, unit="us")
        return b

    daily = hash_aggregate(ev.map_batches(floor_fn, batch_format="pandas"),
                           ["event_type", "d"],
                           {"v": ("value", "sum"), "n": ("value", "count")},
                           num_partitions=_NP)

    def round_fn(b: pd.DataFrame) -> pd.DataFrame:
        b["v"] = np.round(b["v"].to_numpy(dtype=np.float64), 6)
        b["n"] = b["n"].astype("int64")
        return b

    out = keyed_window_stage(
        daily.map_batches(round_fn, batch_format="pandas"),
        ["event_type"], "d",
        [{"op": "rolling_corr", "feature_x": "v", "feature_y": "n",
          "window": 7, "out_name": "v_n_corr7"}],
        num_partitions=_NP)
    df = out.to_pandas()[["event_type", "d", "v", "n", "v_n_corr7"]]
    df = _round(df, ["v_n_corr7"], 6)
    df = _fill(df, ["v_n_corr7"])
    return df.sort_values(["event_type", "d"],
                          kind="mergesort").reset_index(drop=True)


SQL_ROLLING_CORR_DAILY = f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               round(sum(value), 6) AS v, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, d, v, n,
           COALESCE(round(corr(v, n) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6), {NULLF})
               AS v_n_corr7
    FROM daily
"""


# ---------------------------------------------------------------------------
# PII redaction (pipelines/pii.py) — RE2-compatible patterns, DuckDB oracle
# ---------------------------------------------------------------------------

def _augment_pii(b: pd.DataFrame) -> pd.DataFrame:
    """Deterministically plant one email/IP/phone in every 3rd doc so the
    redaction is exercised on a corpus that has no natural PII (same CASE
    expression as the oracle's ``aug`` CTE)."""
    d = b["doc_id"].astype("int64")
    planted = (b["text"] + " contact u" + d.astype(str)
               + "@mail.example.com ip 10.0." + (d % 256).astype(str)
               + "." + ((d * 7) % 256).astype(str)
               + " tel +1 555 0" + (100 + d % 900).astype(str))
    orig = b["text"]
    b = b[["doc_id"]].copy()
    b["text"] = planted.where(d % 3 == 0, orig)
    return b


def q_pii_redaction_documents(sf_dir: str) -> pd.DataFrame:
    """Email/IPv4/phone redaction with per-class match counts; byte-exact
    vs the DuckDB ``regexp_replace`` oracle (patterns are RE2∩re-safe)."""
    from forecastframe_ray.pipelines.pii import redact_pii

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = redact_pii(docs.map_batches(_augment_pii, batch_format="pandas"),
                     text_col="text", count=True)
    df = out.to_pandas()
    df = df[["doc_id", "n_emails", "n_ips", "n_phones", "text_redacted"]]
    return df.sort_values("doc_id").reset_index(drop=True)


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PII_PHONE = r"\+[0-9][0-9 ()-]{6,14}[0-9]"

SQL_PII_REDACTION = f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               text || ' contact u' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com ip 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.'
                    || CAST((doc_id * 7) % 256 AS VARCHAR)
                    || ' tel +1 555 0' || CAST(100 + doc_id % 900 AS VARCHAR)
             ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
      CAST(len(regexp_extract_all(text,
           '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(regexp_replace(text,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IP}')) AS BIGINT) AS n_ips,
      CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IP}', '<IP>', 'g'),
           '{_PII_PHONE}')) AS BIGINT) AS n_phones,
      regexp_replace(regexp_replace(regexp_replace(text,
          '{_PII_EMAIL}', '<EMAIL>', 'g'),
          '{_PII_IP}', '<IP>', 'g'),
          '{_PII_PHONE}', '<PHONE>', 'g') AS text_redacted
    FROM aug
"""


# ---------------------------------------------------------------------------
# train/eval n-gram decontamination (pipelines/decontaminate.py)
# ---------------------------------------------------------------------------

def q_decontaminate_documents(sf_dir: str) -> pd.DataFrame:
    """GPT-3-style 8-gram decontamination: eval side = every 10th doc,
    train side = the rest; per train doc the count of DISTINCT 8-grams
    shared with any eval doc (broadcast-probe path)."""
    from forecastframe_ray.pipelines.decontaminate import decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    train = docs.map_batches(lambda b: b[b["doc_id"] % 10 != 0],
                             batch_format="pandas")
    evald = docs.map_batches(lambda b: b[b["doc_id"] % 10 == 0],
                             batch_format="pandas")
    out = decontaminate(train, evald, n=8)
    df = out.to_pandas()
    df["contaminated"] = df["contaminated"].astype("int64")
    df = df[["doc_id", "n_overlap", "contaminated"]]
    return df.sort_values("doc_id").reset_index(drop=True)


SQL_DECONTAMINATE = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
    ),
    evalg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0),
    hits AS (
      SELECT gr.doc_id, count(DISTINCT gr.g) AS n_overlap
      FROM grams gr JOIN evalg e ON gr.g = e.g
      WHERE gr.doc_id % 10 <> 0 GROUP BY 1
    )
    SELECT d.doc_id, CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(COALESCE(h.n_overlap, 0) > 0 AS BIGINT) AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 10 <> 0
"""


# ---------------------------------------------------------------------------
# Gopher repetition signals (pipelines/textstats.repetition_batch)
# ---------------------------------------------------------------------------

def q_repetition_documents(sf_dir: str) -> pd.DataFrame:
    """Duplicate-line / top-2-gram / dup-5-gram repetition signals, emitted
    as EXACT integer numerators (``raw_counts=True`` — the float fractions
    hit the numpy-half-even vs SQL-half-away divergence on exact .5s).  The
    synthetic corpus has no newlines, so the line view is derived
    deterministically on both sides: ``replace(text, ' a ', chr(10))``
    (leftmost non-overlapping on both engines)."""
    from forecastframe_ray.pipelines.textstats import repetition_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_lines(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["text_l"] = b["text"].str.replace(" a ", "\n", regex=False)
        return b

    out = repetition_scores(docs.map_batches(add_lines,
                                             batch_format="pandas"),
                            text_col="text", line_col="text_l",
                            raw_counts=True)
    df = out.to_pandas()
    cols = ["n_lines", "n_distinct_lines", "dup_line_chars",
            "tot_line_chars", "top_2gram_chars", "dup_5gram_chars",
            "n_chars"]
    for c in cols:
        df[c] = df[c].astype("int64")
    df = df[["doc_id"] + cols]
    return df.sort_values("doc_id").reset_index(drop=True)


SQL_REPETITION_DOCS = r"""
    WITH base AS (
      SELECT doc_id, text, len(text) AS nchar,
             replace(text, ' a ', chr(10)) AS text_l
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM base
    ),
    g2c AS (
      SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g, count(*) AS c
      FROM toks, unnest(range(1, len(t))) AS u(i) GROUP BY 1, 2
    ),
    top2 AS (SELECT doc_id, max(c * len(g)) AS best FROM g2c GROUP BY 1),
    g5c AS (
      SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g, count(*) AS c
      FROM toks, unnest(range(1, len(t) - 3)) AS u(i) GROUP BY 1, 2
    ),
    dup5 AS (SELECT doc_id, sum(c * len(g)) AS dup FROM g5c
             WHERE c > 1 GROUP BY 1),
    lns AS (
      SELECT doc_id, x AS line FROM (
        SELECT doc_id, unnest(string_split(text_l, chr(10))) AS x FROM base)
      WHERE x <> ''
    ),
    lc AS (SELECT doc_id, line, count(*) AS c, len(line) AS sl
           FROM lns GROUP BY 1, 2),
    lagg AS (SELECT doc_id, sum(c) AS n, count(*) AS nd, sum(sl * c) AS tot,
                    sum(CASE WHEN c > 1 THEN sl * c ELSE 0 END) AS dup
             FROM lc GROUP BY 1)
    SELECT b.doc_id,
      CAST(COALESCE(l.n, 0) AS BIGINT) AS n_lines,
      CAST(COALESCE(l.nd, 0) AS BIGINT) AS n_distinct_lines,
      CAST(COALESCE(l.dup, 0) AS BIGINT) AS dup_line_chars,
      CAST(COALESCE(l.tot, 0) AS BIGINT) AS tot_line_chars,
      CAST(COALESCE(t2.best, 0) AS BIGINT) AS top_2gram_chars,
      CAST(COALESCE(d5.dup, 0) AS BIGINT) AS dup_5gram_chars,
      CAST(b.nchar AS BIGINT) AS n_chars
    FROM base b
    LEFT JOIN lagg l USING (doc_id)
    LEFT JOIN top2 t2 USING (doc_id)
    LEFT JOIN dup5 d5 USING (doc_id)
"""


# ---------------------------------------------------------------------------
# corpus construction: vocabulary + training chunks (pipelines/corpus.py)
# ---------------------------------------------------------------------------

def q_vocabulary_documents(sf_dir: str) -> pd.DataFrame:
    """Top-100 whitespace tokens corpus-wide, (count desc, token asc)."""
    from forecastframe_ray.pipelines.corpus import token_vocabulary

    docs = _read(sf_dir, "documents", ["text"])
    return token_vocabulary(docs, top_k=100, num_partitions=_NP)


SQL_VOCABULARY_DOCS = r"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    )
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM tok GROUP BY 1
    ORDER BY n DESC, token LIMIT 100
"""


def q_chunk_documents(sf_dir: str) -> pd.DataFrame:
    """32-token chunks, stride 24 (8-token overlap), tail chunks shorter."""
    from forecastframe_ray.pipelines.corpus import chunk_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    df = chunk_documents(docs, size=32, stride=24).to_pandas()
    return (df.sort_values(["doc_id", "chunk_id"])
              .reset_index(drop=True))


SQL_CHUNK_DOCS = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    )
    SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_id,
           CAST(least(32, len(t) - s) AS BIGINT) AS n_tokens,
           array_to_string(t[s + 1 : least(s + 32, len(t))], ' ')
               AS chunk_text
    FROM toks, unnest(range(0, len(t), 24)) AS u(s)
"""


# ---------------------------------------------------------------------------
# Gopher quality filter (pipelines/textstats.gopher_filter)
# ---------------------------------------------------------------------------

def q_gopher_filter_documents(sf_dir: str) -> pd.DataFrame:
    """Integer-exact Gopher filter flags + composite kept bit; same derived
    line view as ``repetition_documents``."""
    from forecastframe_ray.pipelines.textstats import gopher_filter

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_lines(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["text_l"] = b["text"].str.replace(" a ", "\n", regex=False)
        return b

    out = gopher_filter(docs.map_batches(add_lines, batch_format="pandas"),
                        text_col="text", line_col="text_l")
    df = out.to_pandas()
    cols = ["n_words", "f_words", "f_wordlen", "f_dupline", "f_top2",
            "f_dup5", "kept"]
    for c in cols:
        df[c] = df[c].astype("int64")
    return (df[["doc_id"] + cols].sort_values("doc_id")
              .reset_index(drop=True))


SQL_GOPHER_FILTER = r"""
    WITH base AS (
      SELECT doc_id, text, len(text) AS nchar,
             replace(text, ' a ', chr(10)) AS text_l
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM base
    ),
    words AS (
      SELECT doc_id, len(t) AS n_words,
             COALESCE(list_aggregate(list_transform(t, x -> len(x)),
                                     'sum'), 0) AS word_chars
      FROM toks
    ),
    g2c AS (
      SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g, count(*) AS c
      FROM toks, unnest(range(1, len(t))) AS u(i) GROUP BY 1, 2
    ),
    top2 AS (SELECT doc_id, max(c * len(g)) AS best FROM g2c GROUP BY 1),
    g5c AS (
      SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g, count(*) AS c
      FROM toks, unnest(range(1, len(t) - 3)) AS u(i) GROUP BY 1, 2
    ),
    dup5 AS (SELECT doc_id, sum(c * len(g)) AS dup FROM g5c
             WHERE c > 1 GROUP BY 1),
    lns AS (
      SELECT doc_id, x AS line FROM (
        SELECT doc_id, unnest(string_split(text_l, chr(10))) AS x FROM base)
      WHERE x <> ''
    ),
    lc AS (SELECT doc_id, line, count(*) AS c FROM lns GROUP BY 1, 2),
    lagg AS (SELECT doc_id, sum(c) AS n, count(*) AS nd FROM lc GROUP BY 1),
    flags AS (
      SELECT b.doc_id,
        CAST(w.n_words AS BIGINT) AS n_words,
        (w.n_words BETWEEN 5 AND 10000) AS f_words,
        (3 * w.n_words <= w.word_chars
         AND w.word_chars <= 10 * w.n_words) AS f_wordlen,
        (10 * (COALESCE(l.n, 0) - COALESCE(l.nd, 0))
         <= 3 * COALESCE(l.n, 0)) AS f_dupline,
        (5 * COALESCE(t2.best, 0) <= b.nchar) AS f_top2,
        (10 * COALESCE(d5.dup, 0) <= 3 * b.nchar) AS f_dup5
      FROM base b
      JOIN words w USING (doc_id)
      LEFT JOIN lagg l USING (doc_id)
      LEFT JOIN top2 t2 USING (doc_id)
      LEFT JOIN dup5 d5 USING (doc_id)
    )
    SELECT doc_id, n_words,
      CAST(f_words AS BIGINT) AS f_words,
      CAST(f_wordlen AS BIGINT) AS f_wordlen,
      CAST(f_dupline AS BIGINT) AS f_dupline,
      CAST(f_top2 AS BIGINT) AS f_top2,
      CAST(f_dup5 AS BIGINT) AS f_dup5,
      CAST(f_words AND f_wordlen AND f_dupline AND f_top2 AND f_dup5
           AS BIGINT) AS kept
    FROM flags
"""


# ---------------------------------------------------------------------------
# TF-IDF / unigram-LM corpus scoring (pipelines/tfidf.py)
# ---------------------------------------------------------------------------

def q_tfidf_topterms_documents(sf_dir: str) -> pd.DataFrame:
    """Top-3 TF-IDF terms per document, round-then-rank deterministic."""
    from forecastframe_ray.pipelines.tfidf import tfidf_top_terms

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = tfidf_top_terms(docs, k=3).to_pandas()
    out = out[["doc_id", "token", "tf", "tfidf"]] \
        .astype({"doc_id": "int64", "tf": "int64"})
    return out.sort_values(["doc_id", "token"]).reset_index(drop=True)


SQL_TFIDF_TOPTERMS = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    s AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             round(tf.tf * ln(n.n / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, token) AS rk
          FROM s)
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, tfidf
    FROM r WHERE rk <= 3
"""


def q_unigram_logprob_documents(sf_dir: str) -> pd.DataFrame:
    """CCNet-style corpus-LM quality score: per-doc mean token log-prob."""
    from forecastframe_ray.pipelines.tfidf import unigram_doc_logprob

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = unigram_doc_logprob(docs).to_pandas()
    out = out.astype({"doc_id": "int64", "n_tokens": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_UNIGRAM_LOGPROB = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    cnt AS (SELECT token, sum(tf) AS n FROM tf GROUP BY 1),
    tot AS (SELECT sum(n) AS t FROM cnt),
    sc AS (
      SELECT tf.doc_id,
             sum(tf.tf * ln(cnt.n / tot.t)) AS s,
             sum(tf.tf) AS m
      FROM tf JOIN cnt USING (token) CROSS JOIN tot
      GROUP BY 1
    )
    SELECT doc_id, CAST(m AS BIGINT) AS n_tokens,
           round(s / m, 6) AS lm_logprob
    FROM sc
"""


def q_stratified_sample_orders(sf_dir: str) -> pd.DataFrame:
    """Exact 40-per-priority deterministic stratified sample (md5 quota)."""
    from forecastframe_ray.stages.sample import stratified_sample

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority", "o_totalprice"])
    out = stratified_sample(orders, ["o_orderpriority"], "o_orderkey",
                            k=40).to_pandas()
    out = out[["o_orderkey", "o_orderpriority", "o_totalprice"]] \
        .astype({"o_orderkey": "int64"})
    return out.sort_values("o_orderkey").reset_index(drop=True)


SQL_STRATIFIED_SAMPLE_ORDERS = """
    WITH b AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)),
                                      1, 8)) AS BIGINT) AS bkt
      FROM orders
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                       ORDER BY bkt, o_orderkey) AS rk
          FROM b)
    SELECT o_orderkey, o_orderpriority, o_totalprice FROM r WHERE rk <= 40
"""


# ---------------------------------------------------------------------------
# rolling-baseline anomaly flags (composition: W1 mean+std -> integer flag)
# ---------------------------------------------------------------------------

def q_anomaly_daily_events(sf_dir: str) -> pd.DataFrame:
    """Per-series anomaly detection on the daily spine: flag days where the
    value leaves the trailing-7d lag-1 mean ± 2·std band. The comparison
    runs on ROUND(…,6) deviation/band on both engines so a boundary day
    cannot flip; days without a defined band (std needs ≥2 prior points)
    are never anomalies."""
    fr = _daily_frame(sf_dir).calc_statistical_features(
        "v", windows=7, aggregations=["mean", "std"], lag=1, min_periods=1)
    df = fr.to_pandas()[["event_type", "d", "v",
                         "v_mean_roll7_lag1", "v_std_roll7_lag1"]]
    dev = np.round(np.abs(df["v"].to_numpy(np.float64)
                          - df["v_mean_roll7_lag1"].to_numpy(np.float64)), 6)
    band = np.round(2.0 * df["v_std_roll7_lag1"].to_numpy(np.float64), 6)
    df["deviation"] = dev
    df["band"] = band
    df["anomaly"] = np.where(np.isnan(band), 0,
                             (dev > band).astype(np.int64)).astype("int64")
    df = df.drop(columns=["v_mean_roll7_lag1", "v_std_roll7_lag1"])
    df = _round(df, ["v"], 6)
    return _fill(df, ["deviation", "band"])


SQL_ANOMALY_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v, epoch_us(d) // {DAY_US} AS dn,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    ),
    w AS (
        SELECT event_type, d, v,
               round(abs(v - avg(lv) OVER w), 6) AS deviation,
               round(2 * stddev_samp(lv) OVER w, 6) AS band
        FROM l WINDOW w AS (PARTITION BY event_type ORDER BY dn
                            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, round(v, 6) AS v,
           COALESCE(deviation, {NULLF}) AS deviation,
           COALESCE(band, {NULLF}) AS band,
           CAST(CASE WHEN band IS NULL THEN 0
                     WHEN deviation > band THEN 1 ELSE 0 END
                AS BIGINT) AS anomaly
    FROM w
"""


# ---------------------------------------------------------------------------
# CCNet quality buckets (pipelines/tfidf.quality_buckets)
# ---------------------------------------------------------------------------

def q_quality_buckets_documents(sf_dir: str) -> pd.DataFrame:
    """Corpus-LM score terciles: head / middle / tail per document."""
    from forecastframe_ray.pipelines.tfidf import quality_buckets

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = quality_buckets(docs).to_pandas()
    out = out.astype({"doc_id": "int64", "n_tokens": "int64"})
    return (out[["doc_id", "n_tokens", "lm_logprob", "bucket"]]
            .sort_values("doc_id").reset_index(drop=True))


SQL_QUALITY_BUCKETS = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    cnt AS (SELECT token, sum(tf) AS n FROM tf GROUP BY 1),
    tot AS (SELECT sum(n) AS t FROM cnt),
    sc AS (
      SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
             round(sum(tf.tf * ln(cnt.n / tot.t)) / sum(tf.tf), 6)
                 AS lm_logprob
      FROM tf JOIN cnt USING (token) CROSS JOIN tot
      GROUP BY 1
    ),
    cuts AS (SELECT quantile_cont(lm_logprob, 1.0/3.0) AS c_lo,
                    quantile_cont(lm_logprob, 2.0/3.0) AS c_hi
             FROM sc)
    SELECT sc.doc_id, sc.n_tokens, sc.lm_logprob,
           CASE WHEN sc.lm_logprob <= cuts.c_lo THEN 'tail'
                WHEN sc.lm_logprob <= cuts.c_hi THEN 'middle'
                ELSE 'head' END AS bucket
    FROM sc CROSS JOIN cuts
"""


# ---------------------------------------------------------------------------
# cross-document duplicate spans (pipelines/decontaminate.self_overlap)
# ---------------------------------------------------------------------------

def q_dup_spans_documents(sf_dir: str) -> pd.DataFrame:
    """Per-doc count of distinct 8-grams shared with any OTHER document."""
    from forecastframe_ray.pipelines.decontaminate import self_overlap

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = self_overlap(docs, n=8).to_pandas()
    out = out.astype({"doc_id": "int64", "n_shared": "int64",
                      "has_dup_span": "bool"})
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_DUP_SPANS = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    dg AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
    ),
    gc AS (SELECT g, count(*) AS nd FROM dg GROUP BY 1),
    hits AS (
      SELECT dg.doc_id, count(*) AS n_shared
      FROM dg JOIN gc USING (g) WHERE gc.nd >= 2 GROUP BY 1
    )
    SELECT d.doc_id, CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
           COALESCE(h.n_shared, 0) > 0 AS has_dup_span
    FROM documents d LEFT JOIN hits h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# percent rank within series (stages/window_ops.op_percent_rank)
# ---------------------------------------------------------------------------

def q_percent_rank_daily(sf_dir: str) -> pd.DataFrame:
    """SQL percent_rank() twin over the daily spine: rank of each day's
    value within its series, rank-with-gaps ties, single-row series -> 0."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    out = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "percent_rank", "feature": "v", "out_name": "v_pct_rank"}],
        num_partitions=_NP)
    df = out.to_pandas()[["event_type", "d", "v", "v_pct_rank"]]
    return df.sort_values(["event_type", "d"],
                          kind="mergesort").reset_index(drop=True)


SQL_PERCENT_RANK_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           round(percent_rank() OVER (PARTITION BY event_type ORDER BY v),
                 6) AS v_pct_rank
    FROM daily
"""


# ---------------------------------------------------------------------------
# PMI bigram collocations (pipelines/corpus.pmi_bigrams)
# ---------------------------------------------------------------------------

def q_pmi_bigrams_documents(sf_dir: str) -> pd.DataFrame:
    """Top-50 within-doc adjacent-token collocations by PMI (c_xy >= 3)."""
    from forecastframe_ray.pipelines.corpus import pmi_bigrams

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return pmi_bigrams(docs, top_k=50, min_count=3)


SQL_PMI_BIGRAMS = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    uni AS (
      SELECT x AS token, count(*) AS n
      FROM (SELECT unnest(t) AS x FROM toks) GROUP BY 1
    ),
    bi AS (
      SELECT concat(t[i], ' ', t[i + 1]) AS bigram,
             t[i] AS x, t[i + 1] AS y, count(*) AS c_xy
      FROM toks, unnest(range(1, len(t))) AS u(i)
      GROUP BY 1, 2, 3
      HAVING count(*) >= 3
    ),
    tots AS (
      SELECT (SELECT sum(n) FROM uni) AS t_uni,
             (SELECT sum(c_xy) FROM bi) AS t_bi
    ),
    s AS (
      SELECT bi.bigram, bi.c_xy,
             round(ln((bi.c_xy / tots.t_bi)
                      / ((ux.n / tots.t_uni) * (uy.n / tots.t_uni))),
                   6) AS pmi
      FROM bi JOIN uni ux ON bi.x = ux.token
              JOIN uni uy ON bi.y = uy.token
              CROSS JOIN tots
    )
    SELECT bigram, CAST(c_xy AS BIGINT) AS c_xy, pmi
    FROM s ORDER BY pmi DESC, bigram LIMIT 50
"""


# ---------------------------------------------------------------------------
# JSON property extraction (functions/scalar.extract_json_int)
# ---------------------------------------------------------------------------

def q_json_props_events(sf_dir: str) -> pd.DataFrame:
    """Extract the integer ``k`` field from the JSON props bag (vectorized
    regex — no per-row parse) and profile it per event type."""
    from forecastframe_ray.functions.scalar import extract_json_int
    from forecastframe_ray.stages.agg import hash_aggregate

    ev = _read(sf_dir, "events", ["event_type", "props"])
    ext = extract_json_int(ev, "props", "k")

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["k"] = b["k"].astype("float64")  # NA -> NaN, skipna aggs below
        return b[["event_type", "k"]]

    out = hash_aggregate(ext.map_batches(pre, batch_format="pandas"),
                         ["event_type"],
                         {"n_k": ("k", "count"), "sum_k": ("k", "sum"),
                          "mean_k": ("k", "mean")},
                         num_partitions=8).to_pandas()
    out["n_k"] = out["n_k"].astype("int64")
    out["sum_k"] = out["sum_k"].astype("int64")
    out = _round(out, ["mean_k"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_JSON_PROPS_EVENTS = """
    SELECT event_type,
           count(k) AS n_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           round(avg(k), 6) AS mean_k
    FROM (SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# per-label embedding centroids (pipelines/similarity.label_centroids)
# ---------------------------------------------------------------------------

def q_label_centroids_embeddings(sf_dir: str) -> pd.DataFrame:
    """Per-label centroid vectors in long form (label, dim, n, centroid)."""
    from forecastframe_ray.pipelines.similarity import label_centroids

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    out = label_centroids(emb).to_pandas()
    out = out.astype({"label": "int64", "dim": "int64", "n": "int64"})
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


SQL_LABEL_CENTROIDS = """
    SELECT label, CAST(i AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n, round(avg(v), 6) AS centroid
    FROM (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    )
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint statistic per series (stages/window_ops.op_cusum)
# ---------------------------------------------------------------------------

def q_cusum_daily_events(sf_dir: str) -> pd.DataFrame:
    """Standardized CUSUM level-shift statistic on the daily spine: running
    sum of deviations from the series mean scaled by the series sample std,
    with a |cusum| > 2 shift flag (compared on the 6dp-rounded value on both
    engines). Degenerate series (single row / zero std) emit the NULLF
    sentinel and flag 0."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    out = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "cusum", "feature": "v", "threshold": 2.0}],
        num_partitions=_NP)
    df = out.to_pandas()[["event_type", "d", "v", "v_cusum", "v_shift_flag"]]
    df = _fill(df, ["v_cusum"])
    return df.sort_values(["event_type", "d"],
                          kind="mergesort").reset_index(drop=True)


SQL_CUSUM_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    stats AS (
        SELECT event_type, avg(v) AS m, stddev_samp(v) AS s
        FROM daily GROUP BY 1
    ),
    c AS (
        SELECT d.event_type, d.d, d.v,
               CASE WHEN st.s IS NULL OR st.s = 0 THEN NULL
                    ELSE round(sum(d.v - st.m) OVER (
                             PARTITION BY d.event_type ORDER BY d.d
                             ROWS UNBOUNDED PRECEDING) / st.s, 6) + 0.0
               END AS v_cusum
        FROM daily d JOIN stats st USING (event_type)
    )
    SELECT event_type, d, v,
           COALESCE(v_cusum, {NULLF}) AS v_cusum,
           CAST(COALESCE(abs(v_cusum) > 2.0, FALSE) AS BIGINT)
               AS v_shift_flag
    FROM c
"""


# ---------------------------------------------------------------------------
# additive seasonal decomposition (stages/window_ops.op_seasonal_decompose)
# ---------------------------------------------------------------------------

def q_seasonal_decompose_daily(sf_dir: str) -> pd.DataFrame:
    """Classical additive decomposition per series: trend = centered 7-ROW
    moving average (partial edges), seasonal = per-(series, weekday) mean of
    the detrended value, resid = v - trend - seasonal (resid computed from
    UNROUNDED parts on both engines; all outputs 6dp)."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    out = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "seasonal_decompose", "feature": "v", "ma_window": 7}],
        num_partitions=_NP)
    df = out.to_pandas()[["event_type", "d", "v", "v_trend", "v_seasonal",
                          "v_resid"]]
    return df.sort_values(["event_type", "d"],
                          kind="mergesort").reset_index(drop=True)


SQL_SEASONAL_DECOMPOSE_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (
        SELECT event_type, d, v,
               avg(v) OVER (PARTITION BY event_type ORDER BY d
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS trend
        FROM daily
    ),
    s AS (
        SELECT event_type, d, v, trend,
               avg(v - trend) OVER (PARTITION BY event_type, dayofweek(d))
                   AS seasonal
        FROM t
    )
    SELECT event_type, d, v,
           round(trend, 6) AS v_trend,
           round(seasonal, 6) AS v_seasonal,
           round(v - trend - seasonal, 6) AS v_resid
    FROM s
"""


# ---------------------------------------------------------------------------
# per-series autocorrelation (distributed raw-moment reduce over lag pairs)
# ---------------------------------------------------------------------------

def _lag_corr_table(sf_dir: str, lags: tuple[int, ...]) -> pd.DataFrame:
    """Per-series pairwise lag-k autocorrelations (the ``corr(v, LAG(v,k))``
    estimator): one keyed lag attach, vectorized per-batch product moments,
    and a tiny per-series sum aggregate — the driver only ever sees one row
    per series. Returns columns event_type, n{k}, r{k} (r NaN for <2 pairs
    or zero variance). Shared by the ACF and PACF queries so the estimator
    can never drift between them."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    lagged = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "lag", "features": ["v"], "lags": list(lags)}],
        num_partitions=_NP)

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        out = {"event_type": b["event_type"]}
        x = b["v"].to_numpy(np.float64)
        for k in lags:
            y = b[f"v_lag{k}"].to_numpy(np.float64)
            ok = ~np.isnan(y)
            xx = np.where(ok, x, 0.0)
            yy = np.where(ok, y, 0.0)
            out[f"n{k}"] = ok.astype(np.int64)
            out[f"sx{k}"], out[f"sy{k}"] = xx, yy
            out[f"sxy{k}"] = xx * yy
            out[f"sxx{k}"], out[f"syy{k}"] = xx * xx, yy * yy
        return pd.DataFrame(out)

    spec = {c: (c, "sum")
            for k in lags
            for c in (f"n{k}", f"sx{k}", f"sy{k}",
                      f"sxy{k}", f"sxx{k}", f"syy{k}")}
    agg = hash_aggregate(lagged.map_batches(moments, batch_format="pandas"),
                         ["event_type"], spec, num_partitions=_NP)
    df = agg.to_pandas()
    res = {"event_type": df["event_type"]}
    for k in lags:
        n = df[f"n{k}"].to_numpy(np.float64)
        sx, sy = df[f"sx{k}"].to_numpy(np.float64), \
            df[f"sy{k}"].to_numpy(np.float64)
        cov = n * df[f"sxy{k}"].to_numpy(np.float64) - sx * sy
        den = ((n * df[f"sxx{k}"].to_numpy(np.float64) - sx * sx)
               * (n * df[f"syy{k}"].to_numpy(np.float64) - sy * sy))
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where((n >= 2) & (den > 0),
                         cov / np.sqrt(np.maximum(den, 1e-300)), np.nan)
        res[f"n{k}"] = df[f"n{k}"].astype("int64")
        res[f"r{k}"] = r
    return pd.DataFrame(res)


def q_holt_forecast_gate_daily(sf_dir: str) -> pd.DataFrame:
    """Holt double-exponential-smoothing forecast, oracle-GATED through the
    degenerate closed form: at α=β=1 the recursion collapses to
    l_T = y_T, b_T = y_T − y_{T−1}, so ŷ(T+h) = y_T + h·(y_T − y_{T−1}) —
    exactly SQL-expressible. The gate exercises the full machinery (the
    key-co-located sequential fit kernel, per-series state extraction, the
    future-grid scorer) while the general-(α,β) recursion is pinned by
    pytest against a direct numpy reference."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", estimator="holt",
                       alpha=1.0, beta=1.0)
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    return df.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_HOLT_FORECAST_GATE = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC)
                   AS rn
        FROM daily
    ),
    s AS (
        SELECT event_type,
               max(CASE WHEN rn = 1 THEN v END) AS y_last,
               max(CASE WHEN rn = 2 THEN v END) AS y_prev,
               max(CASE WHEN rn = 1 THEN d END) AS d_last
        FROM r GROUP BY 1
    ),
    f AS (  -- engine future grid extends from the GLOBAL max date
        SELECT s.event_type, s.y_last, s.y_prev, s.d_last, fd.d
        FROM s CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    )
    SELECT event_type, d,
           round(y_last + datediff('day', d_last, d)
                 * (y_last - COALESCE(y_prev, y_last)), 6) AS predicted_v
    FROM f
"""


def q_smape_wape_naive_daily(sf_dir: str) -> pd.DataFrame:
    """Scale-robust error metrics of the lag-1 naive forecast per daily
    series: SMAPE (M-competition convention, 0 when |y|+|ŷ|=0), WAPE, and
    signed mean error — ``metrics.scaled_error_summary`` over a keyed lag
    attach; the oracle recomputes all three in SQL."""
    from forecastframe_ray.functions.metrics import scaled_error_summary
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    lagged = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "lag", "features": ["v"], "lags": [1]}],
        num_partitions=_NP)
    out = scaled_error_summary(lagged, "v", "v_lag1",
                               group_cols=["event_type"])
    out["n"] = out["n"].astype("int64")
    out = _round(out, ["SMAPE", "WAPE", "ME"], 6)
    return out[["event_type", "n", "SMAPE", "WAPE", "ME"]] \
        .sort_values("event_type").reset_index(drop=True)


SQL_SMAPE_WAPE_NAIVE = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, v, LAG(v, 1) OVER (
            PARTITION BY event_type ORDER BY d) AS p
        FROM daily
    ),
    e AS (SELECT * FROM l WHERE p IS NOT NULL)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(avg(CASE WHEN abs(v) + abs(p) = 0 THEN 0.0
                          ELSE 2.0 * abs(v - p) / (abs(v) + abs(p)) END), 6)
               AS SMAPE,
           round(sum(abs(v - p)) / sum(abs(v)), 6) AS WAPE,
           round(sum(p - v) / count(*), 6) AS ME
    FROM e GROUP BY 1
"""


def q_croston_gate_daily(sf_dir: str) -> pd.DataFrame:
    """Croston intermittent-demand forecast, oracle-GATED through the α=1
    closed form (ẑ = last nonzero size, p̂ = last inter-demand interval,
    forecast = ẑ/p̂). The intermittent series is a deterministic mask of
    the daily series (demand only on Mon/Thu/Sat), applied identically on
    both sides; the gate exercises the sequential per-series kernel, the
    interval bookkeeping, and the rate scorer, while general α is
    pytest-pinned against a direct numpy recursion."""
    from forecastframe_ray.pipelines.search import fit_croston, score_croston

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def mask(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        dow = b["d"].dt.dayofweek.to_numpy()
        b["v"] = np.where(np.isin(dow, (0, 3, 5)),
                          b["v"].to_numpy(np.float64), 0.0)
        return b

    masked = daily.map_batches(mask, batch_format="pandas").materialize()
    state = fit_croston(masked, ["event_type"], "d", "v", alpha=1.0)
    one = masked.map_batches(
        lambda b: b.drop_duplicates("event_type")[["event_type", "d"]],
        batch_format="pandas")
    scored = score_croston(one, state, ["event_type"], "d", "v",
                           "croston_forecast").to_pandas()
    out = scored.drop_duplicates("event_type")[
        ["event_type", "croston_forecast"]]
    out = _round(out, ["croston_forecast"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_CROSTON_GATE = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (
        SELECT event_type, d,
               CASE WHEN (isodow(d) - 1) IN (0, 3, 5) THEN v ELSE 0 END AS v
        FROM daily
    ),
    start AS (SELECT event_type, min(d) AS d0 FROM m GROUP BY 1),
    nz AS (
        SELECT event_type, d, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC)
                   AS rn
        FROM m WHERE v <> 0
    ),
    lastnz AS (
        SELECT event_type,
               max(CASE WHEN rn = 1 THEN v END) AS q_last,
               max(CASE WHEN rn = 1 THEN d END) AS t1,
               max(CASE WHEN rn = 2 THEN d END) AS t2
        FROM nz GROUP BY 1
    )
    SELECT s.event_type,
           COALESCE(round(l.q_last / CASE
               WHEN l.t2 IS NOT NULL THEN datediff('day', l.t2, l.t1)
               ELSE datediff('day', s.d0, l.t1) + 1 END, 6), 0.0)
               AS croston_forecast
    FROM start s LEFT JOIN lastnz l USING (event_type)
"""


def q_pushdown_filter_events(sf_dir: str) -> pd.DataFrame:
    """S1 pushdown read: both the column list AND the row predicate
    (ts ≥ median-ish cutoff AND event_type = 'view') are handed to the
    parquet scan itself (``io.load_table`` → pyarrow dataset expression),
    so footer statistics prune row groups before bytes move — no
    post-read filter stage exists in this plan. Aggregate proves the
    surviving rows are exactly the SQL WHERE set."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from forecastframe_ray.io import load_table

    cut = pd.Timestamp("2024-01-15")
    ev = load_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"],
        filter_expr=(pc.field("ts") >= pa.scalar(cut))
        & (pc.field("event_type") == "view"))
    out = hash_aggregate(ev, ["event_type"], {
        "n": ("ts", "size"), "sum_value": ("value", "sum"),
        "min_ts": ("ts", "min"),
    }, num_partitions=4).to_pandas()
    out["n"] = out["n"].astype("int64")
    out = _round(out, ["sum_value"], 4)
    out["min_ts"] = out["min_ts"].astype("datetime64[us]")
    return out[["event_type", "n", "sum_value", "min_ts"]] \
        .sort_values("event_type").reset_index(drop=True)


SQL_PUSHDOWN_FILTER = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sum_value, min(ts) AS min_ts
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15' AND event_type = 'view'
    GROUP BY 1
"""


def q_spearman_daily_events(sf_dir: str) -> pd.DataFrame:
    """Grouped Spearman rank correlation between each daily series and its
    own 7-day lag — the outlier-robust monotone-association diagnostic
    (Pearson on average ranks; ties get the mean of their rank range,
    pandas ``rank(method='average')`` ≡ SQL ``RANK() + (tie_count-1)/2``).
    Ranks need every row of a series co-resident, so the plan is the
    key-co-located partition kernel (``keyed_map_partitions``) with a fully
    vectorized in-partition kernel: groupby-transform ranks, then the
    per-series correlation from sum aggregates — one shuffle total, the
    driver sees one row per series."""
    from forecastframe_ray.stages.agg import keyed_map_partitions
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    lagged = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "lag", "features": ["v"], "lags": [7]}],
        num_partitions=_NP)
    pairs = lagged.map_batches(
        lambda b: b.loc[b["v_lag7"].notna(),
                        ["event_type", "v", "v_lag7"]],
        batch_format="pandas")

    def rho(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("event_type", sort=False)
        rx = g["v"].rank(method="average").to_numpy(np.float64)
        ry = g["v_lag7"].rank(method="average").to_numpy(np.float64)
        t = pd.DataFrame({"event_type": part["event_type"].to_numpy(),
                          "n": np.ones(len(part), dtype=np.int64),
                          "sx": rx, "sy": ry, "sxy": rx * ry,
                          "sxx": rx * rx, "syy": ry * ry})
        s = t.groupby("event_type", sort=False, observed=True).sum() \
            .reset_index()
        n = s["n"].to_numpy(np.float64)
        sx, sy = s["sx"].to_numpy(), s["sy"].to_numpy()
        cov = n * s["sxy"].to_numpy() - sx * sy
        den = ((n * s["sxx"].to_numpy() - sx * sx)
               * (n * s["syy"].to_numpy() - sy * sy))
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where((n >= 2) & (den > 0),
                         cov / np.sqrt(np.maximum(den, 1e-300)), np.nan)
        return pd.DataFrame({"event_type": s["event_type"],
                             "n": s["n"].astype("int64"),
                             "spearman": np.round(r, 6)})

    out = keyed_map_partitions(pairs, ["event_type"], rho,
                               num_partitions=_NP).to_pandas()
    out = _fill(out, ["spearman"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_SPEARMAN_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v, LAG(v, 7) OVER w AS v7
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    e AS (SELECT * FROM l WHERE v7 IS NOT NULL),
    rk AS (
        SELECT event_type,
               RANK() OVER (PARTITION BY event_type ORDER BY v)
                   + (COUNT(*) OVER (PARTITION BY event_type, v) - 1) / 2.0
                   AS rx,
               RANK() OVER (PARTITION BY event_type ORDER BY v7)
                   + (COUNT(*) OVER (PARTITION BY event_type, v7) - 1) / 2.0
                   AS ry
        FROM e
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           COALESCE(round(corr(rx, ry), 6), {NULLF}) AS spearman
    FROM rk GROUP BY 1
"""


def q_mann_kendall_daily_events(sf_dir: str) -> pd.DataFrame:
    """Mann-Kendall trend statistic per daily series: S = Σ_{i<j}
    sign(vⱼ − vᵢ) ordered by date, plus tau-a = S / (n(n−1)/2) — the
    standard nonparametric monotone-trend test for monitoring pipelines
    (public; Mann 1945 / Kendall). A series' rows are co-located by the
    keyed partition kernel; the in-kernel pair sweep is one vectorized
    sign-matrix per series (n≲few hundred daily points — the pair count
    grows with series LENGTH, not corpus size, so the kernel is scale-safe
    under the engine's fixed-length-series model). Oracle: per-series
    self-join on d_i < d_j."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def mk(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n = len(v)
            s = int(np.sign(v[None, :] - v[:, None])
                    [np.triu_indices(n, 1)].sum()) if n >= 2 else 0
            npairs = n * (n - 1) // 2
            rows.append((et, n, s,
                         np.round(s / npairs, 6) if npairs else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n", "s", "tau"])

    out = keyed_map_partitions(daily, ["event_type"], mk,
                               num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["s"] = out["s"].astype("int64")
    out = _fill(out, ["tau"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_MANN_KENDALL_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    pairs AS (
        SELECT a.event_type, sign(b.v - a.v) AS sg
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    ),
    agg AS (
        SELECT event_type, CAST(sum(sg) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS npairs
        FROM pairs GROUP BY 1
    ),
    nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM daily GROUP BY 1)
    SELECT nn.event_type, nn.n, COALESCE(agg.s, 0) AS s,
           COALESCE(round(agg.s / (nn.n * (nn.n - 1) / 2.0), 6), {NULLF})
               AS tau
    FROM nn LEFT JOIN agg USING (event_type)
"""


def q_acf_daily_events(sf_dir: str) -> pd.DataFrame:
    """Lag-1/lag-2 autocorrelation per daily series (estimator and plan:
    :func:`_lag_corr_table`). Matches SQL ``corr(v, LAG(v, k))`` (NULL for
    <2 pairs or zero variance -> NULLF)."""
    df = _lag_corr_table(sf_dir, (1, 2))
    out = pd.DataFrame({"event_type": df["event_type"],
                        "n1": df["n1"], "acf1": np.round(df["r1"], 6),
                        "n2": df["n2"], "acf2": np.round(df["r2"], 6)})
    out = _fill(out, ["acf1", "acf2"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_ACF_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER w AS v1, LAG(v, 2) OVER w AS v2
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type,
           CAST(count(v1) AS BIGINT) AS n1,
           COALESCE(round(corr(v, v1), 6), {NULLF}) AS acf1,
           CAST(count(v2) AS BIGINT) AS n2,
           COALESCE(round(corr(v, v2), 6), {NULLF}) AS acf2
    FROM l GROUP BY 1
"""


def q_pacf_daily_events(sf_dir: str) -> pd.DataFrame:
    """Partial autocorrelation (lags 1-3) per daily series via the
    Durbin-Levinson recursion over the lag-k autocorrelations — the
    standard AR-order diagnostic the reference's forecasting workflow
    reads next to the ACF. rₖ uses the same pairwise ``corr(v, LAG(v,k))``
    estimator as ``acf_daily_events`` (documented variant; both sides
    identical), the distributed part is one keyed lag attach + a tiny
    per-series sum aggregate, and the three-level recursion is closed-form
    driver algebra reproduced term-for-term in SQL:

        φ₁₁ = r₁;  φ₂₂ = (r₂−r₁²)/(1−r₁²);  φ₂₁ = r₁(1−φ₂₂);
        φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁) / (1 − φ₂₁r₁ − φ₂₂r₂).

    Degenerate denominators (|r₁| = 1, e.g. a 3-point series) yield NaN →
    NULLF, matching DuckDB where x/0 is NULL (an unguarded divide would
    emit inf, which ``_fill``/fillna keeps)."""
    df = _lag_corr_table(sf_dir, (1, 2, 3))
    r = {k: df[f"r{k}"].to_numpy(np.float64) for k in (1, 2, 3)}

    def safe_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(den == 0.0, np.nan,
                            num / np.where(den == 0.0, 1.0, den))

    p11 = r[1]
    p22 = safe_div(r[2] - r[1] * r[1], 1.0 - r[1] * r[1])
    p21 = r[1] * (1.0 - p22)
    p33 = safe_div(r[3] - p21 * r[2] - p22 * r[1],
                   1.0 - p21 * r[1] - p22 * r[2])
    out = pd.DataFrame({"event_type": df["event_type"],
                        "pacf1": np.round(p11, 6),
                        "pacf2": np.round(p22, 6),
                        "pacf3": np.round(p33, 6)})
    out = _fill(out, ["pacf1", "pacf2", "pacf3"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_PACF_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER w AS v1, LAG(v, 2) OVER w AS v2,
               LAG(v, 3) OVER w AS v3
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    r AS (
        SELECT event_type, corr(v, v1) AS r1, corr(v, v2) AS r2,
               corr(v, v3) AS r3
        FROM l GROUP BY 1
    ),
    lvl2 AS (
        SELECT *, (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22 FROM r
    ),
    lvl3 AS (
        SELECT *, r1 * (1.0 - p22) AS p21 FROM lvl2
    )
    SELECT event_type,
           COALESCE(round(r1, 6), {NULLF}) AS pacf1,
           COALESCE(round(p22, 6), {NULLF}) AS pacf2,
           COALESCE(round((r3 - p21 * r2 - p22 * r1)
                          / (1.0 - p21 * r1 - p22 * r2), 6), {NULLF}) AS pacf3
    FROM lvl3
"""


def q_periodogram_daily_events(sf_dir: str) -> pd.DataFrame:
    """Single-frequency periodogram power at the weekly and ~monthly
    periods per daily series — the spectral seasonality-strength diagnostic
    (Schuster periodogram, power = (C² + S²)/n over mean-centered values
    with C = Σv·cos − v̄Σcos). The angle uses ``(epoch_day mod P)`` so the
    engine and SQL evaluate cos/sin at identical SMALL arguments (no
    large-argument libm range-reduction divergence). One stateless
    vectorized partials pass + a per-series sum aggregate; the driver sees
    one row per series."""
    ev = _bucket_series(sf_dir, DAY_US, "d")
    periods = (7, 30)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        out = {"event_type": b["event_type"]}
        v = b["v"].to_numpy(np.float64)
        dn = (b["d"].astype("datetime64[us]").astype("int64")
              // DAY_US).to_numpy()
        out["n"] = np.ones(len(b), dtype=np.int64)
        out["sv"] = v
        for p in periods:
            ang = 2.0 * np.pi * (dn % p) / p
            c, s = np.cos(ang), np.sin(ang)
            out[f"svc{p}"], out[f"svs{p}"] = v * c, v * s
            out[f"sc{p}"], out[f"ss{p}"] = c, s
        return pd.DataFrame(out)

    spec = {"n": ("n", "sum"), "sv": ("sv", "sum")}
    for p in periods:
        spec.update({f"svc{p}": (f"svc{p}", "sum"),
                     f"svs{p}": (f"svs{p}", "sum"),
                     f"sc{p}": (f"sc{p}", "sum"),
                     f"ss{p}": (f"ss{p}", "sum")})
    df = hash_aggregate(ev.map_batches(partials, batch_format="pandas"),
                        ["event_type"], spec,
                        num_partitions=_NP).to_pandas()
    n = df["n"].to_numpy(np.float64)
    vbar = df["sv"].to_numpy(np.float64) / n
    out = {"event_type": df["event_type"],
           "n": df["n"].astype("int64")}
    for p in periods:
        C = df[f"svc{p}"].to_numpy(np.float64) - vbar * df[f"sc{p}"].to_numpy(np.float64)
        S = df[f"svs{p}"].to_numpy(np.float64) - vbar * df[f"ss{p}"].to_numpy(np.float64)
        out[f"power{p}"] = np.round((C * C + S * S) / n, 2)
    return pd.DataFrame(out)[["event_type", "n", "power7", "power30"]] \
        .sort_values("event_type").reset_index(drop=True)


SQL_PERIODOGRAM_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (
        SELECT event_type, v, epoch_us(d) // {DAY_US} AS dn FROM daily
    ),
    s AS (
        SELECT event_type, CAST(count(*) AS DOUBLE) AS n, sum(v) AS sv,
               sum(v * cos(2 * pi() * (((dn % 7) + 7) % 7) / 7)) AS svc7,
               sum(v * sin(2 * pi() * (((dn % 7) + 7) % 7) / 7)) AS svs7,
               sum(cos(2 * pi() * (((dn % 7) + 7) % 7) / 7)) AS sc7,
               sum(sin(2 * pi() * (((dn % 7) + 7) % 7) / 7)) AS ss7,
               sum(v * cos(2 * pi() * (((dn % 30) + 30) % 30) / 30)) AS svc30,
               sum(v * sin(2 * pi() * (((dn % 30) + 30) % 30) / 30)) AS svs30,
               sum(cos(2 * pi() * (((dn % 30) + 30) % 30) / 30)) AS sc30,
               sum(sin(2 * pi() * (((dn % 30) + 30) % 30) / 30)) AS ss30
        FROM t GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(((svc7 - sv / n * sc7) * (svc7 - sv / n * sc7)
                  + (svs7 - sv / n * ss7) * (svs7 - sv / n * ss7)) / n, 2)
               AS power7,
           round(((svc30 - sv / n * sc30) * (svc30 - sv / n * sc30)
                  + (svs30 - sv / n * ss30) * (svs30 - sv / n * ss30)) / n, 2)
               AS power30
    FROM s
"""


# ---------------------------------------------------------------------------
# shingle containment pairs (pipelines/dedup.ngram_containment)
# ---------------------------------------------------------------------------

def q_containment_pairs_documents(sf_dir: str) -> pd.DataFrame:
    """Broder containment |A∩B| / min(|A|,|B|) for the fixed (2i, 2i+1)
    pair list — catches excerpt/superset duplicates whose symmetric Jaccard
    is low. Engine compares distinct shingle hashes, oracle the substrings
    themselves (equal barring a 2^-64 collision)."""
    from forecastframe_ray.pipelines.dedup import ngram_containment
    from forecastframe_ray.stages.agg import bucketed_map_groups

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pair_up(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["pair_id"] = b["doc_id"] // 2
        return b[["pair_id", "doc_id", "text"]]

    def cont(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        if len(g) != 2:
            return pd.DataFrame({"pair_id": [], "containment": []})
        c = ngram_containment(g["text"].iloc[0] or "",
                              g["text"].iloc[1] or "", width=5)
        return pd.DataFrame({"pair_id": [int(g["pair_id"].iloc[0])],
                             "containment": [c]})

    pairs = bucketed_map_groups(
        docs.map_batches(pair_up, batch_format="pandas"),
        ["pair_id"], cont, num_partitions=8)
    out = pairs.to_pandas()
    out["pair_id"] = out["pair_id"].astype("int64")
    # containment = k / min(|A|,|B|) can land EXACTLY on a decimal half
    # (e.g. 65/128 = .5078125): match DuckDB's round-half-away-from-zero,
    # not numpy's banker's rounding (values are >= 0 so floor(x*1e6+0.5))
    c = out["containment"].to_numpy(np.float64)
    out["containment"] = np.floor(c * 1e6 + 0.5) / 1e6
    return out[["pair_id", "containment"]]


SQL_CONTAINMENT_PAIRS = """
    WITH sh AS (
        SELECT doc_id // 2 AS pair_id, doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(strlen(text) - 4, 1)),
                   i -> substr(text, i, 5))) AS s
        FROM documents
    ),
    p AS (
        SELECT a.pair_id, a.s AS sa, b.s AS sb
        FROM sh a JOIN sh b
            ON a.pair_id = b.pair_id AND a.doc_id < b.doc_id
    )
    SELECT pair_id,
           round(CAST(length(list_intersect(sa, sb)) AS DOUBLE)
                 / least(length(sa), length(sb)), 6) AS containment
    FROM p
"""


# ---------------------------------------------------------------------------
# trend / seasonal strength (Hyndman FPP3 §4.4, from the decomposition)
# ---------------------------------------------------------------------------

def q_decomposition_strength_daily(sf_dir: str) -> pd.DataFrame:
    """Per-series trend strength ``max(0, 1 − Var(R)/Var(T+R))`` and
    seasonal strength ``max(0, 1 − Var(R)/Var(S+R))`` (Hyndman & Athana-
    sopoulos FPP3, public) from the additive decomposition — components
    UNROUNDED on both engines, var is sample variance, degenerate series
    (n<2 or zero variance) emit NULLF."""
    from forecastframe_ray.stages.agg import bucketed_map_groups

    daily = _bucket_series(sf_dir, DAY_US, "d")

    from forecastframe_ray.stages.window_ops import decompose_components

    def strength(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("d", kind="mergesort").reset_index(drop=True)
        v = g["v"].to_numpy(np.float64)
        trend, seasonal = decompose_components(g, ["event_type"], "d", "v")
        detr = v - trend
        resid = v - trend - seasonal
        n = len(v)

        def f(parent: np.ndarray) -> float:
            if n < 2:
                return NULLF
            vr = float(np.var(resid, ddof=1))
            vp = float(np.var(parent, ddof=1))
            if vp == 0.0:
                return NULLF
            return np.round(max(0.0, 1.0 - vr / vp), 6)

        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": [np.int64(n)],
            "trend_strength": [f(v - seasonal)],
            "seasonal_strength": [f(detr)],
        })

    out = bucketed_map_groups(daily, ["event_type"], strength,
                              num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DECOMP_STRENGTH = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (
        SELECT event_type, d, v,
               avg(v) OVER (PARTITION BY event_type ORDER BY d
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS trend
        FROM daily
    ),
    s AS (
        SELECT event_type, d, v, trend,
               avg(v - trend) OVER (PARTITION BY event_type, dayofweek(d))
                   AS seasonal
        FROM t
    ),
    r AS (
        SELECT event_type,
               v - trend - seasonal AS resid,
               v - seasonal AS deseason,
               v - trend AS detr
        FROM s
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           COALESCE(CASE WHEN var_samp(deseason) = 0 THEN NULL
                ELSE round(greatest(0.0,
                     1.0 - var_samp(resid) / var_samp(deseason)), 6)
           END, {NULLF}) AS trend_strength,
           COALESCE(CASE WHEN var_samp(detr) = 0 THEN NULL
                ELSE round(greatest(0.0,
                     1.0 - var_samp(resid) / var_samp(detr)), 6)
           END, {NULLF}) AS seasonal_strength
    FROM r GROUP BY 1
"""


# ---------------------------------------------------------------------------
# CDC compaction: latest row per key (stages/agg.compact_latest)
# ---------------------------------------------------------------------------

def q_latest_order_per_customer(sf_dir: str) -> pd.DataFrame:
    """Keep each customer's most recent order (date desc, orderkey desc
    tie-break) — streaming combiner + one coarse-hash exchange, full rows
    ride along."""
    from forecastframe_ray.stages.agg import compact_latest

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = compact_latest(orders, ["o_custkey"],
                         ["o_orderdate", "o_orderkey"],
                         num_partitions=_NP).to_pandas()
    out = out[["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]]
    return out.sort_values("o_custkey").reset_index(drop=True)


SQL_LATEST_ORDER = """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC,
                                           o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# GROUPING SETS rollup (pipelines/rollup.grouping_sets_rollup)
# ---------------------------------------------------------------------------

def q_grouping_sets_daily_events(sf_dir: str) -> pd.DataFrame:
    """GROUPING SETS ((event_type, day), (event_type), (day), ()) via the
    partial cascade — one input scan, coarser sets re-aggregate partials.
    Sentinels '_ALL_' / 1900-01-01 stand in for SQL's NULL grouping keys."""
    from forecastframe_ray.pipelines.rollup import grouping_sets_rollup

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def floor_day(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame({
            "event_type": b["event_type"],
            "d": pd.to_datetime((us // DAY_US) * DAY_US, unit="us"),
            "value": b["value"],
        })

    sets = grouping_sets_rollup(
        ev.map_batches(floor_day, batch_format="pandas"),
        "event_type", "d", "value", num_partitions=_NP)
    SENT_D = pd.Timestamp("1900-01-01")
    ab = sets["ab"].to_pandas()
    a = sets["a"].to_pandas().assign(d=SENT_D)
    b = sets["b"].to_pandas().assign(event_type="_ALL_")
    tot = sets["total"].to_pandas()
    if len(tot) == 0:  # SQL GROUPING SETS always emits the () row
        tot = pd.DataFrame({"n": [np.int64(0)], "sum_v": [NULLF]})
    tot = tot.assign(event_type="_ALL_", d=SENT_D)
    out = pd.concat([ab, a, b, tot], ignore_index=True)
    out = out[["event_type", "d", "n", "sum_v"]]
    out["n"] = out["n"].astype("int64")
    out = _round(out, ["sum_v"], 6)
    return out.sort_values(["event_type", "d"],
                           kind="mergesort").reset_index(drop=True)


SQL_GROUPING_SETS_DAILY = """
    SELECT COALESCE(event_type, '_ALL_') AS event_type,
           COALESCE(d, TIMESTAMP '1900-01-01') AS d,
           CAST(count(*) AS BIGINT) AS n,
           COALESCE(round(sum(value), 6), -999.0) AS sum_v
    FROM (SELECT event_type, date_trunc('day', ts) AS d, value FROM events)
    GROUP BY GROUPING SETS ((event_type, d), (event_type), (d), ())
"""


# ---------------------------------------------------------------------------
# BM25 keyword search (pipelines/tfidf.bm25_scores)
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "join", "window"]


def q_bm25_search_documents(sf_dir: str) -> pd.DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75, Lucene idf) for the fixed query
    {spark, join, window}: every matching document with its score — the
    match set is deterministic, so no top-k tie ambiguity."""
    from forecastframe_ray.pipelines.tfidf import bm25_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = bm25_scores(docs, _BM25_TERMS, num_partitions=_NP).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "bm25"]].sort_values("doc_id") \
        .reset_index(drop=True)


SQL_BM25_SEARCH = r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                   AS t
        FROM documents
    ),
    dl AS (SELECT doc_id, len(t) AS dl FROM toks),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, x AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest(t) AS x FROM toks)
        WHERE x IN ('spark', 'join', 'window')
        GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
    SELECT tf.doc_id,
           round(sum(
               ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
           ), 6) AS bm25
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# per-user behavioral entropy (hierarchical aggregate, vectorized kernel)
# ---------------------------------------------------------------------------

def q_user_entropy_events(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy (nats) of each user's event-type mix: counts reduce
    in one combiner'd aggregate; the per-user −Σ p·ln p finishes in a
    vectorized per-partition kernel (two grouped transforms, no per-user
    Python loop)."""
    from forecastframe_ray.stages.agg import hash_aggregate
    from forecastframe_ray.keys import partition_ids

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = hash_aggregate(ev, ["user_id", "event_type"],
                            {"n": ("event_type", "size")},
                            num_partitions=_NP)

    def assign(bt: pd.DataFrame) -> pd.DataFrame:
        bt = bt.copy()
        bt["__part"] = partition_ids(bt, ["user_id"], _NP)
        return bt

    def entropy(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=["__part"])
        n = part["n"].to_numpy(np.float64)
        g = part.groupby("user_id", sort=False)
        tot = g["n"].transform("sum").to_numpy(np.float64)
        p = n / tot
        terms = pd.DataFrame({"user_id": part["user_id"],
                              "__t": -p * np.log(p), "__n": part["n"]})
        out = terms.groupby("user_id", sort=False).agg(
            n_events=("__n", "sum"), entropy=("__t", "sum")).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        out["entropy"] = np.round(out["entropy"].to_numpy(np.float64), 6) + 0.0
        return out

    out = (counts.map_batches(assign, batch_format="pandas")
           .groupby("__part").map_groups(entropy, batch_format="pandas"))
    df = out.to_pandas().astype({"user_id": "int64"})
    return df.sort_values("user_id").reset_index(drop=True)


SQL_USER_ENTROPY = """
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.user_id, CAST(sum(c.n) AS BIGINT) AS n_events,
           round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 6) + 0.0 AS entropy
    FROM c JOIN t USING (user_id)
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# distributed fixed-width histogram (map-side binning + combiner'd counts)
# ---------------------------------------------------------------------------

def q_value_histogram_events(sf_dir: str) -> pd.DataFrame:
    """Fixed-width (50-unit) value histogram per event type — binning is a
    stateless vectorized map; counts combine per batch before the one tiny
    shuffle."""
    from forecastframe_ray.stages.agg import hash_aggregate

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def binify(bt: pd.DataFrame) -> pd.DataFrame:
        bt = bt[["event_type"]].assign(
            bin=np.floor(bt["value"].to_numpy(np.float64) / 50.0)
            .astype(np.int64))
        return bt

    out = hash_aggregate(ev.map_batches(binify, batch_format="pandas"),
                         ["event_type", "bin"], {"n": ("bin", "size")},
                         num_partitions=_NP).to_pandas()
    out = out.astype({"bin": "int64", "n": "int64"})
    return out.sort_values(["event_type", "bin"]).reset_index(drop=True)


SQL_VALUE_HISTOGRAM = """
    SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# OHLC bars (pipelines/rollup.ohlc_aggregate)
# ---------------------------------------------------------------------------

def q_ohlc_daily_events(sf_dir: str) -> pd.DataFrame:
    """Daily open/high/low/close bars per event type over the unique-stamp
    series (values summed at identical timestamps first, so the arg-min/max
    open/close rows are unambiguous on both engines)."""
    from forecastframe_ray.pipelines.rollup import ohlc_aggregate

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    uniq = hash_aggregate(ev, ["event_type", "ts"],
                          {"v": ("value", "sum")}, num_partitions=_NP)

    def round_v(b: pd.DataFrame) -> pd.DataFrame:
        b["v"] = np.round(b["v"].to_numpy(np.float64), 6)
        return b

    out = ohlc_aggregate(uniq.map_batches(round_v, batch_format="pandas"),
                         ["event_type"], "ts", "v", DAY_US,
                         num_partitions=_NP).to_pandas()
    out["d"] = pd.to_datetime(out["bucket_us"], unit="us")
    out = out[["event_type", "d", "open", "high", "low", "close", "n"]]
    out = _round(out, ["open", "high", "low", "close"], 6)
    return out.sort_values(["event_type", "d"],
                           kind="mergesort").reset_index(drop=True)


SQL_OHLC_DAILY = """
    WITH s AS (
        SELECT event_type, ts, round(sum(value), 6) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, date_trunc('day', ts) AS d,
           round(arg_min(v, ts), 6) AS open,
           round(max(v), 6) AS high,
           round(min(v), 6) AS low,
           round(arg_max(v, ts), 6) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# irregular-gap rate of change (keyed stage; per-hour units)
# ---------------------------------------------------------------------------

def q_rate_hourly_events(sf_dir: str) -> pd.DataFrame:
    """Per-series rate of change on the (gappy) hourly spine:
    ``(v − v_prev) / hours elapsed`` — the denominator honors the ACTUAL
    gap between surviving buckets, the crawl-rate derivative for
    irregularly-sampled series. First row of a series -> NULLF."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    hourly = _bucket_series(sf_dir, HOUR_US, "h")
    out = keyed_window_stage(
        hourly, ["event_type"], "h",
        [{"op": "rate", "feature": "v", "per_seconds": 3600.0,
          "out_name": "rate"}],
        num_partitions=_NP)
    df = out.to_pandas()[["event_type", "h", "v", "rate"]]
    df = _fill(df, ["rate"])
    return df.sort_values(["event_type", "h"],
                          kind="mergesort").reset_index(drop=True)


SQL_RATE_HOURLY = f"""
    WITH hourly AS ({_HOURLY_SQL})
    SELECT event_type, h, v,
           COALESCE(round((v - LAG(v) OVER w)
               / (epoch(h - LAG(h) OVER w) / 3600.0), 6), {NULLF}) AS rate
    FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h)
"""


# ---------------------------------------------------------------------------
# TPC-H Q3-style shipping priority (semi-join + hash join + topk)
# ---------------------------------------------------------------------------

_Q3_CUT = "1998-01-01"


def q_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape (public spec): BUILDING-segment customers' orders
    placed before the cutoff, revenue from lineitems shipped after it, top
    10 orders by revenue. Segment keys broadcast as a semi-join filter;
    the big-big orders⋈lineitem edge is the CPU-clamped distributed hash
    join; top-k is a per-batch partial + tiny driver merge (never a global
    sort). Round-then-rank (revenue 6dp desc, orderkey asc) keeps the
    cutoff deterministic across engines."""
    from forecastframe_ray.stages.join import (broadcast_semi_join,
                                               consolidate_for_join,
                                               hash_join)

    cut = pd.Timestamp(_Q3_CUT)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = cust.loc[cust["c_mktsegment"] == "BUILDING", ["c_custkey"]] \
        .rename(columns={"c_custkey": "o_custkey"})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: b[b["o_orderdate"] < cut], batch_format="pandas")
    orders = broadcast_semi_join(orders, keys, ["o_custkey"]) \
        .drop_columns(["o_custkey"])
    # mapped filtered stream -> join input: see consolidate_for_join (the
    # A/B stall measurement in its docstring was taken on THIS query)
    orders = consolidate_for_join(orders, 8)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] > cut]
        return pd.DataFrame({
            "o_orderkey": b["l_orderkey"],
            "part": b["l_extendedprice"].to_numpy(np.float64)
                    * (1.0 - b["l_discount"].to_numpy(np.float64)),
        })

    joined = hash_join(li.map_batches(rev, batch_format="pandas"), orders,
                       on=["o_orderkey"], num_partitions=8)
    agg = hash_aggregate(joined,
                         ["o_orderkey", "o_orderdate", "o_orderpriority"],
                         {"revenue": ("part", "sum")}, num_partitions=_NP)

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["revenue"] = np.round(b["revenue"].to_numpy(np.float64), 6)
        return b.sort_values(["revenue", "o_orderkey"],
                             ascending=[False, True]).head(10)

    out = agg.map_batches(local_top, batch_format="pandas").to_pandas()
    out = out.sort_values(["revenue", "o_orderkey"],
                          ascending=[False, True]).head(10)
    out = out[["o_orderkey", "o_orderdate", "o_orderpriority", "revenue"]]
    return out.reset_index(drop=True)


SQL_SHIPPING_PRIORITY = f"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_CUT}'
      AND l_shipdate > TIMESTAMP '{_Q3_CUT}'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# cohort retention (web-analytics: first-seen day × activity offset)
# ---------------------------------------------------------------------------

def q_cohort_retention_events(sf_dir: str) -> pd.DataFrame:
    """Classic cohort table: users bucketed by first-active day; for each
    (cohort, day-offset) the distinct active users. JOIN-FREE plan: one
    key-co-located partition kernel (``keyed_map_partitions`` on user_id)
    computes each user's cohort AND offsets in-group (vectorized
    ``groupby().transform('min')`` across the whole partition), replacing
    the former distinct-aggregate + cohort-aggregate + hash-join chain —
    three exchanges become two, and the stall-prone join operator leaves
    the plan entirely (measured 23 s → ~6 s at sf0.1, identical output).
    Per-batch (user, day) pre-dedup bounds the shuffle bytes."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def to_day(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame({
            "user_id": b["user_id"],
            "dn": (us // DAY_US).to_numpy(),
        }).drop_duplicates()  # partial dedup: bounds shuffle bytes

    days = ev.map_batches(to_day, batch_format="pandas")

    def per_user(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates()  # finish the (user, day) distinct
        cohort_dn = part.groupby("user_id", sort=False)["dn"] \
            .transform("min")
        return pd.DataFrame({
            "cohort_dn": cohort_dn.to_numpy(),
            "offset_days": (part["dn"] - cohort_dn).to_numpy(np.int64),
            "one": np.ones(len(part), dtype=np.int64),
        })

    rows = keyed_map_partitions(days, ["user_id"], per_user,
                                num_partitions=_NP)
    out = hash_aggregate(rows, ["cohort_dn", "offset_days"],
                         {"n_users": ("one", "sum")},
                         num_partitions=_NP).to_pandas()
    out["cohort"] = pd.to_datetime(out["cohort_dn"] * DAY_US, unit="us")
    out = out.astype({"offset_days": "int64", "n_users": "int64"})
    return out[["cohort", "offset_days", "n_users"]] \
        .sort_values(["cohort", "offset_days"]).reset_index(drop=True)


SQL_COHORT_RETENTION = """
    WITH d AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    f AS (SELECT user_id, min(d) AS cohort FROM d GROUP BY 1)
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, d.d) AS BIGINT) AS offset_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM d JOIN f USING (user_id)
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# MASE: seasonal-naive forecast, scaled error (Hyndman & Koehler 2006)
# ---------------------------------------------------------------------------

def q_mase_daily_events(sf_dir: str) -> pd.DataFrame:
    """Mean Absolute Scaled Error of the ROW-lag-7 seasonal-naive forecast
    per daily series: MAE over forecastable rows divided by the in-sample
    lag-1 naive MAE (the Hyndman & Koehler 2006 scale, public). Per-series
    sums reduce distributed (ACF pattern); NULLF when no forecastable rows
    or a zero scale."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    lagged = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "lag", "features": ["v"], "lags": [1, 7]}],
        num_partitions=_NP)

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        v = b["v"].to_numpy(np.float64)
        l1 = b["v_lag1"].to_numpy(np.float64)
        l7 = b["v_lag7"].to_numpy(np.float64)
        ok1, ok7 = ~np.isnan(l1), ~np.isnan(l7)
        return pd.DataFrame({
            "event_type": b["event_type"],
            "n7": ok7.astype(np.int64),
            "ae7": np.where(ok7, np.abs(v - l7), 0.0),
            "n1": ok1.astype(np.int64),
            "ae1": np.where(ok1, np.abs(v - l1), 0.0),
        })

    agg = hash_aggregate(
        lagged.map_batches(moments, batch_format="pandas"), ["event_type"],
        {c: (c, "sum") for c in ("n7", "ae7", "n1", "ae1")},
        num_partitions=_NP)
    df = agg.to_pandas()
    n7 = df["n7"].to_numpy(np.float64)
    n1 = df["n1"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mae7 = df["ae7"].to_numpy(np.float64) / n7
        scale = df["ae1"].to_numpy(np.float64) / n1
        mase = np.where((n7 > 0) & (n1 > 0) & (scale > 0), mae7 / scale,
                        np.nan)
    out = pd.DataFrame({
        "event_type": df["event_type"],
        "n_forecast": df["n7"].astype("int64"),
        "mase": np.round(mase, 6),
    })
    out = _fill(out, ["mase"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_MASE_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, v,
               LAG(v, 1) OVER w AS l1, LAG(v, 7) OVER w AS l7
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    s AS (
        SELECT event_type,
               CAST(count(l7) AS BIGINT) AS n_forecast,
               sum(abs(v - l7)) / count(l7) AS mae7,
               sum(abs(v - l1)) / count(l1) AS scale
        FROM l GROUP BY 1
    )
    SELECT event_type, n_forecast,
           COALESCE(CASE WHEN n_forecast > 0 AND scale > 0
                         THEN round(mae7 / scale, 6) END, {NULLF}) AS mase
    FROM s
"""


# ---------------------------------------------------------------------------
# conversion funnel (view → purchase within 7 days)
# ---------------------------------------------------------------------------

def q_funnel_conversion_events(sf_dir: str) -> pd.DataFrame:
    """Classic conversion funnel: users whose FIRST 'view' is followed by a
    'purchase' within 7 days. First-touch reduce + distributed user join;
    the driver only ever sees two counters."""
    from forecastframe_ray.stages.join import hash_join

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def views(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["event_type"] == "view", ["user_id", "ts"]]

    def purchases(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["event_type"] == "purchase", ["user_id", "ts"]]
        return b.rename(columns={"ts": "p_ts"})

    first_view = hash_aggregate(
        ev.map_batches(views, batch_format="pandas"), ["user_id"],
        {"t0": ("ts", "min")}, num_partitions=_NP) \
        .repartition(4).materialize()
    n_started = first_view.count()

    joined = hash_join(
        ev.map_batches(purchases, batch_format="pandas").repartition(4)
          .materialize(),
        first_view, on=["user_id"], num_partitions=8)

    def in_window(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["p_ts"] > b["t0"]) & \
            (b["p_ts"] <= b["t0"] + pd.Timedelta(days=7))
        return b.loc[m, ["user_id"]].drop_duplicates()

    conv = hash_aggregate(
        joined.map_batches(in_window, batch_format="pandas"), ["user_id"],
        {"one": ("user_id", "size")}, num_partitions=_NP)
    n_converted = conv.count()
    rate = np.round(n_converted / n_started, 6) if n_started else NULLF
    return pd.DataFrame({"n_started": [np.int64(n_started)],
                         "n_converted": [np.int64(n_converted)],
                         "conv_rate": [rate]})


SQL_FUNNEL_CONVERSION = """
    WITH v AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT DISTINCT v.user_id
        FROM v JOIN events e ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > v.t0 AND e.ts <= v.t0 + INTERVAL 7 DAY
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_started,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_converted,
           COALESCE(round(CAST((SELECT count(*) FROM c) AS DOUBLE)
                 / (SELECT count(*) FROM v), 6), -999.0) AS conv_rate
"""


# ---------------------------------------------------------------------------
# event-type transition counts (first-order Markov over user streams)
# ---------------------------------------------------------------------------

def q_transition_counts_events(sf_dir: str) -> pd.DataFrame:
    """(prev → next) event-type transition matrix over per-user streams
    ordered by ts ((user_id, ts) is unique in this corpus, so the order is
    total): pairs form inside a partition-id shuffle kernel (whole user
    streams per partition, vectorized grouped shift), counts pre-reduce in
    the kernel before one tiny merge aggregate."""
    from forecastframe_ray.keys import partition_ids

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__part"] = partition_ids(b, ["user_id"], _NP)
        return b

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts"], kind="mergesort")
        nxt = part.groupby("user_id", sort=False)["event_type"].shift(-1)
        ok = nxt.notna()
        sub = pd.DataFrame({"prev_type": part["event_type"][ok],
                            "next_type": nxt[ok]})
        out = (sub.groupby(["prev_type", "next_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    partial = (ev.map_batches(assign, batch_format="pandas")
               .groupby("__part").map_groups(pairs, batch_format="pandas"))
    out = hash_aggregate(partial, ["prev_type", "next_type"],
                         {"n": ("n", "sum")}, num_partitions=4).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


SQL_TRANSITION_COUNTS = """
    WITH l AS (
        SELECT event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                   AS nxt
        FROM events
    )
    SELECT event_type AS prev_type, nxt AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM l WHERE nxt IS NOT NULL GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# exact per-group percentiles (bucketed kernel; quantile_cont semantics)
# ---------------------------------------------------------------------------

def q_value_percentiles_events(sf_dir: str) -> pd.DataFrame:
    """Exact p50/p90/p99 of value per event type via the range-partition
    order-statistic plan (``interpret.grouped_quantiles``): ONE distributed
    sort + split_at_indices pluck — per-group volume never has to fit one
    task's heap, the true 100 TB path (the mergeable sketch gate is the
    approximate alternative)."""
    from forecastframe_ray.pipelines.interpret import (grouped_moments,
                                                        grouped_quantiles)

    ev = _read(sf_dir, "events", ["event_type", "value"])
    counts = grouped_moments(ev, ["event_type"], "value")[["event_type",
                                                           "n"]]
    out = grouped_quantiles(ev, ["event_type"], "value",
                            qs=(0.5, 0.9, 0.99), counts=counts)
    out = out.rename(columns={"q50": "p50", "q90": "p90", "q99": "p99"})
    out = out.merge(counts, on="event_type")
    for c in ("p50", "p90", "p99"):
        out[c] = np.round(out[c].to_numpy(np.float64), 6)
    out["n"] = out["n"].astype("int64")
    out = out[["event_type", "n", "p50", "p90", "p99"]]
    return out.sort_values("event_type").reset_index(drop=True)


SQL_VALUE_PERCENTILES = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.90), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# S1 JSONL source/sink roundtrip
# ---------------------------------------------------------------------------

def q_jsonl_roundtrip_events(sf_dir: str) -> pd.DataFrame:
    """S1 JSON-lines sink+source: events (value pre-rounded to 6dp so the
    decimal text round-trips the double exactly) written via
    ``Dataset.write_json`` and read back with ``ray.data.read_json``, then
    aggregated distributed — pins the third source format next to parquet
    and CSV."""
    import shutil

    path = "/tmp/ffray_events_jsonl"
    shutil.rmtree(path, ignore_errors=True)
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b["value"] = np.round(b["value"].to_numpy(np.float64), 6)
        return b

    ev.map_batches(pre, batch_format="pandas").write_json(path)
    ds = ray.data.read_json(path)
    agg = hash_aggregate(ds, ["event_type"], {
        "n": ("value", "size"), "sum_v": ("value", "sum"),
    }, num_partitions=4).to_pandas()
    agg["n"] = agg["n"].astype("int64")
    return _round(agg, ["sum_v"], 6)[["event_type", "n", "sum_v"]] \
        .sort_values("event_type").reset_index(drop=True)


SQL_JSONL_ROUNDTRIP = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(round(value, 6)), 6) AS sum_v
    FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (median of pairwise slopes) per series
# ---------------------------------------------------------------------------

def q_theilsen_daily_events(sf_dir: str) -> pd.DataFrame:
    """Theil–Sen estimator per daily series (public: Theil 1950 / Sen 1968):
    slope = median of all pairwise slopes over integer day numbers,
    intercept = median residual at that slope. The bucketed kernel holds one
    series per call and vectorizes the O(n²) pair sweep (n = series days —
    bounded by retention; unbounded series belong on the OLS path
    ``predict_linear_daily``)."""
    from forecastframe_ray.stages.agg import bucketed_map_groups

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def ts_fit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("d", kind="mergesort")
        # day numbers via explicit µs cast — pandas datetimes here are [ns]
        x = (g["d"].astype("datetime64[us]").astype("int64").to_numpy()
             // DAY_US).astype(np.float64)
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < 2:
            return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                                 "n": [np.int64(n)], "slope": [NULLF],
                                 "intercept": [NULLF]})
        i, j = np.triu_indices(n, 1)
        slopes = (v[j] - v[i]) / (x[j] - x[i])
        slope = np.median(slopes)
        intercept = np.median(v - slope * x)
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n": [np.int64(n)],
                             "slope": [np.round(slope, 6)],
                             "intercept": [np.round(intercept, 6)]})

    out = bucketed_map_groups(daily, ["event_type"], ts_fit,
                              num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_THEILSEN_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    pts AS (
        SELECT event_type, epoch_us(d) // {DAY_US} AS x, v FROM daily
    ),
    sl AS (
        SELECT a.event_type,
               median((b.v - a.v) / (b.x - a.x)) AS slope
        FROM pts a JOIN pts b
            ON a.event_type = b.event_type AND a.x < b.x
        GROUP BY 1
    ),
    ic AS (
        SELECT p.event_type, median(p.v - sl.slope * p.x) AS intercept
        FROM pts p JOIN sl USING (event_type) GROUP BY 1
    ),
    nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM pts
           GROUP BY 1)
    SELECT nn.event_type, nn.n,
           COALESCE(round(sl.slope, 6), {NULLF}) AS slope,
           COALESCE(round(ic.intercept, 6), {NULLF}) AS intercept
    FROM nn LEFT JOIN sl USING (event_type) LEFT JOIN ic USING (event_type)
"""


# ---------------------------------------------------------------------------
# referential-integrity audit (FK orphan counts via broadcast anti-join)
# ---------------------------------------------------------------------------

def q_fk_violations(sf_dir: str) -> pd.DataFrame:
    """Data-quality audit: orders whose customer is missing and lineitems
    whose order is missing — broadcast anti-join key-set filters, the
    driver sees only two counters."""
    from forecastframe_ray.stages.join import broadcast_semi_join

    cust_keys = pq.read_table(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"]).to_pandas() \
        .rename(columns={"c_custkey": "o_custkey"})
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    n_orders_orphans = broadcast_semi_join(
        orders, cust_keys, ["o_custkey"], anti=True).count()

    order_keys = pq.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey"]).to_pandas() \
        .rename(columns={"o_orderkey": "l_orderkey"})
    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    n_lineitem_orphans = broadcast_semi_join(
        li, order_keys, ["l_orderkey"], anti=True).count()

    return pd.DataFrame({
        "n_orders_orphans": [np.int64(n_orders_orphans)],
        "n_lineitem_orphans": [np.int64(n_lineitem_orphans)],
    })


SQL_FK_VIOLATIONS = """
    SELECT
        CAST((SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
             AS BIGINT) AS n_orders_orphans,
        CAST((SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
             AS BIGINT) AS n_lineitem_orphans
"""


# ---------------------------------------------------------------------------
# fuzzy token pairs at edit distance 1 (pipelines/corpus.edit1_token_pairs)
# ---------------------------------------------------------------------------

def q_edit1_pairs_documents(sf_dir: str) -> pd.DataFrame:
    """SymSpell deletion-neighborhood blocking + exact verify: every
    distinct-token pair at Levenshtein distance exactly 1."""
    from forecastframe_ray.pipelines.corpus import edit1_token_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return edit1_token_pairs(docs, num_partitions=_NP)


SQL_EDIT1_PAIRS = r"""
    WITH toks AS (
        SELECT DISTINCT unnest(list_filter(
            string_split_regex(text, '\s+'), x -> x <> '')) AS t
        FROM documents
    )
    SELECT a.t AS tok_a, b.t AS tok_b, CAST(1 AS BIGINT) AS dist
    FROM toks a JOIN toks b
        ON a.t < b.t AND abs(strlen(a.t) - strlen(b.t)) <= 1
    WHERE levenshtein(a.t, b.t) = 1
"""


# ---------------------------------------------------------------------------
# burstiness / index of dispersion per series
# ---------------------------------------------------------------------------

def q_dispersion_daily_events(sf_dir: str) -> pd.DataFrame:
    """Index of dispersion (Fano factor, var/mean) and coefficient of
    variation per daily series — one moment aggregate; degenerate series
    (n<2 or zero mean) emit NULLF."""
    daily = _bucket_series(sf_dir, DAY_US, "d")

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        v = b["v"].to_numpy(np.float64)
        return pd.DataFrame({"event_type": b["event_type"],
                             "n": np.ones(len(b), dtype=np.int64),
                             "s": v, "ss": v * v})

    agg = hash_aggregate(
        daily.map_batches(moments, batch_format="pandas"), ["event_type"],
        {c: (c, "sum") for c in ("n", "s", "ss")}, num_partitions=_NP)
    df = agg.to_pandas()
    n = df["n"].to_numpy(np.float64)
    s = df["s"].to_numpy(np.float64)
    ss = df["ss"].to_numpy(np.float64)
    mean = s / n
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (ss - n * mean * mean) / (n - 1.0)   # sample variance
        fano = np.where((n >= 2) & (mean != 0), var / mean, np.nan)
        cv = np.where((n >= 2) & (mean != 0), np.sqrt(np.maximum(var, 0))
                      / mean, np.nan)
    out = pd.DataFrame({"event_type": df["event_type"],
                        "n": df["n"].astype("int64"),
                        "fano": np.round(fano, 6),
                        "cv": np.round(cv, 6)})
    out = _fill(out, ["fano", "cv"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DISPERSION_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           COALESCE(CASE WHEN count(*) >= 2 AND avg(v) <> 0
                THEN round(var_samp(v) / avg(v), 6) END, {NULLF}) AS fano,
           COALESCE(CASE WHEN count(*) >= 2 AND avg(v) <> 0
                THEN round(stddev_samp(v) / avg(v), 6) END, {NULLF}) AS cv
    FROM daily GROUP BY 1
"""


# ---------------------------------------------------------------------------
# ntile + cume_dist window twins (stages/window_ops.op_ntile / op_cume_dist)
# ---------------------------------------------------------------------------

def q_ntile_cume_daily(sf_dir: str) -> pd.DataFrame:
    """SQL ntile(4) in time order and cume_dist over the value, fused into
    one keyed window pass."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    out = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "ntile", "n_tiles": 4, "out_name": "quartile"},
         {"op": "cume_dist", "feature": "v", "out_name": "v_cume_dist"}],
        num_partitions=_NP)
    df = out.to_pandas()[["event_type", "d", "v", "quartile",
                          "v_cume_dist"]]
    df["quartile"] = df["quartile"].astype("int64")
    return df.sort_values(["event_type", "d"],
                          kind="mergesort").reset_index(drop=True)


SQL_NTILE_CUME_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY d)
                AS BIGINT) AS quartile,
           round(cume_dist() OVER (PARTITION BY event_type ORDER BY v), 6)
               AS v_cume_dist
    FROM daily
"""


# ---------------------------------------------------------------------------
# vocabulary growth curve (new distinct tokens per doc-id decile)
# ---------------------------------------------------------------------------

def q_vocab_growth_documents(sf_dir: str) -> pd.DataFrame:
    """Heaps-law style vocabulary growth: each distinct token is charged to
    the FIRST document (min doc_id) that introduces it; buckets of 10% of
    the id range then count their newly-introduced tokens. One combiner'd
    min-aggregate over (token → min doc) partials; the bucketing is a tiny
    second aggregate."""
    from forecastframe_ray.stages.agg import hash_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    hi = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id"]).column("doc_id")
    import pyarrow.compute as pc
    lo_id, hi_id = pc.min(hi).as_py(), pc.max(hi).as_py()
    span = max(hi_id - lo_id + 1, 1)

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        ex = b["text"].str.split().explode().dropna()
        g = pd.DataFrame({
            "token": ex.to_numpy(),
            "doc_id": b["doc_id"].to_numpy()[ex.index.to_numpy()],
        })
        return g.groupby("token", sort=False, as_index=False)["doc_id"] \
            .min()

    first = hash_aggregate(docs.map_batches(toks, batch_format="pandas"),
                           ["token"], {"first_doc": ("doc_id", "min")},
                           num_partitions=_NP)

    def to_bucket(b: pd.DataFrame) -> pd.DataFrame:
        d = b["first_doc"].to_numpy(np.int64)
        decile = np.minimum((d - lo_id) * 10 // span, 9).astype(np.int64)
        return pd.DataFrame({"decile": decile,
                             "one": np.ones(len(b), dtype=np.int64)})

    out = hash_aggregate(first.map_batches(to_bucket, batch_format="pandas"),
                         ["decile"], {"new_tokens": ("one", "sum")},
                         num_partitions=4).to_pandas()
    out = out.astype({"decile": "int64", "new_tokens": "int64"})
    return out.sort_values("decile").reset_index(drop=True)


SQL_VOCAB_GROWTH = r"""
    WITH bounds AS (
        SELECT min(doc_id) AS lo,
               greatest(max(doc_id) - min(doc_id) + 1, 1) AS span
        FROM documents
    ),
    first AS (
        SELECT x AS token, min(doc_id) AS first_doc
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                                        t -> t <> '')) AS x
              FROM documents)
        GROUP BY 1
    )
    SELECT CAST(least((first_doc - bounds.lo) * 10 // bounds.span, 9)
                AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS new_tokens
    FROM first CROSS JOIN bounds
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# inter-event gap statistics per user
# ---------------------------------------------------------------------------

def q_interevent_gaps_events(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-event gap seconds (mean/min/max over consecutive
    events in ts order): whole user streams per partition, vectorized
    grouped diff, in-kernel pre-reduce before one tiny merge. Users with a
    single event emit no row (no gaps), matching the SQL twin."""
    from forecastframe_ray.keys import partition_ids

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__part"] = partition_ids(b, ["user_id"], _NP)
        return b

    def gaps(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts"], kind="mergesort")
        # EXACT integer-µs gaps: the sum is order-independent int64
        # arithmetic, so engines cannot disagree at a rounding boundary
        dt = part.groupby("user_id", sort=False)["ts"].diff() \
            .dt.total_seconds() * 1e6
        ok = dt.notna()
        sub = pd.DataFrame({"user_id": part["user_id"][ok],
                            "gap_us": dt[ok].round().astype("int64")})
        out = sub.groupby("user_id", sort=False).agg(
            n_gaps=("gap_us", "size"), s=("gap_us", "sum"),
            mn=("gap_us", "min"), mx=("gap_us", "max")).reset_index()
        out["n_gaps"] = out["n_gaps"].astype("int64")
        return out

    partial = (ev.map_batches(assign, batch_format="pandas")
               .groupby("__part").map_groups(gaps, batch_format="pandas"))
    df = partial.to_pandas()
    out = pd.DataFrame({
        "user_id": df["user_id"].astype("int64"),
        "n_gaps": df["n_gaps"].astype("int64"),
        "mean_gap_s": np.round(df["s"].to_numpy(np.float64)
                               / df["n_gaps"].to_numpy(np.float64)
                               / 1e6, 6),
        "min_gap_s": np.round(df["mn"].to_numpy(np.float64) / 1e6, 6),
        "max_gap_s": np.round(df["mx"].to_numpy(np.float64) / 1e6, 6),
    })
    return out.sort_values("user_id").reset_index(drop=True)


SQL_INTEREVENT_GAPS = """
    WITH l AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts) AS gap_us
        FROM events
    )
    SELECT user_id, CAST(count(gap_us) AS BIGINT) AS n_gaps,
           round(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 1e6, 6)
               AS mean_gap_s,
           round(min(gap_us) / 1e6, 6) AS min_gap_s,
           round(max(gap_us) / 1e6, 6) AS max_gap_s
    FROM l WHERE gap_us IS NOT NULL GROUP BY 1
"""


# ---------------------------------------------------------------------------
# k-means E-step: assignment to broadcast centroids (Lloyd iteration half;
# the M-step is label_centroids_embeddings)
# ---------------------------------------------------------------------------

_KMEANS_K = 8


def q_kmeans_assign_embeddings(sf_dir: str) -> pd.DataFrame:
    """One Lloyd E-step: every vector assigned to the nearest of k=8
    deterministic seed centroids (the k smallest vec_ids) by squared L2;
    ties break to the lowest cluster index (np.argmin first-occurrence ==
    SQL ``ORDER BY dist2, cluster``). Centroids broadcast once; per-batch
    work is one matmul — the M-step re-estimation is the existing
    ``label_centroids`` scatter-reduce, together a full k-means iteration."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    dfc = emb.to_pandas().sort_values("vec_id").head(_KMEANS_K)
    C = np.stack(dfc["embedding"].to_numpy()).astype(np.float64)  # k × d
    c2 = (C * C).sum(axis=1)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2[None, :]
        cl = np.argmin(d2, axis=1)
        return pd.DataFrame({
            "vec_id": b["vec_id"],
            "cluster": cl.astype(np.int64),
            # + 0.0 folds the −0.0 a centroid's self-distance can round to
            # (expanded-form matmul can land ~−1e−13) onto SQL's +0.0
            "dist2": np.round(d2[np.arange(len(cl)), cl], 6) + 0.0,
        })

    out = ds.map_batches(assign, batch_format="pandas").to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


SQL_KMEANS_ASSIGN = f"""
    WITH c AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
        FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K}
    ),
    e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    d AS (
        SELECT e.vec_id, c.cluster,
               list_dot_product(e.v, e.v)
               - 2 * list_dot_product(e.v, c.cvec)
               + list_dot_product(c.cvec, c.cvec) AS dist2
        FROM e CROSS JOIN c
    ),
    r AS (
        SELECT vec_id, cluster, dist2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist2, cluster) AS rn
        FROM d
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
           round(dist2, 6) AS dist2
    FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# cross-series correlation matrix (pivot + pairwise moment reduce)
# ---------------------------------------------------------------------------

def q_cross_corr_daily_events(sf_dir: str) -> pd.DataFrame:
    """Pairwise Pearson correlation between every two event types' daily
    series over their COMMON days (inner-join semantics): the daily spine
    pivots wide (one column per type), per-batch pairwise product moments
    accumulate vectorized, and one tiny reduce finishes — the shuffle
    carries days×types cells, the driver pairs×6 sums. NULLF when <2
    common days or zero variance."""
    from forecastframe_ray.stages.reshape import pivot_wide

    daily = _bucket_series(sf_dir, DAY_US, "d")
    types = sorted(pq.read_table(f"{sf_dir}/events.parquet",
                                 columns=["event_type"])
                   .column("event_type").unique().to_pylist())
    wide = pivot_wide(daily, index_keys=["d"], pivot_col="event_type",
                      value_col="v", categories=types, num_partitions=_NP)
    pairs = [(a, b) for i, a in enumerate(types) for b in types[i + 1:]]

    def moments(bt: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for a, b in pairs:
            x = bt[f"v_{a}"].to_numpy(np.float64)
            y = bt[f"v_{b}"].to_numpy(np.float64)
            ok = ~(np.isnan(x) | np.isnan(y))
            xx, yy = np.where(ok, x, 0.0), np.where(ok, y, 0.0)
            k = f"{a}|{b}"
            out[f"n@{k}"] = [np.int64(ok.sum())]
            out[f"sx@{k}"] = [xx.sum()]
            out[f"sy@{k}"] = [yy.sum()]
            out[f"sxy@{k}"] = [(xx * yy).sum()]
            out[f"sxx@{k}"] = [(xx * xx).sum()]
            out[f"syy@{k}"] = [(yy * yy).sum()]
        return pd.DataFrame(out)

    part = wide.map_batches(moments, batch_format="pandas").to_pandas()
    rows = []
    for a, b in pairs:
        k = f"{a}|{b}"
        n = float(part[f"n@{k}"].sum())
        sx, sy = part[f"sx@{k}"].sum(), part[f"sy@{k}"].sum()
        sxy = part[f"sxy@{k}"].sum()
        sxx, syy = part[f"sxx@{k}"].sum(), part[f"syy@{k}"].sum()
        cov = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        r = cov / np.sqrt(den) if n >= 2 and den > 0 else np.nan
        rows.append({"type_a": a, "type_b": b, "n_days": np.int64(n),
                     "corr": np.round(r, 6) if not np.isnan(r) else np.nan})
    out = pd.DataFrame(rows)
    out = _fill(out, ["corr"])
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


SQL_CROSS_CORR_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_days,
           COALESCE(round(corr(a.v, b.v), 6), {NULLF}) AS corr
    FROM daily a JOIN daily b
        ON a.d = b.d AND a.event_type < b.event_type
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# rolling p90 / WoW growth / median imputation
# ---------------------------------------------------------------------------

def q_rolling_p90_daily(sf_dir: str) -> pd.DataFrame:
    """Trailing 7-ROW p90 per daily series (quantile_cont frame twin)."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    out = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "rolling_quantile", "feature": "v", "window": 7,
          "q": 0.9, "out_name": "v_p90_roll7"}],
        num_partitions=_NP)
    df = out.to_pandas()[["event_type", "d", "v", "v_p90_roll7"]]
    return df.sort_values(["event_type", "d"],
                          kind="mergesort").reset_index(drop=True)


SQL_ROLLING_P90_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           round(quantile_cont(v, 0.9) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS v_p90_roll7
    FROM daily
"""


def q_wow_growth_daily(sf_dir: str) -> pd.DataFrame:
    """Week-over-week growth: (v − v[-7]) / v[-7] per series in ROW terms
    (the gap-filled spine makes row-lag == calendar-lag); NULLF when the
    lag is missing or zero."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    lagged = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "lag", "features": ["v"], "lags": [7]}],
        num_partitions=_NP)
    df = lagged.to_pandas()
    v = df["v"].to_numpy(np.float64)
    l7 = df["v_lag7"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        g = np.where(np.isnan(l7) | (l7 == 0), np.nan,
                     np.round((v - l7) / l7, 6))
    df["wow_growth"] = g
    df = df[["event_type", "d", "v", "wow_growth"]]
    df = _fill(df, ["wow_growth"])
    return df.sort_values(["event_type", "d"],
                          kind="mergesort").reset_index(drop=True)


SQL_WOW_GROWTH_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 7) OVER (PARTITION BY event_type ORDER BY d) AS l7
        FROM daily
    )
    SELECT event_type, d, v,
           COALESCE(CASE WHEN l7 IS NOT NULL AND l7 <> 0
                         THEN round((v - l7) / l7, 6) END, {NULLF})
               AS wow_growth
    FROM l
"""


def q_median_impute_hourly(sf_dir: str) -> pd.DataFrame:
    """Gap-fill the hourly spine then impute holes with the per-series
    median of OBSERVED values (the robust alternative to ffill /
    interpolation, fused in the same keyed pass)."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    hourly = _bucket_series(sf_dir, HOUR_US, "h")
    out = keyed_window_stage(
        hourly, ["event_type"], "h",
        [{"op": "gap_fill", "freq": "h"},
         {"op": "fill_missing", "features": ["v"], "method": "median"}],
        num_partitions=_NP)
    df = out.to_pandas()[["event_type", "h", "v"]]
    df = _round(df, ["v"], 6)
    return df.sort_values(["event_type", "h"],
                          kind="mergesort").reset_index(drop=True)


SQL_MEDIAN_IMPUTE_HOURLY = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               round(sum(value), 6) AS v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1
    ),
    spine AS (
        SELECT b.event_type, g.h
        FROM bounds b,
             LATERAL (SELECT unnest(generate_series(b.lo, b.hi,
                                    INTERVAL 1 HOUR)) AS h) g
    ),
    med AS (
        SELECT event_type, round(median(v), 6) AS m FROM hourly GROUP BY 1
    )
    SELECT s.event_type, s.h,
           round(COALESCE(hourly.v, med.m), 6) AS v
    FROM spine s
    LEFT JOIN hourly USING (event_type, h)
    JOIN med ON med.event_type = s.event_type
"""


# ---------------------------------------------------------------------------
# per-source corpus profile + lang-ID confusion matrix
# ---------------------------------------------------------------------------

def q_source_profile_documents(sf_dir: str) -> pd.DataFrame:
    """Per-source corpus composition: doc count, total/mean chars, distinct
    labeled languages — the ingest-audit query a crawl pipeline runs per
    upstream feed. One combiner'd aggregate."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "lang",
                                       "n_chars"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return b[["source", "lang", "n_chars"]]

    # distinct langs per source via a (source, lang) pre-distinct then a
    # count — the two-level exact-distinct plan
    sl = hash_aggregate(docs.map_batches(pre, batch_format="pandas"),
                        ["source", "lang"], {"nd": ("lang", "size")},
                        num_partitions=4)
    langs = hash_aggregate(sl, ["source"], {"n_langs": ("nd", "size")},
                           num_partitions=4).to_pandas()
    base = hash_aggregate(docs, ["source"], {
        "n_docs": ("doc_id", "size"),
        "sum_chars": ("n_chars", "sum"),
    }, num_partitions=4).to_pandas()
    out = base.merge(langs, on="source")
    out["mean_chars"] = np.round(
        out["sum_chars"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64), 6)
    out = out.astype({"n_docs": "int64", "sum_chars": "int64",
                      "n_langs": "int64"})
    out = out[["source", "n_docs", "sum_chars", "mean_chars", "n_langs"]]
    return out.sort_values("source").reset_index(drop=True)


SQL_SOURCE_PROFILE = """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents GROUP BY 1
"""


def q_lang_confusion_documents(sf_dir: str) -> pd.DataFrame:
    """Lang-ID evaluation: confusion counts of the n-gram heuristic's
    prediction against the labeled ``lang`` column (zh has no stopword
    profile, so its mass lands in 'und'/confusions — the matrix quantifies
    exactly that)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pred = docs.map_batches(lambda b: textstats.lang_id_batch(b),
                            batch_format="pandas")

    def pair(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lang_true": b["lang"],
                             "lang_pred": b["lang_pred"],
                             "one": np.ones(len(b), dtype=np.int64)})

    out = hash_aggregate(pred.map_batches(pair, batch_format="pandas"),
                         ["lang_true", "lang_pred"], {"n": ("one", "sum")},
                         num_partitions=4).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang_true", "lang_pred"]).reset_index(drop=True)


_LANG_CONFUSION_TEMPLATE = """
    WITH pred AS ({langid})
    SELECT d.lang AS lang_true, pred.lang_pred,
           CAST(count(*) AS BIGINT) AS n
    FROM documents d JOIN pred USING (doc_id)
    GROUP BY 1, 2
"""

SQL_LANG_CONFUSION = _LANG_CONFUSION_TEMPLATE.format(langid=SQL_LANG_ID)


# ---------------------------------------------------------------------------
# robust (median/MAD) outlier flags per series — two-level scale quantiles
# ---------------------------------------------------------------------------

def q_robust_zscore_daily(sf_dir: str) -> pd.DataFrame:
    """Robust z-score outliers: |v − median| > 3 · 1.4826 · MAD per series
    (Hampel filter constants, public). BOTH medians run on the
    range-partition order-statistic plan — no per-group heap bound — with
    the per-series stats broadcast back into a vectorized flag pass.
    Comparison on 6dp-rounded deviation/threshold so a boundary day cannot
    flip engines. Zero-MAD series (>50% identical values) flag only exact
    deviants — deviation > 0 — matching the SQL CASE."""
    from forecastframe_ray.pipelines.interpret import grouped_quantiles

    daily = _bucket_series(sf_dir, DAY_US, "d").materialize()
    med = grouped_quantiles(daily, ["event_type"], "v", qs=(0.5,))
    med = med.rename(columns={"q50": "med"})
    med_map = dict(zip(med["event_type"], med["med"]))

    def absdev(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].map(med_map).to_numpy(np.float64)
        b = b.copy()
        b["adev"] = np.abs(b["v"].to_numpy(np.float64) - m)
        return b

    devs = daily.map_batches(absdev, batch_format="pandas").materialize()
    mad = grouped_quantiles(devs, ["event_type"], "adev", qs=(0.5,))
    mad_map = dict(zip(mad["event_type"], mad["q50"]))

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].map(med_map).to_numpy(np.float64)
        md = b["event_type"].map(mad_map).to_numpy(np.float64)
        dev = np.round(np.abs(b["v"].to_numpy(np.float64) - m), 6)
        thr = np.round(3.0 * 1.4826 * md, 6)
        return pd.DataFrame({
            "event_type": b["event_type"], "d": b["d"], "v": b["v"],
            "deviation": dev, "threshold": thr,
            "outlier": (dev > thr).astype("int64"),
        })

    out = daily.map_batches(flag, batch_format="pandas").to_pandas()
    return out.sort_values(["event_type", "d"],
                           kind="mergesort").reset_index(drop=True)


SQL_ROBUST_ZSCORE = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, median(v) AS med FROM daily GROUP BY 1),
    a AS (
        SELECT d.event_type, d.d, d.v, abs(d.v - m.med) AS adev
        FROM daily d JOIN m USING (event_type)
    ),
    md AS (SELECT event_type, median(adev) AS mad FROM a GROUP BY 1)
    SELECT a.event_type, a.d, a.v,
           round(a.adev, 6) AS deviation,
           round(3.0 * 1.4826 * md.mad, 6) AS threshold,
           CAST(round(a.adev, 6) > round(3.0 * 1.4826 * md.mad, 6)
                AS BIGINT) AS outlier
    FROM a JOIN md USING (event_type)
"""


# ---------------------------------------------------------------------------
# modal (most frequent) event type per user — grouped top-1 with tie-break
# ---------------------------------------------------------------------------

def q_favorite_type_per_user(sf_dir: str) -> pd.DataFrame:
    """Each user's most frequent event type (count desc, type asc on ties)
    — counts pre-reduce in the combiner'd aggregate, the top-1 cut is the
    grouped-top-k partial merge (≤ users×1 rows shuffle)."""
    from forecastframe_ray.stages.topk import grouped_topk

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = hash_aggregate(ev, ["user_id", "event_type"],
                            {"n": ("event_type", "size")},
                            num_partitions=_NP)

    def neg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n"] = b["n"].astype("int64")
        return b

    top = grouped_topk(counts.map_batches(neg, batch_format="pandas"),
                       ["user_id"], "n", k=1, descending=True,
                       tiebreak=["event_type"], num_partitions=_NP)
    out = top.to_pandas().astype({"user_id": "int64", "n": "int64"})
    out = out.rename(columns={"event_type": "favorite_type"})
    return out[["user_id", "favorite_type", "n"]] \
        .sort_values("user_id").reset_index(drop=True)


SQL_FAVORITE_TYPE = """
    SELECT user_id, event_type AS favorite_type, n
    FROM (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type)
                   AS rn
        FROM events GROUP BY 1, 2
    ) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# LTTB visual downsampling (rows-only: sequential selection chain is not
# SQL-expressible; pinned by tests/test_lttb.py against a reference impl)
# ---------------------------------------------------------------------------

def q_lttb_daily_events(sf_dir: str) -> pd.DataFrame:
    """20-point LTTB downsample of each daily series (endpoints kept,
    bucket winners by triangle area)."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    out = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "lttb", "feature": "v", "n_out": 20}],
        num_partitions=_NP)
    df = out.to_pandas()
    df = df[df["selected"] == 1].drop(columns=["selected"])
    df = df[["event_type", "d", "v"]]
    return df.sort_values(["event_type", "d"],
                          kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------
# daily composition share (fraction-of-day-total per type)
# ---------------------------------------------------------------------------

def q_daily_share_events(sf_dir: str) -> pd.DataFrame:
    """Each type's share of its day's total — the composition dashboard
    query. Day totals reduce first (day-cardinality result), broadcast
    back into a vectorized share pass; zero-total days emit NULLF."""
    daily = _bucket_series(sf_dir, DAY_US, "d").materialize()
    totals = hash_aggregate(daily, ["d"], {"day_total": ("v", "sum")},
                            num_partitions=4).to_pandas()
    tot_map = dict(zip(totals["d"], totals["day_total"]))

    def share(b: pd.DataFrame) -> pd.DataFrame:
        t = b["d"].map(tot_map).to_numpy(np.float64)
        v = b["v"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            sh = np.where(t == 0, np.nan, np.round(v / t, 6))
        return pd.DataFrame({"event_type": b["event_type"], "d": b["d"],
                             "v": b["v"], "share": sh})

    out = daily.map_batches(share, batch_format="pandas").to_pandas()
    out = _fill(out, ["share"])
    return out.sort_values(["event_type", "d"],
                           kind="mergesort").reset_index(drop=True)


SQL_DAILY_SHARE = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           COALESCE(CASE WHEN sum(v) OVER (PARTITION BY d) <> 0
                THEN round(v / sum(v) OVER (PARTITION BY d), 6) END,
                {NULLF}) AS share
    FROM daily
"""


# ---------------------------------------------------------------------------
# deterministic train/val/test split (stages/sample.hash_split)
# ---------------------------------------------------------------------------

def q_dataset_split_orders(sf_dir: str) -> pd.DataFrame:
    """80/10/10 hash split of orders by key — membership depends only on
    md5(o_orderkey), so it is identical for any cluster shape, resume, or
    later delivery. Output: per-split counts + value totals."""
    from forecastframe_ray.stages.sample import hash_split

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    tagged = hash_split(orders, "o_orderkey",
                        {"train": 0.8, "val": 0.1, "test": 0.1})
    out = hash_aggregate(tagged, ["split"], {
        "n": ("o_orderkey", "size"),
        "sum_price": ("o_totalprice", "sum"),
    }, num_partitions=4).to_pandas()
    out["n"] = out["n"].astype("int64")
    out = _round(out, ["sum_price"], 2)
    return out[["split", "n", "sum_price"]].sort_values("split") \
        .reset_index(drop=True)


SQL_DATASET_SPLIT = """
    WITH h AS (
        SELECT o_orderkey, o_totalprice,
               CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                    AS BIGINT) AS b
        FROM orders
    ),
    tagged AS (
        -- floor(), not CAST: DuckDB CAST rounds-to-nearest while the
        -- engine's .astype(int64) truncates — an unfloored cut is off by
        -- one at the split boundary (same convention as SQL_SAMPLE_ORDERS)
        SELECT *,
               CASE WHEN b < CAST(floor(0.8 * 4294967296) AS BIGINT)
                        THEN 'train'
                    WHEN b < CAST(floor(0.9 * 4294967296) AS BIGINT)
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM h
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM tagged GROUP BY 1
"""


# ---------------------------------------------------------------------------
# prediction post-processing (reference model.py:27-56) + asymmetric loss
# (model.py:539-548) — the last unported model-layer data-side pieces

_CI_Z = 1.959963984540054   # norm.ppf(0.975); engine recomputes via Acklam
_FLOOR = 2600.0             # clamps ~10% of sf0.01 daily rows (real effect)


def q_forecast_postprocess_daily(sf_dir: str) -> pd.DataFrame:
    """Reference prediction post-processing chained exactly as
    ``predict()`` applies it: floor the ``predicted_*`` columns
    (``_set_forecast_minimum``, model.py:27-35), then add normal-theory
    intervals ``pred ± norm.ppf(.975)·sem(pred)``
    (``_add_simple_confidence_intervals``, model.py:38-56). The sem is a
    distributed (Σx, Σx², n) reduce; the bounds are a broadcast-scalar
    vectorized pass — the prediction table never lands on the driver."""
    from forecastframe_ray.functions import postprocess

    fr = _daily_frame(sf_dir).lag_features("v", [1])

    def as_pred(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["v_lag1"].notna()].copy()
        return pd.DataFrame({"event_type": b["event_type"], "d": b["d"],
                             "predicted_v": b["v_lag1"]})

    preds = fr.dataset.map_batches(as_pred, batch_format="pandas")
    preds = postprocess.set_forecast_minimum(preds, _FLOOR)
    preds = postprocess.add_confidence_intervals(preds, "predicted_v",
                                                 alpha=0.975)
    out = preds.to_pandas()
    return _round(out[["event_type", "d", "predicted_v",
                       "predicted_v_lower", "predicted_v_upper"]],
                  ["predicted_v", "predicted_v_lower", "predicted_v_upper"], 6)


SQL_FORECAST_POSTPROCESS = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    ),
    p AS (
        SELECT event_type, d,
               CASE WHEN lv > {_FLOOR} THEN lv ELSE {_FLOOR} END AS pred
        FROM l WHERE lv IS NOT NULL
    ),
    s AS (SELECT stddev_samp(pred) / sqrt(count(*)) * {_CI_Z!r} AS hw FROM p)
    SELECT event_type, d, round(pred, 6) AS predicted_v,
           round(pred - hw, 6) AS predicted_v_lower,
           round(pred + hw, 6) AS predicted_v_upper
    FROM p, s
"""


def q_asymmetric_loss_naive(sf_dir: str) -> pd.DataFrame:
    """The M5-winning asymmetric validation loss
    (``_custom_asymmetric_valid``, model.py:539-548) of the naive lag-1
    daily forecast: residual² with over-forecasts weighted 1.0 and
    under-forecasts 0.9 — distributed (Σloss, n) partials, tiny reduce."""
    fr = _daily_frame(sf_dir).lag_features("v", [1])
    out = metrics.asymmetric_loss(fr.dataset, "v", "v_lag1",
                                  loss_multiplier=0.9)
    return _round(out[["n", "loss"]], ["loss"], 2)


SQL_ASYMMETRIC_LOSS_NAIVE = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    )
    SELECT count(*) AS n,
           round(avg(CASE WHEN (v - lv) < 0 THEN (v - lv) * (v - lv)
                          ELSE (v - lv) * (v - lv) * 0.9 END), 2) AS loss
    FROM l WHERE lv IS NOT NULL AND v IS NOT NULL
"""


# ---------------------------------------------------------------------------
# GPT-style token-stream packing (pipelines/corpus.pack_token_stream)

_PACK_L = 512          # context length
_PACK_BKT = 128        # small bucket so sf0.01's 500 docs span 4 buckets

_PACK_SQL = rf"""
    WITH t AS (
      SELECT doc_id,
             CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
      FROM documents
    ),
    o AS (
      SELECT doc_id, n,
             CAST(COALESCE(SUM(n + 1) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS g0
      FROM t
    ),
    e AS (
      SELECT doc_id, n, g0,
             g0 // {_PACK_L} AS c0, (g0 + n - 1) // {_PACK_L} AS c1
      FROM o WHERE n > 0
    ),
    x AS (
      SELECT doc_id, n, g0, c0,
             unnest(generate_series(0, c1 - c0)) AS i
      FROM e
    ),
    spans AS (
      SELECT doc_id, CAST(c0 + i AS BIGINT) AS chunk_id,
             CAST(GREATEST(0, (c0 + i) * {_PACK_L} - g0) AS BIGINT)
                 AS tok_start,
             CAST(LEAST(n, (c0 + i + 1) * {_PACK_L} - g0) AS BIGINT)
                 AS tok_end
      FROM x
    )
"""


def q_pack_spans_documents(sf_dir: str) -> pd.DataFrame:
    """GPT-style fixed-context packing of the whitespace token stream
    (docs in doc_id order, 1 EOS separator each, context 512): the
    (doc_id, chunk_id, doc-local token span) assignment, computed by the
    distributed two-pass global prefix sum in
    ``corpus.pack_token_stream`` and pinned row-for-row by the SQL window
    cumsum + generate_series expansion."""
    from forecastframe_ray.pipelines import corpus

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    spans = corpus.pack_token_stream(docs, _PACK_L, sep_tokens=1,
                                     bucket_docs=_PACK_BKT,
                                     num_partitions=8)
    out = spans.to_pandas()
    for c in ["doc_id", "chunk_id", "tok_start", "tok_end"]:
        out[c] = out[c].astype("int64")
    return out[["doc_id", "chunk_id", "tok_start", "tok_end"]]


SQL_PACK_SPANS = _PACK_SQL + """
    SELECT doc_id, chunk_id, tok_start, tok_end FROM spans
"""


def q_pack_chunk_stats_documents(sf_dir: str) -> pd.DataFrame:
    """Per-chunk composition of the packed stream: how many docs and
    content tokens each fixed 512-token chunk holds (separators excluded)
    — the sequence-boundary profile a packing run reports."""
    from forecastframe_ray.pipelines import corpus

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    spans = corpus.pack_token_stream(docs, _PACK_L, sep_tokens=1,
                                     bucket_docs=_PACK_BKT,
                                     num_partitions=8)
    out = corpus.pack_chunk_stats(spans).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_content_tokens"] = out["n_content_tokens"].astype("int64")
    return out[["chunk_id", "n_docs", "n_content_tokens"]]


SQL_PACK_CHUNK_STATS = _PACK_SQL + """
    SELECT chunk_id, count(*) AS n_docs,
           CAST(sum(tok_end - tok_start) AS BIGINT) AS n_content_tokens
    FROM spans GROUP BY 1
"""


# ---------------------------------------------------------------------------
# temperature-based data-mixture sampling (stages/sample.mixture_*)

_MIX_T = 0.5          # 1/T = 2 → pow(p, 2) is the exactly-representable p·p
_MIX_BUDGET = 0.5     # keep half the corpus, redistributed by temperature

_MIX_SQL = """
    WITH s AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ),
    t AS (
      SELECT lang, n, n * 1.0 / (SELECT sum(n) FROM s) AS p FROM s
    ),
    wr AS (SELECT lang, n, p, p * p AS w_raw FROM t),
    w AS (
      SELECT lang, n, p,
             w_raw / (SELECT sum(w_raw) FROM wr) AS w
      FROM wr
    ),
    plan AS (
      SELECT lang, n, p, w,
             round(LEAST(1.0, w * 0.5 * (SELECT sum(n) FROM s) / n), 6)
                 AS rate
      FROM w
    )
"""


def q_mixture_plan_lang(sf_dir: str) -> pd.DataFrame:
    """Temperature-scaled mixture plan over the corpus languages
    (Lample & Conneau 2019 §3.1 sampling rule, T=0.5): per-lang share p,
    mixture weight w ∝ p^(1/T), and the deterministic keep-rate for a
    half-corpus budget. One coarse aggregate; the plan is one tiny row
    per language."""
    from forecastframe_ray.stages import sample as S

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    w = S.mixture_weights(docs, "lang", temperature=_MIX_T)
    budget = _MIX_BUDGET * w["n"].sum()
    w["rate"] = np.round(np.minimum(
        1.0, w["w"].to_numpy(np.float64) * budget
        / w["n"].to_numpy(np.float64)), 6)
    w["n"] = w["n"].astype("int64")
    return _round(w[["lang", "n", "p", "w", "rate"]], ["p", "w"], 6)


SQL_MIXTURE_PLAN = _MIX_SQL + """
    SELECT lang, n, round(p, 6) AS p, round(w, 6) AS w, rate FROM plan
"""


def q_mixture_sample_lang(sf_dir: str) -> pd.DataFrame:
    """The mixture plan applied: per-lang deterministic md5-bucket
    downsample at the temperature-reweighted rates — membership depends
    only on md5(doc_id), so it is identical across cluster shapes and
    resumes, and the SQL twin recomputes it row-for-row."""
    from forecastframe_ray.stages import sample as S

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = S.mixture_sample(docs, "lang", "doc_id",
                           budget_frac=_MIX_BUDGET,
                           temperature=_MIX_T).to_pandas()
    return out[["doc_id", "lang"]].astype({"doc_id": "int64"})


SQL_MIXTURE_SAMPLE = _MIX_SQL + """
    SELECT d.doc_id, d.lang
    FROM documents d JOIN plan USING (lang)
    WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT)
          < CAST(floor(plan.rate * 4294967296) AS BIGINT)
"""


# ---------------------------------------------------------------------------
# Dickey-Fuller unit-root (stationarity) test per series

_DF_CRIT_5PCT = -2.8614   # MacKinnon asymptotic 5% critical value, constant


def q_dickey_fuller_daily(sf_dir: str) -> pd.DataFrame:
    """Dickey-Fuller unit-root test per daily series (lag-0, constant):
    regress Δv_t on v_{t−1} by the closed-form 1-regressor OLS and report
    the t-statistic ρ̂/se(ρ̂) plus the 5%-level stationarity flag
    (|MacKinnon| asymptotic critical value −2.8614). The standard
    stationarity diagnostic before differencing/detrending a series
    (Dickey & Fuller 1979 — public). Each series reduces to six sums
    inside the keyed partition kernel; both sides use the identical
    raw-sums algebra so the rounded statistics hash-match."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def df_test(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n = len(v)
            m = n - 1
            rho = stat = np.nan
            if m >= 3:
                x, d = v[:-1], np.diff(v)
                mx, md = x.sum() / m, d.sum() / m
                sxx_c = (x * x).sum() - m * mx * mx
                sxy_c = (x * d).sum() - m * mx * md
                sdd_c = (d * d).sum() - m * md * md
                if sxx_c > 0:
                    rho = sxy_c / sxx_c
                    s2 = (sdd_c - rho * sxy_c) / (m - 2)
                    if s2 > 0:
                        stat = rho / np.sqrt(s2 / sxx_c)
            rho_r = np.round(rho, 6)
            stat_r = np.round(stat, 6)
            rows.append((et, m, rho_r, stat_r,
                         bool(stat_r < _DF_CRIT_5PCT)
                         if not np.isnan(stat_r) else False))
        return pd.DataFrame(rows, columns=["event_type", "m", "rho",
                                           "df_stat", "stationary"])

    out = keyed_map_partitions(daily, ["event_type"], df_test,
                               num_partitions=_NP).to_pandas()
    out["m"] = out["m"].astype("int64")
    out["stationary"] = out["stationary"].astype("bool")
    out = _fill(out, ["rho", "df_stat"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DICKEY_FULLER_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type,
               v - LAG(v) OVER w AS dy,
               LAG(v) OVER w AS x
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    e AS (SELECT event_type, dy, x FROM l WHERE x IS NOT NULL),
    s AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS m,
               sum(x) / count(*) AS mx, sum(dy) / count(*) AS md,
               sum(x * dy) AS sxy, sum(x * x) AS sxx, sum(dy * dy) AS sdd
        FROM e GROUP BY 1
    ),
    c AS (
        SELECT event_type, m,
               sxy - m * mx * md AS sxy_c,
               sxx - m * mx * mx AS sxx_c,
               sdd - m * md * md AS sdd_c
        FROM s
    ),
    r AS (
        SELECT event_type, m,
               CASE WHEN m >= 3 AND sxx_c > 0
                    THEN sxy_c / sxx_c END AS rho,
               sxx_c, sdd_c, sxy_c
        FROM c
    ),
    f AS (
        SELECT event_type, m, rho, sxx_c,
               CASE WHEN rho IS NOT NULL
                    THEN (sdd_c - rho * sxy_c) / (m - 2) END AS s2
        FROM r
    ),
    z AS (
        SELECT event_type, m, round(rho, 6) AS rho,
               round(CASE WHEN s2 > 0
                          THEN rho / sqrt(s2 / sxx_c) END, 6) AS df_stat
        FROM f
    )
    SELECT event_type, m,
           COALESCE(rho, {NULLF}) AS rho,
           COALESCE(df_stat, {NULLF}) AS df_stat,
           COALESCE(df_stat < {_DF_CRIT_5PCT}, false) AS stationary
    FROM z
"""


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau whiteness test (over the shared lag-corr estimator)

_LB_CHI2_3DOF_5PCT = 7.8147   # chi-square 5% critical value, 3 dof (public)


def q_ljung_box_daily(sf_dir: str) -> pd.DataFrame:
    """Ljung-Box Q over lags 1-3 per daily series:
    ``Q = n(n+2) Σ_k r_k² / (n−k)`` with the engine's shared pairwise
    ``corr(v, LAG(v,k))`` lag-correlation estimator (documented variant —
    identical on both sides, so the statistic hash-matches), plus the
    5%-level reject-whiteness flag against the 3-dof chi-square critical
    value. The distributed part is the one keyed lag attach + tiny
    per-series reduce shared with ACF/PACF (Ljung & Box 1978 — public)."""
    df = _lag_corr_table(sf_dir, (1, 2, 3))
    n = df["n1"].to_numpy(np.float64) + 1.0   # pairs at lag 1 = n − 1
    q = np.zeros(len(df))
    for k in (1, 2, 3):
        r = df[f"r{k}"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            q = q + np.where(n - k > 0, r * r / (n - k), np.nan)
    q = np.round(n * (n + 2.0) * q, 6)
    out = pd.DataFrame({
        "event_type": df["event_type"],
        "n": (df["n1"] + 1).astype("int64"),
        "lb_stat": q,
        "reject_white": np.where(np.isnan(q), False,
                                 q > _LB_CHI2_3DOF_5PCT).astype(bool),
    })
    out = _fill(out, ["lb_stat"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_LJUNG_BOX_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, v,
               LAG(v, 1) OVER w AS v1, LAG(v, 2) OVER w AS v2,
               LAG(v, 3) OVER w AS v3
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    s AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               corr(v, v1) AS r1, corr(v, v2) AS r2, corr(v, v3) AS r3
        FROM l GROUP BY 1
    ),
    z AS (
        SELECT event_type, n,
               round(n * (n + 2.0) * (r1 * r1 / (n - 1)
                     + r2 * r2 / (n - 2) + r3 * r3 / (n - 3)), 6) AS lb_stat
        FROM s
    )
    SELECT event_type, n,
           COALESCE(lb_stat, {NULLF}) AS lb_stat,
           COALESCE(lb_stat > {_LB_CHI2_3DOF_5PCT}, false) AS reject_white
    FROM z
"""


def q_ts_strength_daily(sf_dir: str) -> pd.DataFrame:
    """Trend / seasonal strength per daily series (Hyndman &
    Athanasopoulos, FPP3 §4.3 — public): with the additive decomposition's
    components, ``F_trend = max(0, 1 − var(resid)/var(trend+resid))`` and
    ``F_seasonal = max(0, 1 − var(resid)/var(seasonal+resid))``. Both
    engines compute from the decomposition's 6dp-rounded components (the
    query surface of ``seasonal_decompose_daily``) so the variances agree;
    zero-variance denominators yield NULLF."""
    from forecastframe_ray.stages.keyed import keyed_window_stage

    daily = _bucket_series(sf_dir, DAY_US, "d")
    dec = keyed_window_stage(
        daily, ["event_type"], "d",
        [{"op": "seasonal_decompose", "feature": "v", "ma_window": 7}],
        num_partitions=_NP)

    def parts(b: pd.DataFrame) -> pd.DataFrame:
        r = b["v_resid"].to_numpy(np.float64)
        t = b["v_trend"].to_numpy(np.float64)
        s = b["v_seasonal"].to_numpy(np.float64)
        return pd.DataFrame({"event_type": b["event_type"],
                             "__r": r, "__tr": t + r, "__sr": s + r})

    v = hash_aggregate(dec.map_batches(parts, batch_format="pandas"),
                       ["event_type"],
                       {"vr": ("__r", "var"), "vtr": ("__tr", "var"),
                        "vsr": ("__sr", "var")},
                       num_partitions=4).to_pandas()

    def strength(num: pd.Series, den: pd.Series) -> np.ndarray:
        den_a = den.to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            f = np.where(den_a > 0,
                         np.maximum(0.0, 1.0 - num.to_numpy(np.float64)
                                    / np.where(den_a > 0, den_a, 1.0)),
                         np.nan)
        return np.round(f, 6)

    out = pd.DataFrame({"event_type": v["event_type"],
                        "f_trend": strength(v["vr"], v["vtr"]),
                        "f_seasonal": strength(v["vr"], v["vsr"])})
    out = _fill(out, ["f_trend", "f_seasonal"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_TS_STRENGTH_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (
        SELECT event_type, d, v,
               avg(v) OVER (PARTITION BY event_type ORDER BY d
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS trend
        FROM daily
    ),
    s AS (
        SELECT event_type, d, v, trend,
               avg(v - trend) OVER (PARTITION BY event_type, dayofweek(d))
                   AS seasonal
        FROM t
    ),
    comp AS (
        SELECT event_type,
               round(trend, 6) AS tr,
               round(seasonal, 6) AS se,
               round(v - trend - seasonal, 6) AS re
        FROM s
    ),
    vv AS (
        SELECT event_type, var_samp(re) AS vr,
               var_samp(tr + re) AS vtr, var_samp(se + re) AS vsr
        FROM comp GROUP BY 1
    )
    SELECT event_type,
           COALESCE(round(CASE WHEN vtr > 0
                    THEN GREATEST(0, 1 - vr / vtr) END, 6), {NULLF})
               AS f_trend,
           COALESCE(round(CASE WHEN vsr > 0
                    THEN GREATEST(0, 1 - vr / vsr) END, 6), {NULLF})
               AS f_seasonal
    FROM vv
"""


def q_demand_classification_users(sf_dir: str) -> pd.DataFrame:
    """Syntetos-Boylan demand-pattern classification per user series
    (Syntetos & Boylan 2005 — public; the diagnostic that decides when the
    Croston estimator applies): ADI = active-span days / demand days and
    CV² of the daily demand sizes, classified at the standard cutoffs
    (ADI 1.32, CV² 0.49) into smooth / intermittent / erratic / lumpy.
    Two coarse-hash aggregates — (user, day) demand sums, then one row per
    user; the class is derived from the 6dp-rounded measures on BOTH sides
    so the label can never straddle a float boundary."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b["user_id"],
                             "d": b["ts"].dt.floor("D"),
                             "v": b["value"]})

    daily = hash_aggregate(ev.map_batches(day_fn, batch_format="pandas"),
                           ["user_id", "d"], {"v": ("v", "sum")},
                           num_partitions=_NP, hash_keys=["user_id"])
    per_user = hash_aggregate(
        daily, ["user_id"],
        {"n_days": ("v", "size"), "first_d": ("d", "min"),
         "last_d": ("d", "max"), "mu": ("v", "mean"), "sd": ("v", "std")},
        num_partitions=4).to_pandas()

    span = (per_user["last_d"] - per_user["first_d"]).dt.days.to_numpy(
        np.float64) + 1.0
    n = per_user["n_days"].to_numpy(np.float64)
    adi = np.round(span / n, 6)
    mu = per_user["mu"].to_numpy(np.float64)
    sd = per_user["sd"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        cv2 = np.round((sd / mu) ** 2, 6)
    # mu == 0 divides to inf in numpy but NULL in SQL — align on NULL
    cv2 = np.where(np.isfinite(cv2), cv2, np.nan)
    cls = np.where(
        np.isnan(cv2), "insufficient",
        np.where(adi < 1.32, np.where(cv2 < 0.49, "smooth", "erratic"),
                 np.where(cv2 < 0.49, "intermittent", "lumpy")))
    out = pd.DataFrame({"user_id": per_user["user_id"],
                        "n_days": per_user["n_days"].astype("int64"),
                        "adi": adi, "cv2": cv2, "demand_class": cls})
    out = _fill(out, ["cv2"])
    return out.sort_values("user_id").reset_index(drop=True)


SQL_DEMAND_CLASSIFICATION = f"""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        FROM events GROUP BY 1, 2
    ),
    u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
               min(d) AS first_d, max(d) AS last_d,
               avg(v) AS mu, stddev_samp(v) AS sd
        FROM daily GROUP BY 1
    ),
    m AS (
        SELECT user_id, n_days,
               round((date_diff('day', first_d, last_d) + 1.0)
                     / n_days, 6) AS adi,
               round((sd / mu) * (sd / mu), 6) AS cv2
        FROM u
    )
    SELECT user_id, n_days, adi,
           COALESCE(cv2, {NULLF}) AS cv2,
           CASE WHEN cv2 IS NULL THEN 'insufficient'
                WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
                WHEN adi < 1.32 THEN 'erratic'
                WHEN cv2 < 0.49 THEN 'intermittent'
                ELSE 'lumpy' END AS demand_class
    FROM m
"""


def q_theta_forecast_gate_daily(sf_dir: str) -> pd.DataFrame:
    """Theta-method forecast (M3 winner), oracle-GATED through the α=1
    degenerate form: the SES level collapses to the last θ=2 value
    ``2·y_T − theta0_T``, so ŷ(T+h) = ½·theta0(T+h) + ½·(2y_T − theta0_T)
    with theta0 the per-series centered OLS line — every term
    SQL-expressible with the identical centered raw-sums algebra. The gate
    exercises the full machinery (co-located fit kernel, per-series state,
    future-grid scorer); general α is pinned by pytest against a direct
    numpy recursion."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", estimator="theta", alpha=1.0)
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    return df.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_THETA_FORECAST_GATE = f"""
    WITH daily AS ({_DAILY_SQL}),
    dn AS (
        SELECT event_type, d, v,
               CAST(epoch_us(d) // 86400000000 AS DOUBLE) AS t
        FROM daily
    ),
    m AS (
        SELECT event_type, avg(t) AS mx, avg(v) AS my FROM dn GROUP BY 1
    ),
    c AS (
        SELECT dn.event_type, dn.d, dn.v, dn.t, m.mx, m.my,
               (dn.t - m.mx) AS tc
        FROM dn JOIN m USING (event_type)
    ),
    s AS (
        SELECT event_type, mx, my,
               sum(tc * (v - my)) AS sxy, sum(tc * tc) AS sxx
        FROM c GROUP BY 1, 2, 3
    ),
    sl AS (
        SELECT event_type, mx, my,
               CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END AS b
        FROM s
    ),
    r AS (
        SELECT event_type, v, t,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC)
                   AS rn
        FROM dn
    ),
    lastv AS (
        SELECT event_type,
               max(CASE WHEN rn = 1 THEN v END) AS y_last,
               max(CASE WHEN rn = 1 THEN t END) AS t_last
        FROM r GROUP BY 1
    ),
    f AS (  -- engine future grid extends from the GLOBAL max date
        SELECT sl.event_type, sl.mx, sl.my, sl.b,
               lastv.y_last, lastv.t_last, fd.d,
               CAST(epoch_us(fd.d) // 86400000000 AS DOUBLE) AS tf
        FROM sl JOIN lastv USING (event_type)
        CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    )
    SELECT event_type, d,
           round(0.5 * (my + b * (tf - mx))
                 + 0.5 * (2 * y_last - (my + b * (t_last - mx))), 6)
               AS predicted_v
    FROM f
"""


def q_exact_dedup_keep_best_documents(sf_dir: str) -> pd.DataFrame:
    """Exact dedup with the preferred-provenance keep rule: per distinct
    text keep the copy from the alphabetically-first source (doc_id as
    tie-break) instead of the plain min-id — the crawl-pipeline policy for
    choosing which duplicate survives. Oracle: ROW_NUMBER over
    (digest ORDER BY source, doc_id)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    out = dedup.exact_dedup_keep_best(docs, [("source", True)]).to_pandas()
    return out[["doc_id", "source"]].astype({"doc_id": "int64"}) \
        .sort_values("doc_id").reset_index(drop=True)


SQL_EXACT_DEDUP_KEEP_BEST = """
    WITH r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY md5(text)
                                  ORDER BY source ASC, doc_id ASC) AS rn
        FROM documents
    )
    SELECT doc_id, source FROM r WHERE rn = 1 ORDER BY doc_id
"""


def q_croston_sba_gate_daily(sf_dir: str) -> pd.DataFrame:
    """SBA-debiased Croston forecast (Syntetos-Boylan Approximation 2005:
    Croston × (1 − α/2)), gated through the same α=1 closed form as
    ``croston_gate_daily`` — at α=1 the factor is exactly 0.5, so the SQL
    oracle is half the Croston gate. Exercises the shared-fit /
    scorer-only-variant estimator registration."""
    from forecastframe_ray.pipelines.search import (fit_croston,
                                                    score_croston_sba)

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def mask(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        dow = b["d"].dt.dayofweek.to_numpy()
        b["v"] = np.where(np.isin(dow, (0, 3, 5)),
                          b["v"].to_numpy(np.float64), 0.0)
        return b

    masked = daily.map_batches(mask, batch_format="pandas").materialize()
    state = fit_croston(masked, ["event_type"], "d", "v", alpha=1.0)
    one = masked.map_batches(
        lambda b: b.drop_duplicates("event_type")[["event_type", "d"]],
        batch_format="pandas")
    scored = score_croston_sba(one, state, ["event_type"], "d", "v",
                               "sba_forecast").to_pandas()
    out = scored.drop_duplicates("event_type")[
        ["event_type", "sba_forecast"]]
    out = _round(out, ["sba_forecast"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_CROSTON_SBA_GATE = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (
        SELECT event_type, d,
               CASE WHEN (isodow(d) - 1) IN (0, 3, 5) THEN v ELSE 0 END AS v
        FROM daily
    ),
    start AS (SELECT event_type, min(d) AS d0 FROM m GROUP BY 1),
    nz AS (
        SELECT event_type, d, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC)
                   AS rn
        FROM m WHERE v <> 0
    ),
    lastnz AS (
        SELECT event_type,
               max(CASE WHEN rn = 1 THEN v END) AS q_last,
               max(CASE WHEN rn = 1 THEN d END) AS t1,
               max(CASE WHEN rn = 2 THEN d END) AS t2
        FROM nz GROUP BY 1
    )
    SELECT s.event_type,
           COALESCE(round(0.5 * l.q_last / CASE
               WHEN l.t2 IS NOT NULL THEN datediff('day', l.t2, l.t1)
               ELSE datediff('day', s.d0, l.t1) + 1 END, 6), 0.0)
               AS sba_forecast
    FROM start s LEFT JOIN lastnz l USING (event_type)
"""


def q_seasonal_naive_forecast_daily(sf_dir: str) -> pd.DataFrame:
    """Seasonal-naive baseline forecast (FPP3 §5.2), EXACT oracle — no
    degenerate gate needed: the 7-day-horizon forecast is the most recent
    same-phase (same weekday) observation per series, reproduced in SQL by
    a ROW_NUMBER over (series, day_number mod 7)."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", estimator="seasonal_naive",
                       period=7)
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    df = _fill(df, ["predicted_v"])
    return df.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_SEASONAL_NAIVE_FORECAST = f"""
    WITH daily AS ({_DAILY_SQL}),
    dn AS (
        SELECT event_type, d, v,
               epoch_us(d) // 86400000000 AS t
        FROM daily
    ),
    r AS (
        SELECT event_type, t % 7 AS phase, v,
               ROW_NUMBER() OVER (PARTITION BY event_type, t % 7
                                  ORDER BY t DESC) AS rn
        FROM dn
    ),
    ph AS (SELECT event_type, phase, v FROM r WHERE rn = 1),
    series AS (SELECT DISTINCT event_type FROM daily),
    f AS (  -- engine future grid extends from the GLOBAL max date
        SELECT s.event_type, fd.d,
               (epoch_us(fd.d) // 86400000000) % 7 AS phase
        FROM series s CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    )
    SELECT f.event_type, f.d,
           COALESCE(round(ph.v, 6), {NULLF}) AS predicted_v
    FROM f LEFT JOIN ph ON f.event_type = ph.event_type
                       AND f.phase = ph.phase
"""


def q_drift_forecast_daily(sf_dir: str) -> pd.DataFrame:
    """Drift-method baseline forecast (FPP3 §5.2), EXACT oracle:
    ŷ(t) = y_last + (t − t_last)·(y_last − y_first)/(t_last − t_first)
    per series, i.e. the line through the first and last observations."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", estimator="drift")
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    return df.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_DRIFT_FORECAST = f"""
    WITH daily AS ({_DAILY_SQL}),
    dn AS (
        SELECT event_type, d, v,
               CAST(epoch_us(d) // 86400000000 AS DOUBLE) AS t
        FROM daily
    ),
    r AS (
        SELECT event_type, v, t,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY t ASC)
                   AS ra,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY t DESC)
                   AS rd
        FROM dn
    ),
    ends AS (
        SELECT event_type,
               max(CASE WHEN ra = 1 THEN v END) AS y0,
               max(CASE WHEN ra = 1 THEN t END) AS t0,
               max(CASE WHEN rd = 1 THEN v END) AS y1,
               max(CASE WHEN rd = 1 THEN t END) AS t1
        FROM r GROUP BY 1
    ),
    f AS (
        SELECT e.*, fd.d,
               CAST(epoch_us(fd.d) // 86400000000 AS DOUBLE) AS tf
        FROM ends e CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    )
    SELECT event_type, d,
           round(y1 + (tf - t1) * CASE WHEN t1 > t0
                 THEN (y1 - y0) / (t1 - t0) ELSE 0.0 END, 6)
               AS predicted_v
    FROM f
"""


def q_zipf_fit_documents(sf_dir: str) -> pd.DataFrame:
    """Zipf power-law fit over the corpus vocabulary (Zipf 1935 — public;
    the classic sanity diagnostic that a text corpus is natural-language-
    like): OLS slope of log(count) on log(rank) over the top-200 tokens,
    plus R². The vocabulary reduce is distributed (combiner + coarse
    merge); the 200-row fit is centered driver algebra reproduced
    term-for-term in SQL."""
    from forecastframe_ray.pipelines.corpus import token_vocabulary

    docs = _read(sf_dir, "documents", ["text"])
    vocab = token_vocabulary(docs, top_k=200, num_partitions=_NP)
    y = np.log(vocab["n"].to_numpy(np.float64))
    x = np.log(np.arange(1, len(vocab) + 1, dtype=np.float64))
    xc, yc = x - x.mean(), y - y.mean()
    sxx, syy, sxy = (xc * xc).sum(), (yc * yc).sum(), (xc * yc).sum()
    slope = sxy / sxx
    r2 = (sxy * sxy) / (sxx * syy)
    return pd.DataFrame({"n_tokens": pd.array([len(vocab)], dtype="int64"),
                         "zipf_slope": [np.round(slope, 6)],
                         "r2": [np.round(r2, 6)]})


SQL_ZIPF_FIT = r"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY 1
      ORDER BY n DESC, token LIMIT 200
    ),
    rk AS (
      SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS DOUBLE))
                 AS x,
             ln(CAST(n AS DOUBLE)) AS y
      FROM vocab
    ),
    m AS (SELECT avg(x) AS mx, avg(y) AS my, count(*) AS k FROM rk),
    s AS (
      SELECT sum((x - mx) * (y - my)) AS sxy,
             sum((x - mx) * (x - mx)) AS sxx,
             sum((y - my) * (y - my)) AS syy,
             max(k) AS k
      FROM rk, m
    )
    SELECT CAST(k AS BIGINT) AS n_tokens,
           round(sxy / sxx, 6) AS zipf_slope,
           round(sxy * sxy / (sxx * syy), 6) AS r2
    FROM s
"""


def q_baseline_leaderboard_daily(sf_dir: str) -> pd.DataFrame:
    """Model-selection capstone with a FULL SQL oracle: hold out the last
    7 days of each daily series, fit the three exactly-reproducible
    baseline estimators (per-weekday seasonal mean, seasonal naive,
    drift) on the train window only, score the holdout and rank by RMSE —
    the leaderboard a reference user gets from ``cross_validate`` across
    models (model.py:1356+), restricted to the estimators whose entire
    fit+score is SQL-expressible so the driver verifies every number."""
    from forecastframe_ray.functions.metrics import error_summary
    from forecastframe_ray.pipelines import search

    daily = _bucket_series(sf_dir, DAY_US, "d").materialize()
    split = daily.aggregate(ray.data.aggregate.Max("d"))["max(d)"] \
        - pd.Timedelta(days=7)
    train = daily.map_batches(lambda b: b[b["d"] <= split],
                              batch_format="pandas").materialize()
    test = daily.map_batches(lambda b: b[b["d"] > split],
                             batch_format="pandas").materialize()

    rows = []
    for name, params in [("seasonal_mean", {"season": "dow"}),
                         ("seasonal_naive", {"period": 7}),
                         ("drift", {})]:
        fit_fn, score_fn, _ = search.ESTIMATORS[name]
        state = fit_fn(train, ["event_type"], "d", "v", **params)
        scored = score_fn(test, state, ["event_type"], "d", "v", "pred")
        summ = error_summary(scored, "v", "pred")
        rows.append((name, int(summ["n"].iloc[0]),
                     np.round(float(summ["RMSE"].iloc[0]), 4)))
    out = pd.DataFrame(rows, columns=["estimator", "n", "rmse"])
    return out.sort_values("rmse").reset_index(drop=True)


SQL_BASELINE_LEADERBOARD = f"""
    WITH daily AS ({_DAILY_SQL}),
    split AS (SELECT max(d) - INTERVAL 7 DAY AS sd FROM daily),
    train AS (SELECT daily.* FROM daily, split WHERE d <= sd),
    test AS (SELECT daily.* FROM daily, split WHERE d > sd),
    -- seasonal mean: per-(series, weekday) train mean
    sm AS (
        SELECT event_type, isodow(d) - 1 AS dow, avg(v) AS pred
        FROM train GROUP BY 1, 2
    ),
    sm_err AS (
        SELECT t.v, sm.pred FROM test t
        JOIN sm ON t.event_type = sm.event_type
               AND isodow(t.d) - 1 = sm.dow
    ),
    -- seasonal naive: latest train value per (series, day_number mod 7)
    dn AS (SELECT event_type, d, v,
                  epoch_us(d) // 86400000000 AS t FROM train),
    snr AS (
        SELECT event_type, t % 7 AS phase, v,
               ROW_NUMBER() OVER (PARTITION BY event_type, t % 7
                                  ORDER BY t DESC) AS rn
        FROM dn
    ),
    sn AS (SELECT event_type, phase, v AS pred FROM snr WHERE rn = 1),
    sn_err AS (
        SELECT t.v, sn.pred FROM test t
        JOIN sn ON t.event_type = sn.event_type
               AND (epoch_us(t.d) // 86400000000) % 7 = sn.phase
    ),
    -- drift: line through first/last train observation
    dr AS (
        SELECT event_type, v,
               CAST(epoch_us(d) // 86400000000 AS DOUBLE) AS t,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d ASC)
                   AS ra,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC)
                   AS rd
        FROM train
    ),
    ends AS (
        SELECT event_type,
               max(CASE WHEN ra = 1 THEN v END) AS y0,
               max(CASE WHEN ra = 1 THEN t END) AS t0,
               max(CASE WHEN rd = 1 THEN v END) AS y1,
               max(CASE WHEN rd = 1 THEN t END) AS t1
        FROM dr GROUP BY 1
    ),
    dr_err AS (
        SELECT t.v,
               e.y1 + (CAST(epoch_us(t.d) // 86400000000 AS DOUBLE) - e.t1)
                 * CASE WHEN e.t1 > e.t0
                        THEN (e.y1 - e.y0) / (e.t1 - e.t0) ELSE 0.0 END
                   AS pred
        FROM test t JOIN ends e USING (event_type)
    ),
    all_err AS (
        SELECT 'seasonal_mean' AS estimator, v, pred FROM sm_err
        UNION ALL
        SELECT 'seasonal_naive', v, pred FROM sn_err
        UNION ALL
        SELECT 'drift', v, pred FROM dr_err
    )
    SELECT estimator, CAST(count(*) AS BIGINT) AS n,
           round(sqrt(avg((v - pred) * (v - pred))), 4) AS rmse
    FROM all_err GROUP BY 1 ORDER BY rmse
"""


def q_ses_naive_gate_daily(sf_dir: str) -> pd.DataFrame:
    """SES forecast, oracle-GATED through the α=1 degenerate form: the
    level collapses to the last observation, i.e. the naive flat forecast
    per series — exactly SQL-expressible. General α is hypothesis-pinned
    against a direct numpy recursion."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", estimator="ses", alpha=1.0)
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    return df.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_SES_NAIVE_GATE = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC)
                   AS rn
        FROM daily
    ),
    lastv AS (SELECT event_type, v FROM r WHERE rn = 1),
    f AS (
        SELECT l.event_type, l.v, fd.d
        FROM lastv l CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    )
    SELECT event_type, d, round(v, 6) AS predicted_v FROM f
"""


def q_heaps_fit_documents(sf_dir: str) -> pd.DataFrame:
    """Heaps-law fit (Heaps 1978 — public; the vocabulary-growth twin of
    the Zipf check): OLS of log(cumulative distinct tokens) on
    log(cumulative total tokens) across the ten doc-id deciles — β in
    V(n) ∝ n^β, with R². Reuses the distributed first-introduction reduce
    of ``vocab_growth_documents`` plus one per-decile token-count
    aggregate; the 10-point fit is centered driver algebra mirrored in
    SQL."""
    from forecastframe_ray.stages.agg import hash_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    hi = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id"]).column("doc_id")
    import pyarrow.compute as pc
    lo_id, hi_id = pc.min(hi).as_py(), pc.max(hi).as_py()
    span = max(hi_id - lo_id + 1, 1)

    def decile_of(d: np.ndarray) -> np.ndarray:
        return np.minimum((d - lo_id) * 10 // span, 9).astype(np.int64)

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        ex = b["text"].str.split().explode().dropna()
        g = pd.DataFrame({
            "token": ex.to_numpy(),
            "doc_id": b["doc_id"].to_numpy()[ex.index.to_numpy()],
        })
        return g.groupby("token", sort=False, as_index=False)["doc_id"].min()

    first = hash_aggregate(docs.map_batches(toks, batch_format="pandas"),
                           ["token"], {"first_doc": ("doc_id", "min")},
                           num_partitions=_NP)
    new_tok = hash_aggregate(first.map_batches(
        lambda b: pd.DataFrame({"decile": decile_of(
            b["first_doc"].to_numpy(np.int64)),
            "one": np.ones(len(b), dtype=np.int64)}),
        batch_format="pandas"),
        ["decile"], {"new_tokens": ("one", "sum")},
        num_partitions=4).to_pandas()

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "decile": decile_of(b["doc_id"].to_numpy(np.int64)),
            "n_tok": b["text"].fillna("").str.count(r"\S+")
            .to_numpy(np.int64)})

    tok_per = hash_aggregate(docs.map_batches(counts, batch_format="pandas"),
                             ["decile"], {"tokens": ("n_tok", "sum")},
                             num_partitions=4).to_pandas()

    # every decile has token mass; deciles introducing NO new vocabulary
    # still belong on the curve (left join + zero-fill) — a tiny synthetic
    # vocabulary otherwise collapses the fit to one point
    m = tok_per.merge(new_tok, on="decile", how="left") \
        .fillna({"new_tokens": 0}).sort_values("decile")
    x = np.log(np.cumsum(m["tokens"].to_numpy(np.float64)))
    y = np.log(np.cumsum(m["new_tokens"].to_numpy(np.float64)))
    xc, yc = x - x.mean(), y - y.mean()
    sxx, syy, sxy = (xc * xc).sum(), (yc * yc).sum(), (xc * yc).sum()
    beta = np.round(sxy / sxx, 6) if sxx > 0 else np.nan
    r2 = np.round(sxy * sxy / (sxx * syy), 6) \
        if sxx > 0 and syy > 0 else np.nan
    out = pd.DataFrame({
        "n_points": pd.array([len(m)], dtype="int64"),
        "heaps_beta": [beta], "r2": [r2]})
    return _fill(out, ["heaps_beta", "r2"])


SQL_HEAPS_FIT = rf"""
    WITH bounds AS (
        SELECT min(doc_id) AS lo,
               greatest(max(doc_id) - min(doc_id) + 1, 1) AS span
        FROM documents
    ),
    first AS (
        SELECT x AS token, min(doc_id) AS first_doc
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                                        t -> t <> '')) AS x
              FROM documents)
        GROUP BY 1
    ),
    nt AS (
        SELECT CAST(least((first_doc - bounds.lo) * 10 // bounds.span, 9)
                    AS BIGINT) AS decile,
               CAST(count(*) AS BIGINT) AS new_tokens
        FROM first, bounds GROUP BY 1
    ),
    tp AS (
        SELECT CAST(least((doc_id - bounds.lo) * 10 // bounds.span, 9)
                    AS BIGINT) AS decile,
               CAST(sum(length(regexp_extract_all(text, '\S+')))
                    AS BIGINT) AS tokens
        FROM documents, bounds GROUP BY 1
    ),
    cum AS (
        SELECT tp.decile,
               ln(CAST(sum(tp.tokens) OVER w AS DOUBLE)) AS x,
               ln(CAST(sum(COALESCE(nt.new_tokens, 0)) OVER w AS DOUBLE))
                   AS y
        FROM tp LEFT JOIN nt USING (decile)
        WINDOW w AS (ORDER BY tp.decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    m AS (SELECT avg(x) AS mx, avg(y) AS my, count(*) AS k FROM cum),
    s AS (
        SELECT sum((x - mx) * (y - my)) AS sxy,
               sum((x - mx) * (x - mx)) AS sxx,
               sum((y - my) * (y - my)) AS syy, max(k) AS k
        FROM cum, m
    )
    SELECT CAST(k AS BIGINT) AS n_points,
           COALESCE(round(CASE WHEN sxx > 0 THEN sxy / sxx END, 6),
                    {NULLF}) AS heaps_beta,
           COALESCE(round(CASE WHEN sxx > 0 AND syy > 0
                          THEN sxy * sxy / (sxx * syy) END, 6),
                    {NULLF}) AS r2
    FROM s
"""


def q_trimmed_mean_events(sf_dir: str) -> pd.DataFrame:
    """Per-type 10-90% trimmed mean of the raw event values — the robust
    location statistic (drop each group's outer deciles, then mean). The
    decile bounds come from the engine's range-partition order-statistics
    plan (:func:`interpret.grouped_quantiles` — constant driver traffic);
    the trim itself is one broadcast-bounds masked partial-sum pass."""
    from forecastframe_ray.pipelines.interpret import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    qb = grouped_quantiles(ev, ["event_type"], "value", qs=(0.1, 0.9))
    lo = dict(zip(qb["event_type"], qb["q10"]))
    hi = dict(zip(qb["event_type"], qb["q90"]))

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(np.float64)
        l = b["event_type"].map(lo).to_numpy(np.float64)
        h = b["event_type"].map(hi).to_numpy(np.float64)
        keep = (v >= l) & (v <= h)
        g = pd.DataFrame({"event_type": b["event_type"][keep],
                          "__v": v[keep]})
        return g

    out = hash_aggregate(ev.map_batches(partials, batch_format="pandas"),
                         ["event_type"],
                         {"n_kept": ("__v", "size"),
                          "trimmed_mean": ("__v", "mean")},
                         num_partitions=4).to_pandas()
    out["n_kept"] = out["n_kept"].astype("int64")
    out = _round(out, ["trimmed_mean"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_TRIMMED_MEAN_EVENTS = """
    WITH b AS (
        SELECT event_type,
               percentile_cont(0.1) WITHIN GROUP (ORDER BY value) AS lo,
               percentile_cont(0.9) WITHIN GROUP (ORDER BY value) AS hi
        FROM events GROUP BY 1
    )
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_kept,
           round(avg(e.value), 6) AS trimmed_mean
    FROM events e JOIN b USING (event_type)
    WHERE e.value >= b.lo AND e.value <= b.hi
    GROUP BY 1
"""


def q_rolling_skew_daily(sf_dir: str) -> pd.DataFrame:
    """W1 rolling third-moment shape statistic: 7-day lag-1 rolling sample
    skewness (adjusted Fisher-Pearson — the pandas ``rolling().skew()``
    convention DuckDB's ``skewness`` shares) per series. Windows with
    fewer than 3 points are NULL on both sides."""
    fr = _daily_frame(sf_dir).calc_statistical_features(
        "v", windows=7, aggregations=["skew"], lag=1, min_periods=1)
    col = "v_skew_roll7_lag1"
    df = fr.to_pandas()[["event_type", "d", "v", col]]
    df = _round(df, [col], 6)
    return _fill(df, [col])


SQL_ROLLING_SKEW_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v, epoch_us(d) // {DAY_US} AS dn,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS lv
        FROM daily
    )
    SELECT event_type, d, v,
           COALESCE(round(CASE WHEN count(lv) OVER w >= 3
                          THEN skewness(lv) OVER w END, 6), {NULLF})
               AS v_skew_roll7_lag1
    FROM l WINDOW w AS (PARTITION BY event_type ORDER BY dn
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_rolling_corr_market_daily(sf_dir: str) -> pd.DataFrame:
    """Rolling co-movement with the market: per series, the 7-day lag-1
    rolling correlation between its daily value and the all-series daily
    total — the rolling-beta-style feature a hierarchical forecaster reads
    per leaf. Day totals reduce to day cardinality (tiny broadcast); the
    windowed correlation is a per-series pandas kernel mirrored by
    DuckDB's windowed corr (NULL for <2 points / zero variance)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d").materialize()
    totals = hash_aggregate(daily, ["d"], {"tot": ("v", "sum")},
                            num_partitions=4).to_pandas()
    tot_map = dict(zip(totals["d"], totals["tot"]))

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            lv = g["v"].shift(1)
            lt = g["d"].map(tot_map).shift(1)
            corr = lv.rolling(7, min_periods=2).corr(lt)
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"], "v": g["v"],
                "v_corr_market_roll7_lag1":
                    np.round(corr.to_numpy(np.float64), 6) + 0.0,
            }))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v",
                                  "v_corr_market_roll7_lag1"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = _fill(out, ["v_corr_market_roll7_lag1"])
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_ROLLING_CORR_MARKET = f"""
    WITH daily AS ({_DAILY_SQL}),
    tot AS (SELECT d, sum(v) AS tot FROM daily GROUP BY 1),
    l AS (
        SELECT daily.event_type, daily.d, daily.v,
               epoch_us(daily.d) // {DAY_US} AS dn,
               LAG(daily.v, 1) OVER w0 AS lv,
               LAG(tot.tot, 1) OVER w0 AS lt
        FROM daily JOIN tot USING (d)
        WINDOW w0 AS (PARTITION BY daily.event_type ORDER BY daily.d)
    )
    SELECT event_type, d, v,
           COALESCE(round(corr(lv, lt) OVER w, 6) + 0.0, {NULLF})
               AS v_corr_market_roll7_lag1
    FROM l WINDOW w AS (PARTITION BY event_type ORDER BY dn
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_geo_harmonic_mean_lineitem(sf_dir: str) -> pd.DataFrame:
    """Geometric and harmonic means of quantity per return flag — the two
    classical non-arithmetic means, each an ALGEBRAIC reduce (Σln x and
    Σ1/x respectively) so they cascade like every other tier carry.
    Strictly positive domain (lineitem quantities)."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def parts(b: pd.DataFrame) -> pd.DataFrame:
        q = b["l_quantity"].to_numpy(np.float64)
        return pd.DataFrame({"l_returnflag": b["l_returnflag"],
                             "__ln": np.log(q), "__inv": 1.0 / q,
                             "__one": np.ones(len(b), dtype=np.int64)})

    out = hash_aggregate(li.map_batches(parts, batch_format="pandas"),
                         ["l_returnflag"],
                         {"n": ("__one", "sum"), "sln": ("__ln", "sum"),
                          "sinv": ("__inv", "sum")},
                         num_partitions=4).to_pandas()
    n = out["n"].to_numpy(np.float64)
    out["geo_mean"] = np.round(np.exp(out["sln"].to_numpy(np.float64) / n), 6)
    out["harm_mean"] = np.round(n / out["sinv"].to_numpy(np.float64), 6)
    out["n"] = out["n"].astype("int64")
    return out[["l_returnflag", "n", "geo_mean", "harm_mean"]] \
        .sort_values("l_returnflag").reset_index(drop=True)


SQL_GEO_HARMONIC_MEAN = """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(exp(sum(ln(l_quantity)) / count(*)), 6) AS geo_mean,
           round(count(*) / sum(1.0 / l_quantity), 6) AS harm_mean
    FROM lineitem GROUP BY 1
"""


def q_twap_daily_events(sf_dir: str) -> pd.DataFrame:
    """Time-weighted average per (series, day) over the IRREGULAR event
    stream — the TimescaleDB ``time_weight('LOCF')`` continuous-aggregate
    shape: each observation holds until the next one (or the day end), and
    the day's average weighs values by held seconds. One keyed co-located
    kernel (vectorized diff of the sorted in-day timestamps); the oracle
    is LEAD() + day-end COALESCE. Days whose observations all share one
    timestamp fall back to the plain mean of the simultaneous values on
    both sides (zero-weight guard)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["d"] = b["ts"].dt.floor("D")
        return b

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (et, d), g in part.groupby(["event_type", "d"], sort=False):
            g = g.sort_values(["ts", "value"], kind="mergesort")
            t = g["ts"].astype("datetime64[us]").astype("int64") \
                .to_numpy()
            v = g["value"].to_numpy(np.float64)
            day_end = (d.value // 1000) + 86_400_000_000  # ns → us
            w = np.diff(np.concatenate([t, [day_end]])).astype(np.float64)
            tw = float((v * w).sum())
            ws = float(w.sum())
            twap = tw / ws if ws > 0 else float(v.mean())
            rows.append((et, d, len(v), np.round(twap, 6)))
        return pd.DataFrame(rows, columns=["event_type", "d", "n", "twap"])

    out = keyed_map_partitions(
        ev.map_batches(day_fn, batch_format="pandas"),
        ["event_type"], kernel, num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_TWAP_DAILY = """
    WITH e AS (
        SELECT event_type, date_trunc('day', ts) AS d, ts, value
        FROM events
    ),
    w AS (
        SELECT event_type, d, value,
               epoch_us(COALESCE(LEAD(ts) OVER (
                            PARTITION BY event_type, d
                            ORDER BY ts, value),
                        d + INTERVAL 1 DAY)) - epoch_us(ts) AS held_us
        FROM e
    )
    SELECT event_type, d, CAST(count(*) AS BIGINT) AS n,
           round(CASE WHEN sum(held_us) > 0
                      THEN sum(value * held_us) / sum(held_us)
                      ELSE avg(value) END, 6) AS twap
    FROM w GROUP BY 1, 2
"""


def q_counter_increase_users(sf_dir: str) -> pd.DataFrame:
    """Counter-agg ``increase()`` per user (the Prometheus/TimescaleDB
    counter-reset rule — public): reading the event values as a counter
    sampled over time, each step contributes ``v_i − v_{i−1}`` when
    monotone and ``v_i`` after a reset (drop ⇒ the counter restarted at
    zero). One keyed co-located kernel (vectorized diff + reset mask);
    oracle is LAG() + CASE. Ties on ts are ordered by value on both
    sides so the scan order is deterministic."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in part.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "value"], kind="mergesort")
            v = g["value"].to_numpy(np.float64)
            d = np.diff(v)
            inc = float(np.where(d >= 0, d, v[1:]).sum())
            rows.append((uid, len(v), np.round(inc, 6),
                         int((d < 0).sum())))
        return pd.DataFrame(rows, columns=["user_id", "n", "increase",
                                           "n_resets"])

    out = keyed_map_partitions(ev, ["user_id"], kernel,
                               num_partitions=_NP).to_pandas()
    out = out.astype({"user_id": "int64", "n": "int64",
                      "n_resets": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)


SQL_COUNTER_INCREASE = """
    WITH l AS (
        SELECT user_id, value,
               LAG(value) OVER (PARTITION BY user_id
                                ORDER BY ts, value) AS pv
        FROM events
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           round(COALESCE(sum(CASE WHEN pv IS NULL THEN 0
                                   WHEN value >= pv THEN value - pv
                                   ELSE value END), 0), 6) AS increase,
           CAST(COALESCE(sum(CASE WHEN value < pv THEN 1 END), 0)
                AS BIGINT) AS n_resets
    FROM l GROUP BY 1
"""


# ---------------------------------------------------------------------------
# band / drawdown / record-run features on the daily spine (W1 family)
# ---------------------------------------------------------------------------

def q_bollinger_daily_events(sf_dir: str) -> pd.DataFrame:
    """Bollinger bands (Bollinger 1980s — public) on the daily spine,
    leakage-safe form: band = trailing LAG-1 7-row mean ± 2·std (ddof=1,
    ≥2 points required — same frame the rolling-corr feature uses), plus a
    breach flag (+1 above the upper band, −1 below the lower, 0 inside)
    computed from the ROUNDED band on both engines so the comparison is
    epsilon-stable. One keyed co-located kernel per series."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            lv = g["v"].shift(1)
            m = lv.rolling(7, min_periods=2).mean().to_numpy(np.float64)
            s = lv.rolling(7, min_periods=2).std(ddof=1) \
                .to_numpy(np.float64)
            up = np.round(m + 2.0 * s, 6)
            lo = np.round(m - 2.0 * s, 6)
            v = g["v"].to_numpy(np.float64)
            breach = np.where(v > up, 1.0, np.where(v < lo, -1.0, 0.0))
            breach = np.where(np.isnan(up), np.nan, breach)
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"], "v": g["v"],
                "bb_mid": np.round(m, 6) + 0.0, "bb_up": up + 0.0,
                "bb_lo": lo + 0.0, "bb_breach": breach + 0.0,
            }))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "bb_mid",
                                  "bb_up", "bb_lo", "bb_breach"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = _fill(out, ["bb_mid", "bb_up", "bb_lo", "bb_breach"])
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_BOLLINGER_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    w AS (
        SELECT event_type, d, v,
               CASE WHEN count(v) OVER w1 >= 2
                    THEN avg(v) OVER w1 END AS m,
               stddev_samp(v) OVER w1 AS s
        FROM daily WINDOW w1 AS (PARTITION BY event_type ORDER BY d
                                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, d, v,
           COALESCE(round(m, 6) + 0.0, {NULLF}) AS bb_mid,
           COALESCE(round(m + 2 * s, 6) + 0.0, {NULLF}) AS bb_up,
           COALESCE(round(m - 2 * s, 6) + 0.0, {NULLF}) AS bb_lo,
           COALESCE(CASE WHEN m IS NULL THEN NULL
                         WHEN v > round(m + 2 * s, 6) THEN 1.0
                         WHEN v < round(m - 2 * s, 6) THEN -1.0
                         ELSE 0.0 END, {NULLF}) AS bb_breach
    FROM w
"""


def q_drawdown_daily_events(sf_dir: str) -> pd.DataFrame:
    """Maximum drawdown per daily series: the largest peak-to-trough drop
    ``max(running_max(v) − v)`` in time order (absolute units — the daily
    sums can cross zero, so the relative form is ill-posed). Emitted with
    the series peak and day count; the running max is a per-series
    co-located kernel, the oracle a ROWS UNBOUNDED PRECEDING window."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            v = g["v"].to_numpy(np.float64)
            runmax = np.maximum.accumulate(v)
            rows.append((et, len(v), np.round(float((runmax - v).max()), 6),
                         np.round(float(v.max()), 6)))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "max_drawdown", "peak"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DRAWDOWN_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               max(v) OVER (PARTITION BY event_type ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS runmax
        FROM daily
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(max(runmax - v), 6) AS max_drawdown,
           round(max(v), 6) AS peak
    FROM r GROUP BY 1
"""


def q_records_streaks_daily(sf_dir: str) -> pd.DataFrame:
    """Record-high days and the longest up-streak per daily series — the
    two classic run statistics (records: v strictly above every prior
    value, first day counts; up-streak: consecutive rows with v > previous
    v). The kernel is one vectorized pass (cummax + cumsum gaps-and-islands);
    the oracle is the textbook row_number/grp SQL island construction."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            v = g["v"].to_numpy(np.float64)
            prior_max = np.concatenate(
                ([-np.inf], np.maximum.accumulate(v)[:-1]))
            n_records = int((v > prior_max).sum())
            up = np.concatenate(([False], v[1:] > v[:-1]))
            grp = np.cumsum(~up)
            streak = int(np.bincount(grp[up]).max()) if up.any() else 0
            rows.append((et, len(v), n_records, streak))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "n_records", "max_up_streak"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    for c in ("n_days", "n_records", "max_up_streak"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_RECORDS_STREAKS_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               CASE WHEN COALESCE(v > max(v) OVER
                        (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        TRUE) THEN 1 ELSE 0 END AS is_rec,
               CASE WHEN v > LAG(v) OVER
                        (PARTITION BY event_type ORDER BY d)
                    THEN 1 ELSE 0 END AS up
        FROM daily
    ),
    g AS (
        SELECT event_type, d, up, is_rec,
               SUM(CASE WHEN up = 0 THEN 1 ELSE 0 END) OVER
                   (PARTITION BY event_type ORDER BY d) AS grp
        FROM l
    ),
    s AS (SELECT event_type, grp, SUM(up) AS streak FROM g GROUP BY 1, 2)
    SELECT g2.event_type, CAST(g2.n_days AS BIGINT) AS n_days,
           CAST(g2.n_records AS BIGINT) AS n_records,
           CAST(s2.max_up_streak AS BIGINT) AS max_up_streak
    FROM (SELECT event_type, count(*) AS n_days, SUM(is_rec) AS n_records
          FROM g GROUP BY 1) g2
    JOIN (SELECT event_type, MAX(streak) AS max_up_streak
          FROM s GROUP BY 1) s2 USING (event_type)
"""


def q_atr_daily_events(sf_dir: str) -> pd.DataFrame:
    """Average True Range (Wilder 1978 — public) over the daily OHLC bars:
    ``TR = max(high−low, |high−prev_close|, |low−prev_close|)`` (first bar:
    high−low) and ATR = trailing 7-ROW mean of TR (min 1 row). Bars come
    from the same unique-stamp OHLC aggregate the ``ohlc_daily_events``
    entry pins; TR/ATR are computed from the ROUNDED bars on both engines."""
    bars = q_ohlc_daily_events(sf_dir)

    outs = []
    for et, g in bars.groupby("event_type", sort=False):
        g = g.sort_values("d").copy()
        pc = g["close"].shift(1).to_numpy(np.float64)
        hi = g["high"].to_numpy(np.float64)
        lo = g["low"].to_numpy(np.float64)
        tr = np.maximum(hi - lo,
                        np.maximum(np.abs(hi - pc), np.abs(lo - pc)))
        tr = np.where(np.isnan(pc), hi - lo, tr)
        tr = np.round(tr, 6)
        atr = pd.Series(tr).rolling(7, min_periods=1).mean() \
            .to_numpy(np.float64)
        outs.append(pd.DataFrame({
            "event_type": g["event_type"], "d": g["d"],
            "tr": tr + 0.0, "atr7": np.round(atr, 6) + 0.0}))
    out = pd.concat(outs, ignore_index=True)
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_ATR_DAILY = f"""
    WITH bars AS ({SQL_OHLC_DAILY}),
    t AS (
        SELECT event_type, d,
               round(CASE WHEN LAG(close) OVER w IS NULL THEN high - low
                          ELSE GREATEST(high - low,
                                        abs(high - LAG(close) OVER w),
                                        abs(low - LAG(close) OVER w))
                     END, 6) AS tr
        FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, d, tr + 0.0 AS tr,
           round(avg(tr) OVER (PARTITION BY event_type ORDER BY d
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                 6) + 0.0 AS atr7
    FROM t
"""


# ---------------------------------------------------------------------------
# distribution audits: Benford first-digit, Gini concentration
# ---------------------------------------------------------------------------

def q_benford_lineitem(sf_dir: str) -> pd.DataFrame:
    """Benford first-significant-digit audit (Benford 1938 — public) of
    ``l_extendedprice``: digits are taken from the integer cents via string
    truncation (bit-exact on both engines — no float log10 at power-of-ten
    boundaries), counted by the salted combiner aggregate, and compared to
    the Benford expectation ``log10(1 + 1/d)``."""
    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def digit_fn(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        first = pd.Series(cents).astype(str).str[0].astype(np.int64)
        return pd.DataFrame({"digit": first,
                             "__one": np.ones(len(b), dtype=np.int64)})

    out = hash_aggregate(li.map_batches(digit_fn, batch_format="pandas"),
                         ["digit"], {"n": ("__one", "sum")},
                         num_partitions=4).to_pandas()
    total = float(out["n"].sum())
    out["n"] = out["n"].astype("int64")
    out["share"] = np.round(out["n"].to_numpy(np.float64) / total, 6)
    out["benford_p"] = np.round(
        np.log10(1.0 + 1.0 / out["digit"].to_numpy(np.float64)), 6)
    return out[["digit", "n", "share", "benford_p"]] \
        .sort_values("digit").reset_index(drop=True)


SQL_BENFORD_LINEITEM = """
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
                                     AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit
        FROM lineitem
    )
    SELECT digit, CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 / (SELECT count(*) FROM c), 6) AS share,
           round(log10(1 + 1.0 / digit), 6) AS benford_p
    FROM c GROUP BY 1
"""


def q_gini_users_events(sf_dir: str) -> pd.DataFrame:
    """Gini concentration of per-user total event value (Gini 1912 —
    public; the activity-inequality dashboard number). Per-user totals
    reduce distributedly (rounded to 6dp so ordering ties are exact on both
    engines); the closed-form rank formula
    ``G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n`` runs over the tiny totals
    vector."""
    ev = _read(sf_dir, "events", ["user_id", "value"])
    tot = hash_aggregate(ev, ["user_id"], {"tot": ("value", "sum")},
                         num_partitions=_NP).to_pandas()
    x = np.sort(np.round(tot["tot"].to_numpy(np.float64), 6))
    n = len(x)
    gini = 2.0 * float((np.arange(1, n + 1) * x).sum()) \
        / (n * float(x.sum())) - (n + 1.0) / n
    return pd.DataFrame({"n_users": np.array([n], dtype=np.int64),
                         "gini": [np.round(gini, 6)]})


SQL_GINI_USERS = """
    WITH t AS (
        SELECT user_id, round(sum(value), 6) AS tot
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT tot, row_number() OVER (ORDER BY tot) AS rn,
               count(*) OVER () AS n, sum(tot) OVER () AS s
        FROM t
    )
    SELECT CAST(max(n) AS BIGINT) AS n_users,
           round(2.0 * sum(rn * tot) / (max(n) * max(s))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM r
"""


# ---------------------------------------------------------------------------
# robust filtering / seasonal profiles / momentum (W1 family, batch 2)
# ---------------------------------------------------------------------------

def q_hampel_daily_events(sf_dir: str) -> pd.DataFrame:
    """Hampel filter (Hampel 1974 — public; the robust despiking standard)
    on the daily spine: centered 7-row window (3 each side, shrinking at
    the edges), outlier when ``|v − med| > 3 · 1.4826 · MAD``, replaced by
    the window median. Oracle via DuckDB list-windows (``list(v) OVER`` +
    ``list_aggregate(…, 'median')``) — both engines compute from the same
    6dp-rounded spine so the strict-inequality comparison is bit-stable."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    K = 3.0 * 1.4826

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            v = g["v"].to_numpy(np.float64)
            s = pd.Series(v)
            med = s.rolling(7, center=True, min_periods=1).median() \
                .to_numpy(np.float64)
            mad = s.rolling(7, center=True, min_periods=1) \
                .apply(lambda w: np.median(np.abs(w - np.median(w))),
                       raw=True).to_numpy(np.float64)
            flag = np.abs(v - med) > K * mad
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"], "v": g["v"],
                "v_hampel": np.round(np.where(flag, med, v), 6) + 0.0,
                "is_outlier": flag.astype(np.int64)}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "v_hampel",
                                  "is_outlier"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["is_outlier"] = out["is_outlier"].astype("int64")
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_HAMPEL_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    w AS (
        SELECT event_type, d, v,
               list(v) OVER (PARTITION BY event_type ORDER BY d
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS l
        FROM daily
    ),
    m AS (
        SELECT event_type, d, v, l,
               CAST(list_aggregate(l, 'median') AS DOUBLE) AS med
        FROM w
    ),
    h AS (
        SELECT event_type, d, v, med,
               CAST(list_aggregate(list_transform(l, x -> abs(x - med)),
                                   'median') AS DOUBLE) AS mad
        FROM m
    )
    SELECT event_type, d, v,
           round(CASE WHEN abs(v - med) > 3 * 1.4826 * mad
                      THEN med ELSE v END, 6) + 0.0 AS v_hampel,
           CAST(CASE WHEN abs(v - med) > 3 * 1.4826 * mad
                     THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM h
"""


def q_dow_profile_daily(sf_dir: str) -> pd.DataFrame:
    """Day-of-week seasonal profile per series: n / median / p25 / p75 of
    the daily value by ISO weekday (Mon=1..Sun=7) — the box-plot row behind
    every weekly-seasonality dashboard. Quantiles are linear-interpolated
    (numpy default == DuckDB ``quantile_cont``); the grouped reduce runs on
    the co-located per-(series, dow) slices."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy()
        part["dow"] = part["d"].dt.dayofweek.astype(np.int64) + 1
        rows = []
        for (et, dow), g in part.groupby(["event_type", "dow"],
                                         sort=False):
            v = g["v"].to_numpy(np.float64)
            rows.append((et, dow, len(v),
                         np.round(np.percentile(v, 50), 6),
                         np.round(np.percentile(v, 25), 6),
                         np.round(np.percentile(v, 75), 6)))
        return pd.DataFrame(rows, columns=["event_type", "dow", "n",
                                           "med", "p25", "p75"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["dow"] = out["dow"].astype("int64")
    return out.sort_values(["event_type", "dow"]).reset_index(drop=True)


SQL_DOW_PROFILE_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, CAST(isodow(d) AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(v, 0.5), 6) AS med,
           round(quantile_cont(v, 0.25), 6) AS p25,
           round(quantile_cont(v, 0.75), 6) AS p75
    FROM daily GROUP BY 1, 2
"""


def q_macd_daily_events(sf_dir: str) -> pd.DataFrame:
    """MACD (Appel 1970s — public): ``ewm12(v) − ewm26(v)`` per daily
    series (adjust=True, min_periods=1), the span-9 signal line over the
    6dp-ROUNDED macd (so both engines feed the second smoothing identical
    inputs), and the histogram. The oracle reuses the closed-form
    adjust=True weighted-sum identity the EWMA entry pins
    (common ``(1−α)^t`` factor cancelled ⇒ ``pow(1/(1−α), rn)`` weights)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            v = pd.Series(g["v"].to_numpy(np.float64))
            macd = np.round((v.ewm(span=12, adjust=True).mean()
                             - v.ewm(span=26, adjust=True).mean())
                            .to_numpy(np.float64), 6)
            signal = np.round(pd.Series(macd).ewm(span=9, adjust=True)
                              .mean().to_numpy(np.float64), 6)
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"], "v": g["v"],
                "macd": macd + 0.0, "signal": signal + 0.0,
                "hist": np.round(macd - signal, 6) + 0.0}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "macd",
                                  "signal", "hist"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


#: α = 2/(span+1) ⇒ 1/(1−α): span 12 → 13/11, span 26 → 27/25, span 9 → 5/4
SQL_MACD_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    e AS (
        SELECT event_type, d, v, rn,
               round(SUM(v * pow(13.0 / 11.0, rn)) OVER w
                         / SUM(pow(13.0 / 11.0, rn)) OVER w
                     - SUM(v * pow(27.0 / 25.0, rn)) OVER w
                         / SUM(pow(27.0 / 25.0, rn)) OVER w, 6) AS macd
        FROM l
        WINDOW w AS (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT event_type, d, v, macd,
               round(SUM(macd * pow(5.0 / 4.0, rn)) OVER w
                         / SUM(pow(5.0 / 4.0, rn)) OVER w, 6) AS signal
        FROM e
        WINDOW w AS (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, v, macd + 0.0 AS macd, signal + 0.0 AS signal,
           round(macd - signal, 6) + 0.0 AS hist
    FROM s
"""


# ---------------------------------------------------------------------------
# audience overlap / normalized dedup (webtext curation, batch 2)
# ---------------------------------------------------------------------------

def q_audience_overlap_events(sf_dir: str) -> pd.DataFrame:
    """Audience-overlap Jaccard between event types: for every co-occurring
    type pair, ``|users(a) ∩ users(b)| / |users(a) ∪ users(b)|``. The
    distributed plan never builds a global user set: distinct (user, type)
    memberships reduce once, the pair fan-out happens inside per-user
    co-located groups (each user emits its own type combinations), and the
    tiny (type, type) count table merges at the driver."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    du = hash_aggregate(ev, ["user_id", "event_type"],
                        {"__n": ("event_type", "size")},
                        num_partitions=_NP)

    def pair_kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b = [], []
        for uid, g in part.groupby("user_id", sort=False):
            ts = np.unique(g["event_type"].to_numpy())
            if len(ts) < 2:
                continue
            ia, ib = np.triu_indices(len(ts), 1)
            rows_a.append(ts[ia])
            rows_b.append(ts[ib])
        if not rows_a:
            return pd.DataFrame({"ta": pd.Series([], dtype=object),
                                 "tb": pd.Series([], dtype=object),
                                 "__one": pd.Series([], dtype=np.int64)})
        a = np.concatenate(rows_a)
        return pd.DataFrame({"ta": a, "tb": np.concatenate(rows_b),
                             "__one": np.ones(len(a), dtype=np.int64)})

    both = hash_aggregate(
        keyed_map_partitions(du, ["user_id"], pair_kernel,
                             num_partitions=_NP),
        ["ta", "tb"], {"n_both": ("__one", "sum")},
        num_partitions=4).to_pandas()
    per_type = hash_aggregate(du, ["event_type"],
                              {"n": ("__n", "size")},
                              num_partitions=4).to_pandas()
    sizes = dict(zip(per_type["event_type"], per_type["n"]))
    both["n_a"] = both["ta"].map(sizes).astype("int64")
    both["n_b"] = both["tb"].map(sizes).astype("int64")
    both["n_both"] = both["n_both"].astype("int64")
    union = both["n_a"] + both["n_b"] - both["n_both"]
    both["jaccard"] = np.round(
        both["n_both"].to_numpy(np.float64) / union.to_numpy(np.float64), 6)
    return both[["ta", "tb", "n_both", "n_a", "n_b", "jaccard"]] \
        .sort_values(["ta", "tb"]).reset_index(drop=True)


SQL_AUDIENCE_OVERLAP = """
    WITH du AS (SELECT DISTINCT user_id, event_type FROM events),
    p AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM du a JOIN du b USING (user_id)
        WHERE a.event_type < b.event_type
    ),
    c AS (SELECT ta, tb, count(*) AS n_both FROM p GROUP BY 1, 2),
    n AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1)
    SELECT c.ta, c.tb, CAST(c.n_both AS BIGINT) AS n_both,
           CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
           round(c.n_both * 1.0 / (na.n + nb.n - c.n_both), 6) AS jaccard
    FROM c JOIN n na ON na.event_type = c.ta
           JOIN n nb ON nb.event_type = c.tb
"""


def q_normalized_dedup_documents(sf_dir: str) -> pd.DataFrame:
    """Fuzzy-exact dedup on NORMALIZED text (the C4/CCNet pre-pass —
    public): lowercase, strip non-[a-z0-9 ], collapse runs of spaces, trim;
    then keep the min doc_id per normalized class. Normalization is a
    stateless vectorized map; the class reduce shuffles only the 32-char
    digest of the normalized text (never the text itself) — the same
    narrow-key plan as ``exact_dedup``."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm_fn(b: pd.DataFrame) -> pd.DataFrame:
        nt = b["text"].fillna("").str.lower() \
            .str.replace(r"[^a-z0-9 ]", "", regex=True) \
            .str.replace(r" +", " ", regex=True).str.strip()
        dig = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in nt]
        return pd.DataFrame({"doc_id": b["doc_id"], "__digest": dig})

    out = hash_aggregate(
        docs.map_batches(norm_fn, batch_format="pandas"),
        ["__digest"], {"keep_id": ("doc_id", "min"),
                       "class_size": ("doc_id", "size")},
        num_partitions=_NP).to_pandas()
    out = out[["keep_id", "class_size"]].astype(
        {"keep_id": "int64", "class_size": "int64"})
    return out.sort_values("keep_id").reset_index(drop=True)


SQL_NORMALIZED_DEDUP = """
    WITH nrm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                                                  '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS nt
        FROM documents
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS class_size
    FROM nrm GROUP BY nt
"""


# ---------------------------------------------------------------------------
# Holt-Winters gate / rolling distinct / burstiness / transition entropy
# ---------------------------------------------------------------------------

def q_holt_winters_gate_daily(sf_dir: str) -> pd.DataFrame:
    """Holt-Winters additive forecast, oracle-GATED through the degenerate
    closed form (the holt/ses/croston gate pattern): at α=1, β=0, γ=0 the
    trend freezes at its initial ``(mean(season₂) − mean(season₁))/7``, the
    seasonals freeze at ``y_i − mean(season₁)``, and the level collapses to
    ``y_T − s_{T mod 7}`` — all SQL-expressible. The gate drives the full
    machinery (key-co-located sequential fit, per-series (l, b, s₀..s₆)
    state broadcast, the future-grid scorer); general (α, β, γ) is pinned
    by pytest against a direct numpy recursion."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", estimator="holt_winters",
                       alpha=1.0, beta=0.0, gamma=0.0, period=7)
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    return df.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_HOLT_WINTERS_GATE = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    init AS (
        SELECT event_type, count(*) AS n, max(d) AS d_last,
               avg(CASE WHEN rn <= 7 THEN v END) AS l0,
               COALESCE((avg(CASE WHEN rn > 7 AND rn <= 14 THEN v END)
                         - avg(CASE WHEN rn <= 7 THEN v END)) / 7.0, 0)
                   AS b0,
               arg_max(v, rn) AS y_last
        FROM r GROUP BY 1
    ),
    seas AS (
        SELECT r.event_type, (rn - 1) % 7 AS six, r.v - i.l0 AS s
        FROM r JOIN init i USING (event_type) WHERE rn <= 7
    ),
    f AS (
        SELECT i.*, fd.d, datediff('day', i.d_last, fd.d) AS h
        FROM init i CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    ),
    lev AS (
        SELECT f.*, f.y_last - COALESCE(sl.s, 0) AS level
        FROM f LEFT JOIN seas sl ON sl.event_type = f.event_type
                                AND sl.six = (f.n - 1) % 7
    )
    SELECT lev.event_type, lev.d,
           round(lev.level + lev.h * lev.b0 + COALESCE(sf.s, 0), 6)
               AS predicted_v
    FROM lev LEFT JOIN seas sf ON sf.event_type = lev.event_type
                              AND sf.six = (lev.n - 1 + lev.h) % 7
"""


def q_rolling_distinct_users_daily(sf_dir: str) -> pd.DataFrame:
    """Trailing 7-day distinct active users per event type (the WAU-style
    rolling-cardinality dashboard number). The distributed plan never
    re-scans windows: distinct (type, day, user) memberships reduce once,
    each membership FANS OUT to the ≤7 future days it covers (a stateless
    vectorized map — the standard shuffle-free rolling-distinct expansion),
    a second narrow reduce re-distincts, and the per-day count semi-joins
    back to days that actually exist for the type."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "user_id"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["d"] = b["ts"].dt.floor("D")
        return b[["event_type", "d", "user_id"]]

    du = hash_aggregate(ev.map_batches(day_fn, batch_format="pandas"),
                        ["event_type", "d", "user_id"],
                        {"__n": ("user_id", "size")},
                        num_partitions=_NP)

    def fan_out(b: pd.DataFrame) -> pd.DataFrame:
        k = 7
        idx = np.repeat(np.arange(len(b)), k)
        off = np.tile(np.arange(k), len(b))
        return pd.DataFrame({
            "event_type": b["event_type"].to_numpy()[idx],
            "d": b["d"].to_numpy()[idx]
                 + off.astype("timedelta64[D]"),
            "user_id": b["user_id"].to_numpy()[idx]})

    cov = hash_aggregate(du.map_batches(fan_out, batch_format="pandas"),
                         ["event_type", "d", "user_id"],
                         {"__n": ("user_id", "size")},
                         num_partitions=_NP)
    counts = hash_aggregate(cov, ["event_type", "d"],
                            {"u7": ("user_id", "size")},
                            num_partitions=_NP).to_pandas()
    # keep only (type, day) pairs that exist in the raw stream
    present = hash_aggregate(du, ["event_type", "d"],
                             {"__n": ("user_id", "size")},
                             num_partitions=_NP).to_pandas()
    out = counts.merge(present[["event_type", "d"]], on=["event_type", "d"])
    out["u7"] = out["u7"].astype("int64")
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_ROLLING_DISTINCT_USERS = """
    WITH du AS (
        SELECT DISTINCT event_type, date_trunc('day', ts) AS d, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT event_type, d FROM du)
    SELECT days.event_type, days.d,
           CAST(count(DISTINCT du.user_id) AS BIGINT) AS u7
    FROM days JOIN du ON du.event_type = days.event_type
        AND du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY 1, 2
"""


def q_burstiness_users_events(sf_dir: str) -> pd.DataFrame:
    """Burstiness index (Goh & Barabási 2008 — public)
    ``B = (σ − μ) / (σ + μ)`` over each user's inter-event gap seconds
    (−1 = perfectly periodic, 0 = Poisson, →1 = bursty). Gaps form inside
    the per-user co-located kernel ((user_id, ts) is unique in this
    corpus, so the order is total); σ is the ddof=1 sample std — users
    with <2 gaps emit NULLF for σ and B."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in part.groupby("user_id", sort=False):
            t = np.sort(g["ts"].astype("datetime64[us]").astype("int64")
                        .to_numpy())
            if len(t) < 2:
                continue
            gaps = np.diff(t) / 1e6
            mu = float(gaps.mean())
            sd = float(gaps.std(ddof=1)) if len(gaps) > 1 else np.nan
            b = (sd - mu) / (sd + mu) if (len(gaps) > 1
                                          and sd + mu > 0) else np.nan
            rows.append((uid, len(gaps), np.round(mu, 6),
                         np.round(sd, 6), np.round(b, 6)))
        return pd.DataFrame(rows, columns=["user_id", "n_gaps", "mean_gap_s",
                                           "std_gap_s", "burstiness"])

    out = keyed_map_partitions(ev, ["user_id"], kernel,
                               num_partitions=_NP).to_pandas()
    out = out.astype({"user_id": "int64", "n_gaps": "int64"})
    out = _fill(out, ["std_gap_s", "burstiness"])
    return out.sort_values("user_id").reset_index(drop=True)


SQL_BURSTINESS_USERS = f"""
    WITH l AS (
        SELECT user_id,
               (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts))) / 1e6 AS gap
        FROM events
    ),
    g AS (SELECT user_id, gap FROM l WHERE gap IS NOT NULL),
    s AS (
        SELECT user_id, count(*) AS n_gaps, avg(gap) AS mu,
               stddev_samp(gap) AS sd
        FROM g GROUP BY 1
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           round(mu, 6) AS mean_gap_s,
           COALESCE(round(sd, 6), {NULLF}) AS std_gap_s,
           COALESCE(CASE WHEN sd + mu > 0
                         THEN round((sd - mu) / (sd + mu), 6) END, {NULLF})
               AS burstiness
    FROM s
"""


def q_transition_entropy_events(sf_dir: str) -> pd.DataFrame:
    """Conditional next-event entropy per source type (the Markov-chain
    entropy-rate row): H(next | prev=i) = −Σ_j p(j|i)·ln p(j|i) in nats
    over the per-user transition stream — how predictable each event type's
    successor is. Reuses the transition-matrix plan (pairs form in the
    partition-id shuffle kernel, counts pre-reduce); the entropy fold runs
    over the tiny (type × type) count table."""
    counts = q_transition_counts_events(sf_dir)
    rows = []
    for prev, g in counts.groupby("prev_type", sort=False):
        n = g["n"].to_numpy(np.float64)
        p = n / n.sum()
        rows.append((prev, int(n.sum()),
                     np.round(float(-(p * np.log(p)).sum()), 6)))
    out = pd.DataFrame(rows, columns=["prev_type", "n_out", "h_cond"])
    out["n_out"] = out["n_out"].astype("int64")
    return out.sort_values("prev_type").reset_index(drop=True)


SQL_TRANSITION_ENTROPY = """
    WITH l AS (
        SELECT event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                   AS nxt
        FROM events
    ),
    c AS (
        SELECT event_type AS prev_type, nxt AS next_type, count(*) AS n
        FROM l WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    t AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.prev_type, CAST(t.tot AS BIGINT) AS n_out,
           round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 6) AS h_cond
    FROM c JOIN t USING (prev_type)
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Count-Min gate / SCD2 history / skew profile
# ---------------------------------------------------------------------------

def q_cms_user_counts_gate(sf_dir: str) -> pd.DataFrame:
    """Count-Min sketch gate (ann_ivf_recall pattern): a per-event-type
    (d=4, w=512) CMS over the user_id stream must satisfy BOTH published
    guarantees against the exact per-user counts — one-sided error
    (estimate ≥ truth for every user, deterministic) and the ε-bound
    (max overcount ≤ ⌈e/w · N⌉, the 1−(1/2)^d high-probability bound —
    deterministic on this fixed corpus/hash). ``n_rows`` / ``n_users``
    are value-oracled; the sketch build is the mergeable two-level
    combiner plan (O(groups · d · w) shuffle bytes)."""
    from forecastframe_ray import keys as K
    from forecastframe_ray.stages.sketch import (cms_estimate,
                                                 cms_from_bytes)
    from forecastframe_ray.stages.sketch import cms_sketch

    W, D = 512, 4
    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    sk = cms_sketch(ev, ["event_type"], "user_id", w=W, d=D,
                    num_partitions=8).to_pandas()
    true = hash_aggregate(ev, ["event_type", "user_id"],
                          {"n_true": ("user_id", "size")},
                          num_partitions=_NP).to_pandas()
    rows = []
    for _, r in sk.iterrows():
        mat = cms_from_bytes(r["cms"], W, D)
        sub = true[true["event_type"] == r["event_type"]]
        h = K.hash_key_columns(sub, ["user_id"])
        est = cms_estimate(mat, h)
        t = sub["n_true"].to_numpy(np.int64)
        eps_n = int(np.ceil(np.e / W * r["n"]))
        rows.append((r["event_type"], int(r["n"]), len(sub),
                     bool((est >= t).all()),
                     bool((est - t).max() <= eps_n)))
    out = pd.DataFrame(rows, columns=["event_type", "n_rows", "n_users",
                                      "lower_ok", "bound_ok"])
    out = out.astype({"n_rows": "int64", "n_users": "int64"})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_CMS_USER_COUNTS_GATE = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           true AS lower_ok, true AS bound_ok
    FROM events GROUP BY 1
"""


def q_scd2_history_events(sf_dir: str) -> pd.DataFrame:
    """SCD Type-2 dimension history (Kimball — public) built from the
    event stream: each user's event_type sequence is compacted to its
    CHANGE points ((user_id, ts) is unique so the order is total), each
    change opening a validity interval ``[valid_from, valid_to)`` closed
    by the next change (current row → the 9999-12-31 sentinel). One keyed
    co-located kernel (vectorized change mask + shift); the oracle is the
    textbook LAG-filter + LEAD-close construction."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    SENT = pd.Timestamp("9999-12-31")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for uid, g in part.groupby("user_id", sort=False):
            g = g.sort_values("ts")
            et = g["event_type"].to_numpy()
            change = np.concatenate(([True], et[1:] != et[:-1]))
            ch = g[change]
            vf = ch["ts"].reset_index(drop=True)
            vt = vf.shift(-1).fillna(SENT)
            outs.append(pd.DataFrame({
                "user_id": ch["user_id"].to_numpy(),
                "event_type": ch["event_type"].to_numpy(),
                "valid_from": vf.to_numpy(),
                "valid_to": vt.to_numpy(),
                "is_current": np.concatenate(
                    (np.zeros(len(ch) - 1, dtype=np.int64), [1]))}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["user_id", "event_type", "valid_from",
                                  "valid_to", "is_current"])

    out = keyed_map_partitions(ev, ["user_id"], kernel,
                               num_partitions=_NP).to_pandas()
    out = out.astype({"user_id": "int64", "is_current": "int64"})
    return out.sort_values(["user_id", "valid_from"]) \
        .reset_index(drop=True)


SQL_SCD2_HISTORY = """
    WITH l AS (
        SELECT user_id, event_type, ts,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                   AS pe
        FROM events
    ),
    ch AS (
        SELECT user_id, event_type, ts AS valid_from
        FROM l WHERE pe IS NULL OR event_type <> pe
    )
    SELECT user_id, event_type, valid_from,
           COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id
                                           ORDER BY valid_from),
                    TIMESTAMP '9999-12-31') AS valid_to,
           CAST(CASE WHEN LEAD(valid_from) OVER (PARTITION BY user_id
                                                 ORDER BY valid_from)
                          IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_current
    FROM ch
"""


def q_skew_profile_events(sf_dir: str) -> pd.DataFrame:
    """Key-skew diagnostic over the user_id key space (the number the
    north_rule's salted-repartition decision reads): rows reduce once to
    one size per key (narrow shuffle), then the tiny key table folds to
    top-1 share and the p50/p99 group sizes — the 'is this key space
    shuffle-safe' dashboard row."""
    ev = _read(sf_dir, "events", ["user_id"])
    sizes = hash_aggregate(ev, ["user_id"], {"n": ("user_id", "size")},
                           num_partitions=_NP).to_pandas()
    s = sizes["n"].to_numpy(np.float64)
    return pd.DataFrame({
        "n_keys": np.array([len(s)], dtype=np.int64),
        "n_rows": np.array([int(s.sum())], dtype=np.int64),
        "top1_share": [np.round(float(s.max()) / float(s.sum()), 6)],
        "p50_size": [np.round(np.percentile(s, 50), 6)],
        "p99_size": [np.round(np.percentile(s, 99), 6)],
    })


SQL_SKEW_PROFILE = """
    WITH sizes AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           round(max(n) * 1.0 / sum(n), 6) AS top1_share,
           round(quantile_cont(n, 0.5), 6) AS p50_size,
           round(quantile_cont(n, 0.99), 6) AS p99_size
    FROM sizes
"""


# ---------------------------------------------------------------------------
# count-based windows / two-sample tests (batch 5)
# ---------------------------------------------------------------------------

def q_count_windows_users(sf_dir: str) -> pd.DataFrame:
    """Tumbling COUNT-based windows (every 5 events) per user — the
    Flink-style count-window shape the time-based hopping/tumbling entries
    don't cover. Window index = 0-based position // 5 in ts order
    ((user_id, ts) unique ⇒ total order); per window: n, value sum, start
    and end stamps. One keyed co-located kernel; oracle is
    ``(row_number()-1)//5``."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for uid, g in part.groupby("user_id", sort=False):
            g = g.sort_values("ts").reset_index(drop=True)
            w = (np.arange(len(g)) // 5).astype(np.int64)
            agg = g.assign(w=w).groupby("w", sort=True).agg(
                n=("value", "size"), sum_v=("value", "sum"),
                w_start=("ts", "min"), w_end=("ts", "max")).reset_index()
            agg.insert(0, "user_id", uid)
            outs.append(agg)
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["user_id", "w", "n", "sum_v",
                                  "w_start", "w_end"])

    out = keyed_map_partitions(ev, ["user_id"], kernel,
                               num_partitions=_NP).to_pandas()
    out = out.astype({"user_id": "int64", "w": "int64", "n": "int64"})
    out = _round(out, ["sum_v"], 6)
    return out.sort_values(["user_id", "w"]).reset_index(drop=True)


SQL_COUNT_WINDOWS_USERS = """
    WITH r AS (
        SELECT user_id, ts, value,
               (row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1)
                   // 5 AS w
        FROM events
    )
    SELECT user_id, CAST(w AS BIGINT) AS w,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS sum_v,
           min(ts) AS w_start, max(ts) AS w_end
    FROM r GROUP BY 1, 2
"""


def q_welch_ttest_events(sf_dir: str) -> pd.DataFrame:
    """Welch's unequal-variance t-test (Welch 1947 — public) between the
    'click' and 'view' value distributions: t statistic and the
    Welch–Satterthwaite degrees of freedom, both from the per-type
    (n, mean, ddof=1 var) algebraic reduce — one narrow aggregate, no
    row-level shuffle."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def parts(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(["click", "view"])]
        v = b["value"].to_numpy(np.float64)
        return pd.DataFrame({"event_type": b["event_type"], "__v": v,
                             "__v2": v * v,
                             "__one": np.ones(len(b), dtype=np.int64)})

    agg = hash_aggregate(ev.map_batches(parts, batch_format="pandas"),
                         ["event_type"],
                         {"n": ("__one", "sum"), "s": ("__v", "sum"),
                          "s2": ("__v2", "sum")},
                         num_partitions=4).to_pandas().set_index("event_type")

    def stats(t):
        n = float(agg.loc[t, "n"])
        m = agg.loc[t, "s"] / n
        var = (agg.loc[t, "s2"] - n * m * m) / (n - 1.0)
        return n, m, var

    na, ma, va = stats("click")
    nb, mb, vb = stats("view")
    se2 = va / na + vb / nb
    t = (ma - mb) / np.sqrt(se2)
    dof = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return pd.DataFrame({
        "n_click": np.array([int(na)], dtype=np.int64),
        "n_view": np.array([int(nb)], dtype=np.int64),
        "mean_diff": [np.round(ma - mb, 6)],
        "t_stat": [np.round(t, 6)], "welch_dof": [np.round(dof, 6)]})


SQL_WELCH_TTEST = """
    WITH s AS (
        SELECT event_type, count(*) AS n, avg(value) AS m,
               var_samp(value) AS v
        FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
    ),
    w AS (
        SELECT (SELECT n FROM s WHERE event_type = 'click') AS na,
               (SELECT m FROM s WHERE event_type = 'click') AS ma,
               (SELECT v FROM s WHERE event_type = 'click') AS va,
               (SELECT n FROM s WHERE event_type = 'view') AS nb,
               (SELECT m FROM s WHERE event_type = 'view') AS mb,
               (SELECT v FROM s WHERE event_type = 'view') AS vb
    )
    SELECT CAST(na AS BIGINT) AS n_click, CAST(nb AS BIGINT) AS n_view,
           round(ma - mb, 6) AS mean_diff,
           round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
           round(pow(va / na + vb / nb, 2)
                 / (pow(va / na, 2) / (na - 1)
                    + pow(vb / nb, 2) / (nb - 1)), 6) AS welch_dof
    FROM w
"""


def q_chisq_type_dow_events(sf_dir: str) -> pd.DataFrame:
    """Pearson chi-square independence test (Pearson 1900 — public) of the
    event_type × ISO-weekday contingency table: χ² = Σ (O−E)²/E with
    E = row_total · col_total / N, plus the table dof. Observed counts are
    one narrow aggregate; the χ² fold runs over the tiny contingency
    table."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def dow_fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": b["event_type"],
            "dow": (b["ts"].dt.dayofweek + 1).astype(np.int64),
            "__one": np.ones(len(b), dtype=np.int64)})

    obs = hash_aggregate(ev.map_batches(dow_fn, batch_format="pandas"),
                         ["event_type", "dow"], {"n": ("__one", "sum")},
                         num_partitions=4).to_pandas()
    piv = obs.pivot_table(index="event_type", columns="dow", values="n",
                          fill_value=0, aggfunc="sum")
    O = piv.to_numpy(np.float64)
    E = O.sum(axis=1, keepdims=True) * O.sum(axis=0, keepdims=True) / O.sum()
    chi2 = float(((O - E) ** 2 / E).sum())
    dof = (O.shape[0] - 1) * (O.shape[1] - 1)
    return pd.DataFrame({
        "n": np.array([int(O.sum())], dtype=np.int64),
        "chi2": [np.round(chi2, 6)],
        "dof": np.array([dof], dtype=np.int64)})


SQL_CHISQ_TYPE_DOW = """
    WITH o AS (
        SELECT event_type, isodow(ts) AS dow, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n) AS nn FROM o),
    rt AS (SELECT event_type, sum(n) AS r FROM o GROUP BY 1),
    ct AS (SELECT dow, sum(n) AS c FROM o GROUP BY 1)
    SELECT CAST((SELECT nn FROM tot) AS BIGINT) AS n,
           round(sum(pow(o.n - rt.r * ct.c / tot.nn, 2)
                     / (rt.r * ct.c / tot.nn)), 6) AS chi2,
           CAST(((SELECT count(*) FROM rt) - 1)
                * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof
    FROM o JOIN rt USING (event_type) JOIN ct USING (dow)
           CROSS JOIN tot
"""


def q_ks_two_sample_events(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic (public) between the
    'click' and 'view' value distributions: D = max |F_a(v) − F_b(v)|.
    The distributed plan reduces rows to one (value, count_a, count_b)
    row per DISTINCT value first (narrow shuffle — the value domain is
    2-decimal-bounded, so the reduced table is tiny relative to the
    stream); the ECDF cumsum + max folds over that reduced table. Also
    emits the scaled statistic ``sqrt(na·nb/(na+nb))·D``."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def parts(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(["click", "view"])]
        return pd.DataFrame({
            "value": b["value"],
            "__a": (b["event_type"] == "click").astype(np.int64),
            "__b": (b["event_type"] == "view").astype(np.int64)})

    red = hash_aggregate(ev.map_batches(parts, batch_format="pandas"),
                         ["value"], {"c_a": ("__a", "sum"),
                                     "c_b": ("__b", "sum")},
                         num_partitions=_NP).to_pandas()
    red = red.sort_values("value")
    na = float(red["c_a"].sum())
    nb = float(red["c_b"].sum())
    fa = red["c_a"].cumsum().to_numpy(np.float64) / na
    fb = red["c_b"].cumsum().to_numpy(np.float64) / nb
    d = float(np.abs(fa - fb).max())
    return pd.DataFrame({
        "n_click": np.array([int(na)], dtype=np.int64),
        "n_view": np.array([int(nb)], dtype=np.int64),
        "ks_d": [np.round(d, 6)],
        "ks_scaled": [np.round(np.sqrt(na * nb / (na + nb)) * d, 6)]})


SQL_KS_TWO_SAMPLE = """
    WITH s AS (
        SELECT value,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
    ),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM s),
    c AS (
        SELECT sum(ca) OVER (ORDER BY value) * 1.0 / t.na AS fa,
               sum(cb) OVER (ORDER BY value) * 1.0 / t.nb AS fb,
               t.na, t.nb
        FROM s CROSS JOIN t
    )
    SELECT CAST(max(na) AS BIGINT) AS n_click,
           CAST(max(nb) AS BIGINT) AS n_view,
           round(max(abs(fa - fb)), 6) AS ks_d,
           round(sqrt(max(na) * max(nb) / (max(na) + max(nb)))
                 * max(abs(fa - fb)), 6) AS ks_scaled
    FROM c
"""


# ---------------------------------------------------------------------------
# VWAP / sorted-blocking dedup (batch 6)
# ---------------------------------------------------------------------------

def q_vwap_daily_events(sf_dir: str) -> pd.DataFrame:
    """Volume-weighted average price per (series, day) — the market twin of
    the TWAP entry, weighting each observation by the integer ``k`` field
    extracted from the JSON props bag (vectorized regex extract, no per-row
    parse). One narrow weighted reduce: Σ(v·k) and Σk cascade like every
    algebraic carry; zero-total-volume days emit NULLF."""
    from forecastframe_ray.functions.scalar import extract_json_int

    ev = _read(sf_dir, "events", ["event_type", "ts", "value", "props"])
    ext = extract_json_int(ev, "props", "k")

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        k = b["k"].astype("float64").to_numpy()
        v = b["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "event_type": b["event_type"],
            "d": b["ts"].dt.floor("D"),
            "__vk": v * k, "__k": k,
            "__one": np.ones(len(b), dtype=np.int64)})

    out = hash_aggregate(ext.map_batches(pre, batch_format="pandas"),
                         ["event_type", "d"],
                         {"n": ("__one", "sum"), "svk": ("__vk", "sum"),
                          "vol": ("__k", "sum")},
                         num_partitions=_NP).to_pandas()
    vol = out["vol"].to_numpy(np.float64)
    svk = out["svk"].to_numpy(np.float64)
    out["vwap"] = np.where(vol > 0, np.round(svk / vol, 6), NULLF)
    out["n"] = out["n"].astype("int64")
    out["vol"] = out["vol"].astype("int64")
    return out[["event_type", "d", "n", "vol", "vwap"]] \
        .sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_VWAP_DAILY = f"""
    WITH e AS (
        SELECT event_type, date_trunc('day', ts) AS d, value,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type, d, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS vol,
           CASE WHEN sum(k) > 0 THEN round(sum(value * k) / sum(k), 6)
                ELSE {NULLF} END AS vwap
    FROM e GROUP BY 1, 2
"""


def _char_shingles(nt: str, width: int = 5) -> set:
    """Distinct character ``width``-grams, mirroring the SQL oracle's
    ``substr(nt, i, width)`` over ``1..max(len−width+1, 1)`` (short/empty
    strings yield one truncated shingle)."""
    n = max(len(nt) - width + 1, 1)
    return {nt[i:i + width] for i in range(n)}


def q_blocking_dedup_documents(sf_dir: str) -> pd.DataFrame:
    """Sorted-key BLOCKING dedup (Fellegi–Sunter-era entity-resolution
    blocking — public; the non-LSH classical baseline): documents sharing
    the first 12 chars of their normalized text form a block, and every
    in-block pair is verified by exact character-5-gram Jaccard ≥ 0.7.
    Blocks group in one narrow shuffle (block key + doc id + normalized
    text); pairing is exact within blocks — the block-key LENGTH is the
    recall/cost dial, with the capped LSH funnel as the adversarial-corpus
    scale path (this entry is its exact classical control)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm_fn(b: pd.DataFrame) -> pd.DataFrame:
        nt = b["text"].fillna("").str.lower() \
            .str.replace(r"[^a-z0-9 ]", "", regex=True) \
            .str.replace(r" +", " ", regex=True).str.strip()
        return pd.DataFrame({"doc_id": b["doc_id"], "nt": nt,
                             "bk": nt.str[:12]})

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bk, g in part.groupby("bk", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            # exact-dup class collapse: one shingle set per distinct text
            codes, uniq = pd.factorize(g["nt"], sort=False)
            sets = [_char_shingles(t) for t in uniq]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    sa, sb = sets[codes[i]], sets[codes[j]]
                    inter = len(sa & sb)
                    jac = inter / (len(sa) + len(sb) - inter)
                    if jac >= 0.7:
                        rows.append((ids[i], ids[j], np.round(jac, 6)))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    out = keyed_map_partitions(
        docs.map_batches(norm_fn, batch_format="pandas"),
        ["bk"], kernel, num_partitions=_NP).to_pandas()
    out = out.astype({"id_a": "int64", "id_b": "int64"})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_BLOCKING_DEDUP = """
    WITH nrm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                                                  '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS nt
        FROM documents
    ),
    sh AS (
        SELECT doc_id, substr(nt, 1, 12) AS bk,
               list_distinct(list_transform(
                   generate_series(1, greatest(strlen(nt) - 4, 1)),
                   i -> substr(nt, i, 5))) AS s
        FROM nrm
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(length(list_intersect(a.s, b.s)) AS DOUBLE)
                   / (length(a.s) + length(b.s)
                      - length(list_intersect(a.s, b.s))) AS jac
        FROM sh a JOIN sh b ON a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, round(jac, 6) AS jaccard
    FROM p WHERE jac >= 0.7
"""


# ---------------------------------------------------------------------------
# SPC chart / Pareto / readability / edit distance / CUPED (batch 7)
# ---------------------------------------------------------------------------

def q_control_chart_daily(sf_dir: str) -> pd.DataFrame:
    """Shewhart individuals X-MR control chart (public SPC — the 2.66·MR̄
    rule): per daily series, moving range MR = |v − v_prev|, center = mean
    of v, limits = center ± 2.66·mean(MR); flag points outside. Limit
    comparison runs on the ROUNDED limits on both engines."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            v = g["v"].to_numpy(np.float64)
            mr = np.abs(np.diff(v))
            center = float(v.mean())
            mrbar = float(mr.mean()) if len(mr) else 0.0
            ucl = np.round(center + 2.66 * mrbar, 6)
            lcl = np.round(center - 2.66 * mrbar, 6)
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"], "v": g["v"],
                "ucl": ucl + 0.0, "lcl": lcl + 0.0,
                "out_of_control": ((v > ucl) | (v < lcl))
                .astype(np.int64)}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "ucl", "lcl",
                                  "out_of_control"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["out_of_control"] = out["out_of_control"].astype("int64")
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_CONTROL_CHART_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    mr AS (
        SELECT event_type, d, v,
               abs(v - LAG(v) OVER (PARTITION BY event_type ORDER BY d))
                   AS mrange
        FROM daily
    ),
    lim AS (
        SELECT event_type,
               round(avg(v) + 2.66 * COALESCE(avg(mrange), 0), 6) + 0.0
                   AS ucl,
               round(avg(v) - 2.66 * COALESCE(avg(mrange), 0), 6) + 0.0
                   AS lcl
        FROM mr GROUP BY 1
    )
    SELECT m.event_type, m.d, m.v, lim.ucl, lim.lcl,
           CAST(CASE WHEN m.v > lim.ucl OR m.v < lim.lcl
                     THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
    FROM mr m JOIN lim USING (event_type)
"""


def q_pareto_share_events(sf_dir: str) -> pd.DataFrame:
    """Pareto 80/20 check: the share of total event value held by the top
    20% of users (by their 6dp-rounded totals; ties broken by user_id so
    the cut is total on both engines). Complements the Gini entry — the
    one-number concentration dashboard pair."""
    ev = _read(sf_dir, "events", ["user_id", "value"])
    tot = hash_aggregate(ev, ["user_id"], {"tot": ("value", "sum")},
                         num_partitions=_NP).to_pandas()
    tot["tot"] = np.round(tot["tot"].to_numpy(np.float64), 6)
    tot = tot.sort_values(["tot", "user_id"],
                          ascending=[False, True]).reset_index(drop=True)
    n = len(tot)
    k = int(np.ceil(0.2 * n))
    top = float(tot["tot"].iloc[:k].sum())
    allv = float(tot["tot"].sum())
    return pd.DataFrame({
        "n_users": np.array([n], dtype=np.int64),
        "n_top": np.array([k], dtype=np.int64),
        "top20_share": [np.round(top / allv, 6)]})


SQL_PARETO_SHARE = """
    WITH t AS (
        SELECT user_id, round(sum(value), 6) AS tot
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT tot, row_number() OVER (ORDER BY tot DESC, user_id) AS rn,
               count(*) OVER () AS n
        FROM t
    )
    SELECT CAST(max(n) AS BIGINT) AS n_users,
           CAST(CAST(ceil(0.2 * max(n)) AS BIGINT) AS BIGINT) AS n_top,
           round(sum(CASE WHEN rn <= ceil(0.2 * n) THEN tot ELSE 0 END)
                 / sum(tot), 6) AS top20_share
    FROM r
"""


def q_readability_documents(sf_dir: str) -> pd.DataFrame:
    """Flesch-Kincaid grade level (Kincaid 1975 — public) with the
    vowel-run syllable heuristic: words = whitespace tokens, sentences =
    runs of [.!?] (min 1), syllables = runs of [aeiouy] in the lowercased
    text. ``0.39·words/sentences + 11.8·syllables/words − 15.59``;
    zero-word docs emit NULLF. Stateless vectorized map — all three
    counts are regex-run counts shared verbatim with the oracle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fk(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("")
        words = t.str.count(r"\S+").to_numpy(np.float64)
        sents = np.maximum(
            t.str.count(r"[.!?]+").to_numpy(np.float64), 1.0)
        syll = t.str.lower().str.count(r"[aeiouy]+") \
            .to_numpy(np.float64)
        grade = np.where(
            words > 0,
            np.round(0.39 * words / sents + 11.8 * syll / words
                     - 15.59, 6) + 0.0,
            NULLF)
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "n_words": words.astype(np.int64),
            "n_sentences": sents.astype(np.int64),
            "n_syllables": syll.astype(np.int64),
            "fk_grade": grade})

    out = docs.map_batches(fk, batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_READABILITY_DOCS = rf"""
    WITH c AS (
        SELECT doc_id,
               length(regexp_extract_all(text, '\S+')) AS words,
               greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
                   AS sents,
               length(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS syll
        FROM documents
    )
    SELECT doc_id, CAST(words AS BIGINT) AS n_words,
           CAST(sents AS BIGINT) AS n_sentences,
           CAST(syll AS BIGINT) AS n_syllables,
           CASE WHEN words > 0
                THEN round(0.39 * words / sents + 11.8 * syll / words
                           - 15.59, 6) + 0.0
                ELSE {NULLF} END AS fk_grade
    FROM c
"""


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, row-vectorized DP: the sequential
    insertion term resolves via the prefix-min identity
    ``cur[j] = j + min_{{k≤j}}(m[k] − k)`` (one ``np.minimum.accumulate``
    per row instead of a per-cell Python loop)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    n = len(bv)
    prev = np.arange(n + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        sub = prev[:-1] + (bv != ord(ca))
        m = np.minimum(prev[1:] + 1, sub)
        d = np.concatenate(([i], m - np.arange(1, n + 1)))
        prev = np.minimum.accumulate(d) + np.arange(n + 1)
    return int(prev[-1])


def q_levenshtein_pairs_documents(sf_dir: str) -> pd.DataFrame:
    """Unit-cost Levenshtein distance for the fixed (2i, 2i+1) pair list
    (the ngram_jaccard_pairs convention) over 200-char prefixes, plus the
    normalized similarity ``1 − dist/max(len_a, len_b)`` (both empty →
    1.0). The classical character-level ER verifier next to the Jaccard /
    containment set measures; pairs verify inside co-located pair groups
    with the row-vectorized DP kernel."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "pair_id": (b["doc_id"] // 2).astype(np.int64),
            "doc_id": b["doc_id"],
            "t": b["text"].fillna("").str[:200]})

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pid, g in part.groupby("pair_id", sort=False):
            if len(g) != 2:
                continue
            g = g.sort_values("doc_id")
            ta, tb = g["t"].iloc[0], g["t"].iloc[1]
            dist = _levenshtein(ta, tb)
            mx = max(len(ta), len(tb))
            sim = 1.0 - dist / mx if mx else 1.0
            rows.append((pid, dist, np.round(sim, 6)))
        return pd.DataFrame(rows, columns=["pair_id", "lev_dist",
                                           "lev_sim"])

    out = keyed_map_partitions(
        docs.map_batches(prep, batch_format="pandas"),
        ["pair_id"], kernel, num_partitions=_NP).to_pandas()
    out = out.astype({"pair_id": "int64", "lev_dist": "int64"})
    return out.sort_values("pair_id").reset_index(drop=True)


SQL_LEVENSHTEIN_PAIRS = """
    WITH t AS (
        SELECT doc_id // 2 AS pair_id, doc_id,
               substr(COALESCE(text, ''), 1, 200) AS t
        FROM documents
    ),
    p AS (
        SELECT a.pair_id, a.t AS ta, b.t AS tb
        FROM t a JOIN t b
            ON a.pair_id = b.pair_id AND a.doc_id < b.doc_id
    )
    SELECT pair_id, CAST(levenshtein(ta, tb) AS BIGINT) AS lev_dist,
           CASE WHEN greatest(strlen(ta), strlen(tb)) = 0 THEN 1.0
                ELSE round(1.0 - levenshtein(ta, tb) * 1.0
                           / greatest(strlen(ta), strlen(tb)), 6)
           END AS lev_sim
    FROM p
"""


def q_cuped_adjusted_users(sf_dir: str) -> pd.DataFrame:
    """CUPED variance reduction (Deng et al. 2013 — public, the A/B-test
    pre-period adjustment): split the stream at the midpoint timestamp,
    x = each user's pre-period value total, y = post-period total (6dp,
    zero when absent), θ = cov(x,y)/var(x) over users, and
    ``y_cuped = y − θ(x − x̄)``. Per-user totals reduce distributedly;
    θ/x̄ fold over the tiny per-user table."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    span = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    ss = span["ts"].to_pandas().astype("datetime64[us]").astype("int64")
    # integer epoch-us midpoint on BOTH sides — DuckDB interval division
    # halves the days and micros components separately, so (max−min)/2
    # arithmetic is NOT portable between the engines
    cut = pd.Timestamp((int(ss.min()) + int(ss.max())) // 2, unit="us")

    def split(b: pd.DataFrame) -> pd.DataFrame:
        pre = b["ts"] < cut
        v = b["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "user_id": b["user_id"],
            "__x": np.where(pre, v, 0.0),
            "__y": np.where(pre, 0.0, v)})

    tot = hash_aggregate(ev.map_batches(split, batch_format="pandas"),
                         ["user_id"], {"x": ("__x", "sum"),
                                       "y": ("__y", "sum")},
                         num_partitions=_NP).to_pandas()
    x = np.round(tot["x"].to_numpy(np.float64), 6)
    y = np.round(tot["y"].to_numpy(np.float64), 6)
    theta = float(np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1))
    out = pd.DataFrame({
        "user_id": tot["user_id"].astype("int64"),
        "x_pre": x, "y_post": y,
        "y_cuped": np.round(y - theta * (x - x.mean()), 6) + 0.0})
    return out.sort_values("user_id").reset_index(drop=True)


SQL_CUPED_ADJUSTED = """
    WITH cut AS (
        SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2)
            AS c FROM events
    ),
    ux AS (
        SELECT user_id,
               round(sum(CASE WHEN ts < c THEN value ELSE 0 END), 6) AS x,
               round(sum(CASE WHEN ts >= c THEN value ELSE 0 END), 6) AS y
        FROM events CROSS JOIN cut GROUP BY 1
    ),
    th AS (
        SELECT covar_samp(x, y) / var_samp(x) AS theta, avg(x) AS mx
        FROM ux
    )
    SELECT user_id, x AS x_pre, y AS y_post,
           round(y - th.theta * (x - th.mx), 6) + 0.0 AS y_cuped
    FROM ux CROSS JOIN th
"""


# ---------------------------------------------------------------------------
# weighted sampling / conversion latency (batch 8)
# ---------------------------------------------------------------------------

def q_weighted_sample_orders(sf_dir: str) -> pd.DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 — public): each order draws u from the md5-bucket
    uniform the plain sampler already pins (``(first-8-hex + 0.5)/2³²``)
    and ranks by ``−ln(u)/w`` with weight w = o_totalprice; the 50
    smallest ranks are the sample — identical across cluster shapes,
    resumes and engines. One vectorized key map, then the distributed
    sort + limit top-k; ids-only output (rank floats never compare)."""
    import hashlib

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def key_fn(b: pd.DataFrame) -> pd.DataFrame:
        h = np.array([int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
                      for k in b["o_orderkey"]], dtype=np.float64)
        u = (h + 0.5) / 4294967296.0
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"],
            "es_key": -np.log(u) / b["o_totalprice"].to_numpy(np.float64)})

    top = orders.map_batches(key_fn, batch_format="pandas") \
        .sort("es_key").limit(50).to_pandas()
    return top[["o_orderkey"]].astype({"o_orderkey": "int64"}) \
        .sort_values("o_orderkey").reset_index(drop=True)


SQL_WEIGHTED_SAMPLE_ORDERS = """
    WITH k AS (
        SELECT o_orderkey,
               -ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                         1, 8)) AS BIGINT) + 0.5)
                   / 4294967296.0) / o_totalprice AS es_key
        FROM orders
    )
    SELECT o_orderkey FROM (
        SELECT o_orderkey FROM k ORDER BY es_key, o_orderkey LIMIT 50
    ) ORDER BY o_orderkey
"""


def q_conversion_latency_events(sf_dir: str) -> pd.DataFrame:
    """Time-to-convert: for each user whose first 'purchase' follows their
    first 'view', the latency seconds between the two firsts; summarized
    as n_converted plus mean / median / p90 latency (linear-interpolated
    quantiles == ``quantile_cont``). First-stamps reduce distributedly
    (min per (user, type)); the latency fold runs over the tiny per-user
    pair table."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(["view", "purchase"])]
        return b[["user_id", "event_type", "ts"]]

    first = hash_aggregate(ev.map_batches(pre, batch_format="pandas"),
                           ["user_id", "event_type"],
                           {"first_ts": ("ts", "min")},
                           num_partitions=_NP).to_pandas()
    piv = first.pivot_table(index="user_id", columns="event_type",
                            values="first_ts", aggfunc="min")
    if "view" not in piv or "purchase" not in piv:
        lat = np.array([], dtype=np.float64)
    else:
        ok = piv["view"].notna() & piv["purchase"].notna() \
            & (piv["purchase"] > piv["view"])
        lat = ((piv.loc[ok, "purchase"].astype("datetime64[us]")
                .astype("int64")
                - piv.loc[ok, "view"].astype("datetime64[us]")
                .astype("int64")) / 1e6).to_numpy(np.float64)
    if len(lat) == 0:
        return pd.DataFrame({"n_converted": np.array([0], dtype=np.int64),
                             "mean_s": [NULLF], "median_s": [NULLF],
                             "p90_s": [NULLF]})
    return pd.DataFrame({
        "n_converted": np.array([len(lat)], dtype=np.int64),
        "mean_s": [np.round(float(lat.mean()), 6)],
        "median_s": [np.round(np.percentile(lat, 50), 6)],
        "p90_s": [np.round(np.percentile(lat, 90), 6)]})


SQL_CONVERSION_LATENCY = f"""
    WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events GROUP BY 1
    ),
    l AS (
        SELECT (epoch_us(fp) - epoch_us(fv)) / 1e6 AS lat
        FROM f WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp > fv
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           COALESCE(round(avg(lat), 6), {NULLF}) AS mean_s,
           COALESCE(round(quantile_cont(lat, 0.5), 6), {NULLF})
               AS median_s,
           COALESCE(round(quantile_cont(lat, 0.9), 6), {NULLF}) AS p90_s
    FROM l
"""


# ---------------------------------------------------------------------------
# RFM / Lorenz / availability islands / new-vs-returning (batch 9)
# ---------------------------------------------------------------------------

def _ntile_from_pos(pos: np.ndarray, n: int, k: int) -> np.ndarray:
    """Exact SQL ``ntile(k)`` bucket (1-based) from 0-based sorted
    positions: the first ``n mod k`` buckets take ``n//k + 1`` rows."""
    q, r = divmod(n, k)
    big = r * (q + 1)
    return np.where(pos < big, pos // (q + 1) + 1,
                    (r + (pos - big) // q + 1) if q else k).astype(np.int64)


def q_rfm_segments_users(sf_dir: str) -> pd.DataFrame:
    """Classic RFM segmentation (Hughes 1994 — public): per user, recency
    = days from the user's last active DAY to the global max day,
    frequency = event count, monetary = 6dp value total; each scored
    1–4 by exact ``ntile(4)`` in (metric, user_id) order (ascending — so
    R 1 = most recent only after the 5−x flip, kept raw here for oracle
    symmetry). Totals reduce distributedly; the three ntile folds run
    over the tiny per-user table."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"],
            "__d": b["ts"].dt.floor("D"),
            "__v": b["value"].to_numpy(np.float64),
            "__one": np.ones(len(b), dtype=np.int64)})

    agg = hash_aggregate(ev.map_batches(pre, batch_format="pandas"),
                         ["user_id"],
                         {"last_d": ("__d", "max"),
                          "frequency": ("__one", "sum"),
                          "monetary": ("__v", "sum")},
                         num_partitions=_NP).to_pandas()
    gmax = agg["last_d"].max()
    agg["recency_days"] = ((gmax - agg["last_d"]).dt.days).astype("int64")
    agg["monetary"] = np.round(agg["monetary"].to_numpy(np.float64), 6)
    agg["frequency"] = agg["frequency"].astype("int64")
    n = len(agg)
    for col, score in (("recency_days", "r_score"),
                       ("frequency", "f_score"),
                       ("monetary", "m_score")):
        order = agg.sort_values([col, "user_id"]).index
        pos = np.empty(n, dtype=np.int64)
        pos[agg.index.get_indexer(order)] = np.arange(n)
        agg[score] = _ntile_from_pos(pos, n, 4)
    out = agg[["user_id", "recency_days", "frequency", "monetary",
               "r_score", "f_score", "m_score"]].copy()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


SQL_RFM_SEGMENTS = """
    WITH u AS (
        SELECT user_id, max(date_trunc('day', ts)) AS last_d,
               count(*) AS frequency, round(sum(value), 6) AS monetary
        FROM events GROUP BY 1
    ),
    g AS (SELECT max(last_d) AS gmax FROM u)
    SELECT user_id,
           CAST(datediff('day', last_d, g.gmax) AS BIGINT)
               AS recency_days,
           CAST(frequency AS BIGINT) AS frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY datediff('day', last_d, g.gmax),
                               user_id) AS BIGINT) AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency, user_id) AS BIGINT)
               AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary, user_id) AS BIGINT)
               AS m_score
    FROM u CROSS JOIN g
"""


def q_lorenz_deciles_users(sf_dir: str) -> pd.DataFrame:
    """Lorenz curve in decile form (the Gini entry's visual twin): users
    ntile(10)-bucketed by ascending 6dp value total, each decile's share
    of the grand total and the cumulative share. Exact ntile semantics
    shared with the RFM entry."""
    ev = _read(sf_dir, "events", ["user_id", "value"])
    tot = hash_aggregate(ev, ["user_id"], {"tot": ("value", "sum")},
                         num_partitions=_NP).to_pandas()
    tot["tot"] = np.round(tot["tot"].to_numpy(np.float64), 6)
    tot = tot.sort_values(["tot", "user_id"]).reset_index(drop=True)
    n = len(tot)
    tot["decile"] = _ntile_from_pos(np.arange(n), n, 10)
    g = tot.groupby("decile", sort=True).agg(
        n_users=("user_id", "size"), dec_sum=("tot", "sum")).reset_index()
    total = float(tot["tot"].sum())
    g["share"] = np.round(g["dec_sum"].to_numpy(np.float64) / total, 6)
    g["cum_share"] = np.round(
        g["dec_sum"].cumsum().to_numpy(np.float64) / total, 6)
    g["decile"] = g["decile"].astype("int64")
    g["n_users"] = g["n_users"].astype("int64")
    return g[["decile", "n_users", "share", "cum_share"]]


SQL_LORENZ_DECILES = """
    WITH t AS (
        SELECT user_id, round(sum(value), 6) AS tot
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT tot, ntile(10) OVER (ORDER BY tot, user_id) AS decile
        FROM t
    ),
    s AS (
        SELECT decile, count(*) AS n_users, sum(tot) AS dec_sum
        FROM d GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_users AS BIGINT) AS n_users,
           round(dec_sum / (SELECT sum(tot) FROM t), 6) AS share,
           round(sum(dec_sum) OVER (ORDER BY decile)
                 / (SELECT sum(tot) FROM t), 6) AS cum_share
    FROM s
"""


def q_availability_islands_daily(sf_dir: str) -> pd.DataFrame:
    """Calendar gaps-and-islands per daily series: contiguous-day runs
    (islands) over the observed days — island count, longest island, and
    the largest calendar gap in days. The record-streak entry runs
    VALUE-direction islands; this one runs CALENDAR-continuity islands
    (the availability/SLA dashboard row). One keyed vectorized kernel;
    oracle is the textbook ``d − rn·INTERVAL`` island constant."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            d = np.sort(g["d"].astype("datetime64[us]").astype("int64")
                        .to_numpy()) // DAY_US
            gaps = np.diff(d)
            new_isl = gaps > 1
            lens = np.diff(np.concatenate(
                ([0], np.flatnonzero(new_isl) + 1, [len(d)])))
            rows.append((et, len(d), int(new_isl.sum()) + 1,
                         int(lens.max()),
                         int(gaps.max()) if len(gaps) else 0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "n_islands", "longest_island",
                                           "max_gap_days"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    for c in ("n_days", "n_islands", "longest_island", "max_gap_days"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_AVAILABILITY_ISLANDS = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d,
               epoch_us(d) // {DAY_US}
                   - row_number() OVER (PARTITION BY event_type ORDER BY d)
                   AS isl,
               epoch_us(d) // {DAY_US}
                   - LAG(epoch_us(d) // {DAY_US}) OVER (
                         PARTITION BY event_type ORDER BY d) AS gap
        FROM daily
    ),
    i AS (
        SELECT event_type, isl, count(*) AS len
        FROM r GROUP BY 1, 2
    )
    SELECT i.event_type, CAST(sum(i.len) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(i.len) AS BIGINT) AS longest_island,
           CAST(COALESCE(g.mg, 0) AS BIGINT) AS max_gap_days
    FROM i JOIN (SELECT event_type, max(gap) AS mg FROM r GROUP BY 1) g
        USING (event_type)
    GROUP BY 1, g.mg
"""


def q_new_vs_returning_daily(sf_dir: str) -> pd.DataFrame:
    """Growth-accounting split per day: users active that day whose
    FIRST-ever active day it is (new) vs the rest (returning). Distinct
    (user, day) memberships and per-user first days both reduce
    distributedly; the split is a broadcast first-day lookup inside the
    day counts."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b["user_id"],
                             "d": b["ts"].dt.floor("D")})

    du = hash_aggregate(ev.map_batches(day_fn, batch_format="pandas"),
                        ["user_id", "d"], {"__n": ("user_id", "size")},
                        num_partitions=_NP)
    firsts = hash_aggregate(du, ["user_id"], {"first_d": ("d", "min")},
                            num_partitions=_NP).to_pandas()
    fmap = dict(zip(firsts["user_id"], firsts["first_d"]))

    def label(b: pd.DataFrame) -> pd.DataFrame:
        fd = b["user_id"].map(fmap)
        return pd.DataFrame({
            "d": b["d"],
            "__new": (b["d"] == fd).astype(np.int64),
            "__ret": (b["d"] != fd).astype(np.int64)})

    out = hash_aggregate(du.map_batches(label, batch_format="pandas"),
                         ["d"], {"n_new": ("__new", "sum"),
                                 "n_returning": ("__ret", "sum")},
                         num_partitions=4).to_pandas()
    out = out.astype({"n_new": "int64", "n_returning": "int64"})
    return out.sort_values("d").reset_index(drop=True)


SQL_NEW_VS_RETURNING = """
    WITH du AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    f AS (SELECT user_id, min(d) AS first_d FROM du GROUP BY 1)
    SELECT du.d,
           CAST(sum(CASE WHEN du.d = f.first_d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN du.d <> f.first_d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning
    FROM du JOIN f USING (user_id)
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# stickiness / calendar rollups / MTD / robust shape (batch 10)
# ---------------------------------------------------------------------------

def q_dau_wau_stickiness(sf_dir: str) -> pd.DataFrame:
    """DAU/WAU stickiness per day (the engagement dashboard headline):
    daily distinct users over trailing-7-day distinct users. WAU reuses
    the shuffle-free fan-out expansion (membership → covered days →
    re-distinct) the per-type rolling-distinct entry pins, here on the
    global user space."""
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"d": b["ts"].dt.floor("D"),
                             "user_id": b["user_id"]})

    du = hash_aggregate(ev.map_batches(day_fn, batch_format="pandas"),
                        ["d", "user_id"], {"__n": ("user_id", "size")},
                        num_partitions=_NP)
    dau = hash_aggregate(du, ["d"], {"dau": ("user_id", "size")},
                         num_partitions=4).to_pandas()

    def fan_out(b: pd.DataFrame) -> pd.DataFrame:
        k = 7
        idx = np.repeat(np.arange(len(b)), k)
        off = np.tile(np.arange(k), len(b))
        return pd.DataFrame({
            "d": b["d"].to_numpy()[idx] + off.astype("timedelta64[D]"),
            "user_id": b["user_id"].to_numpy()[idx]})

    cov = hash_aggregate(du.map_batches(fan_out, batch_format="pandas"),
                         ["d", "user_id"], {"__n": ("user_id", "size")},
                         num_partitions=_NP)
    wau = hash_aggregate(cov, ["d"], {"wau": ("user_id", "size")},
                         num_partitions=4).to_pandas()
    out = dau.merge(wau, on="d")  # inner: only observed days survive
    out["dau"] = out["dau"].astype("int64")
    out["wau"] = out["wau"].astype("int64")
    out["stickiness"] = np.round(
        out["dau"].to_numpy(np.float64) / out["wau"].to_numpy(np.float64),
        6)
    return out[["d", "dau", "wau", "stickiness"]] \
        .sort_values("d").reset_index(drop=True)


SQL_DAU_WAU_STICKINESS = """
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    dau AS (SELECT d, count(*) AS dau FROM du GROUP BY 1),
    wau AS (
        SELECT days.d, count(DISTINCT du.user_id) AS wau
        FROM days JOIN du
            ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
        GROUP BY 1
    )
    SELECT d, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau USING (d)
"""


def q_weekly_calendar_rollup(sf_dir: str) -> pd.DataFrame:
    """Calendar-week rollup (Monday-anchored, ``date_trunc('week')``
    semantics) per series — the CALENDAR-aligned retention-tier variant
    next to the epoch-anchored 7d tier: n days, value sum/mean/max per
    (series, week start)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def week_fn(b: pd.DataFrame) -> pd.DataFrame:
        d = b["ts"].dt.floor("D")
        wk = d - pd.to_timedelta(d.dt.dayofweek, unit="D")
        return pd.DataFrame({"event_type": b["event_type"], "wk": wk,
                             "__v": b["value"].to_numpy(np.float64),
                             "__one": np.ones(len(b), dtype=np.int64)})

    out = hash_aggregate(ev.map_batches(week_fn, batch_format="pandas"),
                         ["event_type", "wk"],
                         {"n": ("__one", "sum"), "sum_v": ("__v", "sum"),
                          "max_v": ("__v", "max")},
                         num_partitions=_NP).to_pandas()
    out["mean_v"] = np.round(out["sum_v"].to_numpy(np.float64)
                             / out["n"].to_numpy(np.float64), 6)
    out = _round(out, ["sum_v", "max_v"], 6)
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "wk", "n", "sum_v", "mean_v", "max_v"]] \
        .sort_values(["event_type", "wk"]).reset_index(drop=True)


SQL_WEEKLY_CALENDAR_ROLLUP = """
    SELECT event_type, date_trunc('week', ts) AS wk,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 6) AS sum_v,
           round(sum(value) / count(*), 6) AS mean_v,
           round(max(value), 6) AS max_v
    FROM events GROUP BY 1, 2
"""


def q_mtd_cumsum_daily(sf_dir: str) -> pd.DataFrame:
    """Month-to-date running total per daily series — the expanding sum
    with CALENDAR-RESET semantics (restarts at each month boundary), the
    fiscal-dashboard companion to the plain expanding entry. One keyed
    kernel (grouped cumsum inside (series, month)); oracle is a
    month-partitioned window."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            mo = g["d"].dt.to_period("M")
            g["mtd_v"] = np.round(
                g.groupby(mo, sort=False)["v"].cumsum()
                .to_numpy(np.float64), 6) + 0.0
            outs.append(g[["event_type", "d", "v", "mtd_v"]])
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "mtd_v"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_MTD_CUMSUM_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           round(sum(v) OVER (PARTITION BY event_type,
                                           date_trunc('month', d)
                              ORDER BY d
                              ROWS UNBOUNDED PRECEDING), 6) + 0.0
               AS mtd_v
    FROM daily
"""


def q_bowley_skew_events(sf_dir: str) -> pd.DataFrame:
    """Bowley quartile skewness (Bowley 1901 — public, the robust shape
    twin of the moment skew): ``(Q3 + Q1 − 2·Q2) / (Q3 − Q1)`` of value
    per event type, with linear-interpolated quartiles
    (``quantile_cont``). Zero-IQR groups emit NULLF."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["value"].to_numpy(np.float64)
            q1, q2, q3 = (np.percentile(v, p) for p in (25, 50, 75))
            iqr = q3 - q1
            b = np.round((q3 + q1 - 2 * q2) / iqr, 6) if iqr > 0 else NULLF
            rows.append((et, len(v), np.round(q1, 6), np.round(q2, 6),
                         np.round(q3, 6), b))
        return pd.DataFrame(rows, columns=["event_type", "n", "q1", "q2",
                                           "q3", "bowley_skew"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_BOWLEY_SKEW = f"""
    WITH q AS (
        SELECT event_type, count(*) AS n,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.50) AS q2,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(q1, 6) AS q1, round(q2, 6) AS q2, round(q3, 6) AS q3,
           CASE WHEN q3 - q1 > 0
                THEN round((q3 + q1 - 2 * q2) / (q3 - q1), 6)
                ELSE {NULLF} END AS bowley_skew
    FROM q
"""


# ---------------------------------------------------------------------------
# char-LM score / dup histogram / TTR / lead-lag discovery (batch 11)
# ---------------------------------------------------------------------------

def q_char_trigram_score_documents(sf_dir: str) -> pd.DataFrame:
    """Character-trigram corpus-LM quality score (the char-level CCNet
    twin of ``unigram_logprob``): corpus trigram frequencies over the
    lowercased text (short docs contribute one truncated gram — the
    shingle convention), per-doc score = mean ln(C(g)/T) over the doc's
    gram OCCURRENCES. Gram counts pre-reduce per batch before one narrow
    merge (the vocabulary is alphabet³-bounded — tiny); scoring broadcasts
    the count table once."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def grams_of(t: str) -> list:
        n = max(len(t) - 2, 1)
        return [t[i:i + 3] for i in range(n)]

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        allg = []
        for t in b["text"].fillna("").str.lower():
            allg.extend(grams_of(t))
        vc = pd.Series(allg).value_counts()
        return pd.DataFrame({"g": vc.index, "n": vc.to_numpy(np.int64)})

    counts = hash_aggregate(
        docs.map_batches(partial_counts, batch_format="pandas"),
        ["g"], {"n": ("n", "sum")}, num_partitions=4).to_pandas()
    total = float(counts["n"].sum())
    logp = dict(zip(counts["g"],
                    np.log(counts["n"].to_numpy(np.float64) / total)))

    import ray as _ray
    ref = _ray.put(logp)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lp = _ray.get(ref)
        rows = []
        for did, t in zip(b["doc_id"], b["text"].fillna("").str.lower()):
            gs = grams_of(t)
            rows.append((did, len(gs),
                         np.round(float(np.mean([lp[g] for g in gs])), 6)))
        return pd.DataFrame(rows, columns=["doc_id", "n_grams", "score"])

    out = docs.map_batches(score, batch_format="pandas").to_pandas()
    out = out.astype({"doc_id": "int64", "n_grams": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_CHAR_TRIGRAM_SCORE = """
    WITH g AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(strlen(lower(text)) - 2, 1)),
                   i -> substr(lower(text), i, 3))) AS t
        FROM documents
    ),
    c AS (SELECT t, count(*) AS n FROM g GROUP BY 1),
    tot AS (SELECT sum(n) AS tt FROM c)
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           round(avg(ln(c.n / tot.tt)), 6) AS score
    FROM g JOIN c USING (t) CROSS JOIN tot
    GROUP BY 1
"""


def q_dup_class_histogram_documents(sf_dir: str) -> pd.DataFrame:
    """Duplicate-class size histogram (the curation diagnostic behind the
    dedup funnel's yield estimate): exact-duplicate classes by text
    digest, then class-size → class-count. Both reduces are narrow (the
    32-char digest, then one int)."""
    from forecastframe_ray.pipelines.dedup import _digest_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    classes = hash_aggregate(
        docs.map_batches(lambda b: _digest_batch(b, "text"),
                         batch_format="pandas"),
        ["__digest"], {"class_size": ("doc_id", "size")},
        num_partitions=_NP)
    hist = hash_aggregate(classes, ["class_size"],
                          {"n_classes": ("class_size", "size")},
                          num_partitions=4).to_pandas()
    hist = hist.astype({"class_size": "int64", "n_classes": "int64"})
    return hist.sort_values("class_size").reset_index(drop=True)


SQL_DUP_CLASS_HISTOGRAM = """
    WITH c AS (SELECT count(*) AS class_size FROM documents GROUP BY text)
    SELECT CAST(class_size AS BIGINT) AS class_size,
           CAST(count(*) AS BIGINT) AS n_classes
    FROM c GROUP BY 1
"""


def q_ttr_documents(sf_dir: str) -> pd.DataFrame:
    """Type-token ratio per document (the lexical-richness quality
    signal): distinct whitespace tokens over total tokens; zero-token
    docs emit NULLF. Stateless vectorized map sharing the \\S+ token
    convention with the token-count entry."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def ttr(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, t in zip(b["doc_id"], b["text"].fillna("")):
            toks = t.split()
            n = len(toks)
            d = len(set(toks))
            rows.append((did, n, d,
                         np.round(d / n, 6) if n else NULLF))
        return pd.DataFrame(rows, columns=["doc_id", "n_tokens",
                                           "n_types", "ttr"])

    out = docs.map_batches(ttr, batch_format="pandas").to_pandas()
    out = out.astype({"doc_id": "int64", "n_tokens": "int64",
                      "n_types": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_TTR_DOCUMENTS = rf"""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        FROM documents
    )
    SELECT doc_id, CAST(length(toks) AS BIGINT) AS n_tokens,
           CAST(length(list_distinct(toks)) AS BIGINT) AS n_types,
           CASE WHEN length(toks) > 0
                THEN round(length(list_distinct(toks)) * 1.0
                           / length(toks), 6)
                ELSE {NULLF} END AS ttr
    FROM t
"""


def q_lead_lag_xcorr_daily(sf_dir: str) -> pd.DataFrame:
    """Lead-lag discovery between every two daily series: Pearson
    correlation of (a_t, b_{t+lag}) for lag ∈ [−3, 3] over common days,
    reporting each pair's best lag by |corr| (6dp-rounded; ties → the
    smaller lag). Positive best_lag ⇒ a LEADS b. The daily spine is
    already the reduced table (days × types), so the 7-lag × pair fold
    runs over it directly; per-lag corr needs ≥ 2 common days and
    nonzero variance (else the lag is skipped)."""
    daily = _bucket_series(sf_dir, DAY_US, "d").to_pandas()
    piv = daily.pivot_table(index="d", columns="event_type", values="v",
                            aggfunc="sum").sort_index()
    types = sorted(piv.columns)
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            best = None
            for lag in range(-3, 4):
                a = piv[ta]
                b = piv[tb].shift(-lag)  # b_{t+lag} aligned to t
                ok = a.notna() & b.notna()
                if ok.sum() < 2:
                    continue
                av, bv = a[ok].to_numpy(np.float64), \
                    b[ok].to_numpy(np.float64)
                if av.std() == 0 or bv.std() == 0:
                    continue
                c = np.round(float(np.corrcoef(av, bv)[0, 1]), 6)
                key = (-abs(c), lag)
                if best is None or key < best[0]:
                    best = (key, lag, c, int(ok.sum()))
            if best is not None:
                rows.append((ta, tb, best[1], best[2], best[3]))
    out = pd.DataFrame(rows, columns=["ta", "tb", "best_lag", "best_corr",
                                      "n_common"])
    out = out.astype({"best_lag": "int64", "n_common": "int64"})
    return out.sort_values(["ta", "tb"]).reset_index(drop=True)


SQL_LEAD_LAG_XCORR = f"""
    WITH daily AS ({_DAILY_SQL}),
    lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
               a.v AS av, b.v AS bv
        FROM daily a
        CROSS JOIN lags l
        JOIN daily b ON b.event_type > a.event_type
                    AND b.d = a.d + l.lag * INTERVAL 1 DAY
    ),
    c AS (
        SELECT ta, tb, lag, count(*) AS n_common,
               round(corr(av, bv), 6) AS r
        FROM pairs GROUP BY 1, 2, 3
        HAVING count(*) >= 2 AND corr(av, bv) IS NOT NULL
    ),
    best AS (
        SELECT ta, tb, lag, r, n_common,
               row_number() OVER (PARTITION BY ta, tb
                                  ORDER BY abs(r) DESC, lag) AS rn
        FROM c
    )
    SELECT ta, tb, CAST(lag AS BIGINT) AS best_lag, r AS best_corr,
           CAST(n_common AS BIGINT) AS n_common
    FROM best WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Mann-Whitney / dow ANOVA / runs test (batch 12)
# ---------------------------------------------------------------------------

def q_mannwhitney_events(sf_dir: str) -> pd.DataFrame:
    """Mann-Whitney U (Mann & Whitney 1947 — public) between the 'click'
    and 'view' value samples with tie-corrected AVERAGE ranks, plus the
    rank-biserial effect size ``1 − 2U/(n_a·n_b)``. Like the KS entry,
    rows reduce to one (value, count_a, count_b) row per distinct value
    first; ranks then come from the cumulative counts over that reduced
    table (avg rank of v = #below + (#at(v)+1)/2) — no row-level rank
    shuffle."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def parts(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(["click", "view"])]
        return pd.DataFrame({
            "value": b["value"],
            "__a": (b["event_type"] == "click").astype(np.int64),
            "__b": (b["event_type"] == "view").astype(np.int64)})

    red = hash_aggregate(ev.map_batches(parts, batch_format="pandas"),
                         ["value"], {"c_a": ("__a", "sum"),
                                     "c_b": ("__b", "sum")},
                         num_partitions=_NP).to_pandas()
    red = red.sort_values("value").reset_index(drop=True)
    ct = (red["c_a"] + red["c_b"]).to_numpy(np.float64)
    below = np.concatenate(([0.0], np.cumsum(ct)[:-1]))
    avg_rank = below + (ct + 1.0) / 2.0
    na = float(red["c_a"].sum())
    nb = float(red["c_b"].sum())
    ra = float((avg_rank * red["c_a"].to_numpy(np.float64)).sum())
    u = ra - na * (na + 1.0) / 2.0
    return pd.DataFrame({
        "n_click": np.array([int(na)], dtype=np.int64),
        "n_view": np.array([int(nb)], dtype=np.int64),
        "u_stat": [np.round(u, 6)],
        "rank_biserial": [np.round(1.0 - 2.0 * u / (na * nb), 6)]})


SQL_MANNWHITNEY = """
    WITH s AS (
        SELECT value,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
    ),
    r AS (
        SELECT ca, cb,
               COALESCE(sum(ca + cb) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (ca + cb + 1) / 2.0 AS avg_rank
        FROM s
    ),
    t AS (
        SELECT sum(ca) AS na, sum(cb) AS nb,
               sum(avg_rank * ca) AS ra
        FROM r
    )
    SELECT CAST(na AS BIGINT) AS n_click, CAST(nb AS BIGINT) AS n_view,
           round(ra - na * (na + 1) / 2.0, 6) AS u_stat,
           round(1.0 - 2.0 * (ra - na * (na + 1) / 2.0) / (na * nb), 6)
               AS rank_biserial
    FROM t
"""


def q_dow_anova_daily(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA F of the daily value by ISO weekday per series (the
    'is the weekly seasonality significant' test): F = (SSB/(k−1)) /
    (SSW/(n−k)) over the dow groups. One keyed kernel per series; zero
    within-variance emits NULLF."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["v"].to_numpy(np.float64)
            dow = (g["d"].dt.dayofweek + 1).to_numpy(np.int64)
            n = len(v)
            gm = v.mean()
            ssb = ssw = 0.0
            k = 0
            for w in np.unique(dow):
                gv = v[dow == w]
                k += 1
                ssb += len(gv) * (gv.mean() - gm) ** 2
                ssw += ((gv - gv.mean()) ** 2).sum()
            f = np.round((ssb / (k - 1)) / (ssw / (n - k)), 6) \
                if (k > 1 and n > k and ssw > 0) else NULLF
            rows.append((et, n, k, f))
        return pd.DataFrame(rows, columns=["event_type", "n", "k_groups",
                                           "f_stat"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = out.astype({"n": "int64", "k_groups": "int64"})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DOW_ANOVA = f"""
    WITH daily AS ({_DAILY_SQL}),
    d AS (SELECT event_type, isodow(d) AS dow, v FROM daily),
    g AS (
        SELECT event_type, dow, count(*) AS ng, avg(v) AS mg,
               sum(v * v) - count(*) * avg(v) * avg(v) AS ssw_g
        FROM d GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, count(*) AS n, avg(v) AS gm
        FROM d GROUP BY 1
    ),
    s AS (
        SELECT g.event_type, max(tot.n) AS n, count(*) AS k,
               sum(g.ng * (g.mg - tot.gm) * (g.mg - tot.gm)) AS ssb,
               sum(g.ssw_g) AS ssw
        FROM g JOIN tot USING (event_type)
        GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT)
               AS k_groups,
           CASE WHEN k > 1 AND n > k AND ssw > 0
                THEN round((ssb / (k - 1)) / (ssw / (n - k)), 6)
                ELSE {NULLF} END AS f_stat
    FROM s
"""


def q_runs_test_daily(sf_dir: str) -> pd.DataFrame:
    """Wald–Wolfowitz runs test (1940 — public) per daily series: drop
    days equal to the series median, count sign runs above/below, and
    report the z-statistic ``(R − μ)/σ`` with μ = 2·n₁·n₂/n + 1. One
    keyed kernel; degenerate splits (n₁ or n₂ = 0, or σ = 0) emit
    NULLF."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            v = g["v"].to_numpy(np.float64)
            med = np.round(float(np.percentile(v, 50)), 6)
            s = v[v != med] > med
            n1 = int(s.sum())
            n2 = int(len(s) - n1)
            n = n1 + n2
            runs = int(1 + (s[1:] != s[:-1]).sum()) if n else 0
            if n1 and n2:
                mu = 2.0 * n1 * n2 / n + 1.0
                var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                       / (n * n * (n - 1.0)))
                z = np.round((runs - mu) / np.sqrt(var), 6) \
                    if var > 0 else NULLF
            else:
                z = NULLF
            rows.append((et, n1, n2, runs, z))
        return pd.DataFrame(rows, columns=["event_type", "n_above",
                                           "n_below", "n_runs", "z_stat"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    for c in ("n_above", "n_below", "n_runs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_RUNS_TEST = f"""
    WITH daily AS ({_DAILY_SQL}),
    med AS (
        SELECT event_type, round(quantile_cont(v, 0.5), 6) AS med
        FROM daily GROUP BY 1
    ),
    s AS (
        SELECT daily.event_type, daily.d,
               CASE WHEN daily.v > med.med THEN 1 ELSE 0 END AS above
        FROM daily JOIN med USING (event_type)
        WHERE daily.v <> med.med
    ),
    l AS (
        SELECT event_type, above,
               LAG(above) OVER (PARTITION BY event_type ORDER BY d) AS pa
        FROM s
    ),
    agg AS (
        SELECT event_type,
               sum(above) AS n1,
               sum(1 - above) AS n2,
               1 + sum(CASE WHEN pa IS NOT NULL AND above <> pa
                            THEN 1 ELSE 0 END) AS runs
        FROM l GROUP BY 1
    )
    SELECT event_type, CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(runs AS BIGINT) AS n_runs,
           CASE WHEN n1 > 0 AND n2 > 0
                     AND 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) > 0
                THEN round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1))
                           / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                                  / ((n1 + n2) * (n1 + n2)
                                     * (n1 + n2 - 1.0))), 6)
                ELSE {NULLF} END AS z_stat
    FROM agg
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 / windowed conversion / relational division (batch 13)
# ---------------------------------------------------------------------------

def q_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape (public spec): per-nation revenue
    ``Σ l_extendedprice·(1−l_discount)`` for ASIA-region nations over one
    order year, counting only lineitems whose supplier and customer share
    the nation. Dim chain region→nation→supplier broadcasts as one
    suppkey→nation map (dims ≪ fact); orders in the window semi-filter
    then carry c_nationkey through the CPU-clamped distributed hash join
    against the lineitem stream — the Q3 plan with a second broadcast
    dimension attached."""
    from forecastframe_ray.stages.join import (consolidate_for_join,
                                               hash_join)

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia = nat.merge(reg[reg["r_name"] == "ASIA"], left_on="n_regionkey",
                     right_on="r_regionkey")[["n_nationkey", "n_name"]]
    nkeys = set(asia["n_nationkey"])
    nname = dict(zip(asia["n_nationkey"], asia["n_name"]))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    smap = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    cmap = dict(zip(cust["c_custkey"], cust["c_nationkey"]))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        cn = b["o_custkey"].map(cmap)
        keep = cn.isin(nkeys)
        return pd.DataFrame({"o_orderkey": b["o_orderkey"][keep],
                             "c_nat": cn[keep].astype(np.int64)})

    ords = consolidate_for_join(
        orders.map_batches(ord_prep, batch_format="pandas"), 8)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])

    def li_prep(b: pd.DataFrame) -> pd.DataFrame:
        sn = b["l_suppkey"].map(smap)
        keep = sn.isin(nkeys)
        b = b[keep]
        return pd.DataFrame({
            "o_orderkey": b["l_orderkey"],
            "s_nat": sn[keep].astype(np.int64),
            "part": b["l_extendedprice"].to_numpy(np.float64)
                    * (1.0 - b["l_discount"].to_numpy(np.float64))})

    joined = hash_join(li.map_batches(li_prep, batch_format="pandas"),
                       ords, on=["o_orderkey"], num_partitions=8)

    def local_filter(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["s_nat"] == b["c_nat"]]
        return pd.DataFrame({"n_nat": b["s_nat"], "part": b["part"]})

    agg = hash_aggregate(
        joined.map_batches(local_filter, batch_format="pandas"),
        ["n_nat"], {"revenue": ("part", "sum")},
        num_partitions=4).to_pandas()
    agg["n_name"] = agg["n_nat"].map(nname)
    agg = _round(agg, ["revenue"], 6)
    return agg[["n_name", "revenue"]].sort_values("n_name") \
        .reset_index(drop=True)


SQL_LOCAL_SUPPLIER_VOLUME = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
                 AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY 1
"""


def q_conversion_within_7d(sf_dir: str) -> pd.DataFrame:
    """Windowed conversion rate: among users with a 'view', the share
    whose first 'purchase' lands within 7 days AFTER their first view —
    the funnel entry's timeout-constrained twin. Same distributed
    first-stamp reduce."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(["view", "purchase"])]
        return b[["user_id", "event_type", "ts"]]

    first = hash_aggregate(ev.map_batches(pre, batch_format="pandas"),
                           ["user_id", "event_type"],
                           {"first_ts": ("ts", "min")},
                           num_partitions=_NP).to_pandas()
    piv = first.pivot_table(index="user_id", columns="event_type",
                            values="first_ts", aggfunc="min")
    if "view" not in piv:
        n_viewers = 0
        n_conv = 0
    else:
        viewers = piv["view"].notna()
        n_viewers = int(viewers.sum())
        if "purchase" in piv:
            lat_us = (piv["purchase"] - piv["view"]) \
                .dt.total_seconds() * 1e6
            conv = viewers & piv["purchase"].notna() & (lat_us > 0) \
                & (lat_us <= 7 * 86_400_000_000)
            n_conv = int(conv.sum())
        else:
            n_conv = 0
    rate = np.round(n_conv / n_viewers, 6) if n_viewers else NULLF
    return pd.DataFrame({
        "n_viewers": np.array([n_viewers], dtype=np.int64),
        "n_converted_7d": np.array([n_conv], dtype=np.int64),
        "conv_rate_7d": [rate]})


SQL_CONVERSION_WITHIN_7D = f"""
    WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events GROUP BY 1
    ),
    v AS (SELECT * FROM f WHERE fv IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_viewers,
           CAST(COALESCE(sum(CASE WHEN fp > fv
                     AND epoch_us(fp) - epoch_us(fv)
                         <= 7 * 86400000000 THEN 1 END), 0) AS BIGINT)
               AS n_converted_7d,
           CASE WHEN count(*) > 0
                THEN round(COALESCE(sum(CASE WHEN fp > fv
                         AND epoch_us(fp) - epoch_us(fv)
                             <= 7 * 86400000000 THEN 1 END), 0)
                           * 1.0 / count(*), 6)
                ELSE {NULLF} END AS conv_rate_7d
    FROM v
"""


def q_power_users_division(sf_dir: str) -> pd.DataFrame:
    """Relational DIVISION (Codd — public; the 'for all' join family the
    semi/anti entries don't cover): users active in EVERY event type the
    corpus contains. Distinct (user, type) memberships reduce once; a
    user divides when its distinct-type count equals the global type
    count."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    du = hash_aggregate(ev, ["user_id", "event_type"],
                        {"__n": ("event_type", "size")},
                        num_partitions=_NP)
    per_user = hash_aggregate(du, ["user_id"],
                              {"n_types": ("event_type", "size")},
                              num_partitions=_NP).to_pandas()
    n_all = int(hash_aggregate(du, ["event_type"],
                               {"__n": ("user_id", "size")},
                               num_partitions=4).count())
    out = per_user[per_user["n_types"] == n_all][["user_id", "n_types"]]
    out = out.astype({"user_id": "int64", "n_types": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)


SQL_POWER_USERS_DIVISION = """
    WITH du AS (SELECT DISTINCT user_id, event_type FROM events),
    t AS (SELECT count(DISTINCT event_type) AS n_all FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_types
    FROM du GROUP BY 1
    HAVING count(*) = (SELECT n_all FROM t)
"""


# ---------------------------------------------------------------------------
# market-basket lift / HHI / centroid geometry (batch 14)
# ---------------------------------------------------------------------------

def q_basket_lift_lineitem(sf_dir: str) -> pd.DataFrame:
    """Market-basket association (Agrawal 1993 — public): among the
    top-50 parts by order frequency (count desc, partkey asc — a
    deterministic cut), every part pair co-occurring in ≥2 orders with
    its lift ``n_ab·N / (n_a·n_b)`` over the order universe. The top-part
    set broadcasts as a filter; pair fan-out happens inside per-order
    co-located groups (never a global self-join of the fact table)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part_orders = hash_aggregate(li, ["l_partkey", "l_orderkey"],
                                 {"__n": ("l_partkey", "size")},
                                 num_partitions=_NP)
    pcnt = hash_aggregate(part_orders, ["l_partkey"],
                          {"n_ord": ("l_orderkey", "size")},
                          num_partitions=_NP).to_pandas()
    top = pcnt.sort_values(["n_ord", "l_partkey"],
                           ascending=[False, True]).head(50)
    topset = set(top["l_partkey"])
    acnt = dict(zip(top["l_partkey"], top["n_ord"]))
    n_orders = int(hash_aggregate(li, ["l_orderkey"],
                                  {"__n": ("l_orderkey", "size")},
                                  num_partitions=_NP).count())

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["l_partkey"].isin(topset)]

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b = [], []
        for okey, g in part.groupby("l_orderkey", sort=False):
            ps = np.unique(g["l_partkey"].to_numpy())
            if len(ps) < 2:
                continue
            ia, ib = np.triu_indices(len(ps), 1)
            rows_a.append(ps[ia])
            rows_b.append(ps[ib])
        if not rows_a:
            return pd.DataFrame({"pa": pd.Series([], dtype=np.int64),
                                 "pb": pd.Series([], dtype=np.int64),
                                 "__one": pd.Series([], dtype=np.int64)})
        a = np.concatenate(rows_a)
        return pd.DataFrame({"pa": a, "pb": np.concatenate(rows_b),
                             "__one": np.ones(len(a), dtype=np.int64)})

    co = hash_aggregate(
        keyed_map_partitions(
            part_orders.map_batches(filt, batch_format="pandas"),
            ["l_orderkey"], pairs, num_partitions=_NP),
        ["pa", "pb"], {"n_ab": ("__one", "sum")},
        num_partitions=4).to_pandas()
    co = co[co["n_ab"] >= 2].copy()
    na = co["pa"].map(acnt).to_numpy(np.float64)
    nb = co["pb"].map(acnt).to_numpy(np.float64)
    co["lift"] = np.round(co["n_ab"].to_numpy(np.float64) * n_orders
                          / (na * nb), 6)
    co = co.astype({"pa": "int64", "pb": "int64", "n_ab": "int64"})
    return co[["pa", "pb", "n_ab", "lift"]] \
        .sort_values(["pa", "pb"]).reset_index(drop=True)


SQL_BASKET_LIFT = """
    WITH po AS (
        SELECT DISTINCT l_partkey, l_orderkey FROM lineitem
    ),
    cnt AS (SELECT l_partkey, count(*) AS n_ord FROM po GROUP BY 1),
    top AS (
        SELECT l_partkey, n_ord FROM cnt
        ORDER BY n_ord DESC, l_partkey LIMIT 50
    ),
    tpo AS (SELECT po.* FROM po JOIN top USING (l_partkey)),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    co AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
        FROM tpo a JOIN tpo b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT pa, pb, CAST(n_ab AS BIGINT) AS n_ab,
           round(n_ab * 1.0 * n.n_orders / (ta.n_ord * tb.n_ord), 6)
               AS lift
    FROM co JOIN top ta ON ta.l_partkey = co.pa
            JOIN top tb ON tb.l_partkey = co.pb
            CROSS JOIN n
"""


def q_hhi_suppliers_lineitem(sf_dir: str) -> pd.DataFrame:
    """Herfindahl–Hirschman concentration index (public antitrust
    convention, ×10000) of supplier revenue shares
    ``Σ l_extendedprice·(1−l_discount)`` — one algebraic per-supplier
    reduce (6dp on both sides before shares), then the tiny share² fold."""
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": b["l_suppkey"],
            "__r": b["l_extendedprice"].to_numpy(np.float64)
                   * (1.0 - b["l_discount"].to_numpy(np.float64))})

    tot = hash_aggregate(li.map_batches(rev, batch_format="pandas"),
                         ["l_suppkey"], {"r": ("__r", "sum")},
                         num_partitions=_NP).to_pandas()
    r = np.round(tot["r"].to_numpy(np.float64), 6)
    share = r / r.sum()
    return pd.DataFrame({
        "n_suppliers": np.array([len(r)], dtype=np.int64),
        "hhi": [np.round(float((share * share).sum()) * 10000.0, 6)]})


SQL_HHI_SUPPLIERS = """
    WITH s AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS r
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum(r * r) / (sum(r) * sum(r)) * 10000.0, 6) AS hhi
    FROM s
"""


def _rounded_centroids(sf_dir: str) -> pd.DataFrame:
    """label × dim centroid matrix, 6dp-rounded (the parity anchor both
    the distance and silhouette entries compute from)."""
    from forecastframe_ray.pipelines.similarity import label_centroids

    cents = label_centroids(
        _read(sf_dir, "embeddings", ["label", "embedding"])).to_pandas()
    piv = cents.pivot_table(index="label", columns="dim",
                            values="centroid", aggfunc="sum").sort_index()
    return np.round(piv, 6)


def q_label_centroid_distances(sf_dir: str) -> pd.DataFrame:
    """Pairwise Euclidean distances between the per-label centroid
    vectors (the cluster-geometry dashboard): computed from the
    6dp-ROUNDED centroids the oracled centroid entry pins, so both
    engines fold identical inputs."""
    piv = _rounded_centroids(sf_dir)
    labels = list(piv.index)
    C = piv.to_numpy(np.float64)
    rows = []
    for i, la in enumerate(labels):
        for j in range(i + 1, len(labels)):
            d = float(np.sqrt(((C[i] - C[j]) ** 2).sum()))
            rows.append((la, labels[j], np.round(d, 6)))
    out = pd.DataFrame(rows, columns=["label_a", "label_b", "dist"])
    return out.astype({"label_a": "int64", "label_b": "int64"}) \
        .sort_values(["label_a", "label_b"]).reset_index(drop=True)


SQL_LABEL_CENTROID_DISTANCES = """
    WITH c AS (
        SELECT label, dim, round(avg(x), 6) AS v
        FROM (SELECT label, generate_subscripts(embedding, 1) AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS x
              FROM embeddings)
        GROUP BY 1, 2
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sqrt(sum((a.v - b.v) * (a.v - b.v))), 6) AS dist
    FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
    GROUP BY 1, 2
"""


def q_silhouette_embeddings(sf_dir: str) -> pd.DataFrame:
    """Simplified (centroid-based) silhouette per label: for each vector,
    a = distance to its OWN label centroid, b = min distance to any other
    label's centroid, s = (b − a)/max(a, b); reported as the per-label
    mean. Centroids broadcast once (6dp-rounded parity anchor); the
    per-batch work is one (batch × labels) distance matrix, partial
    (Σs, n) sums pre-reduce before one tiny merge."""
    piv = _rounded_centroids(sf_dir)
    labels = np.array(piv.index)
    C = piv.to_numpy(np.float64)
    lab_pos = {int(l): i for i, l in enumerate(labels)}

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        d = np.sqrt(d2)
        own = np.array([lab_pos[int(l)] for l in b["label"]])
        a = d[np.arange(len(b)), own]
        d_masked = d.copy()
        d_masked[np.arange(len(b)), own] = np.inf
        bb = d_masked.min(axis=1)
        mx = np.maximum(a, bb)
        s = np.where(mx > 0, (bb - a) / mx, 0.0)
        return pd.DataFrame({"label": b["label"], "__s": s,
                             "__one": np.ones(len(b), dtype=np.int64)})

    agg = hash_aggregate(ds.map_batches(partial, batch_format="pandas"),
                         ["label"], {"sum_s": ("__s", "sum"),
                                     "n": ("__one", "sum")},
                         num_partitions=4).to_pandas()
    agg["silhouette"] = np.round(agg["sum_s"].to_numpy(np.float64)
                                 / agg["n"].to_numpy(np.float64), 6)
    agg = agg.astype({"label": "int64", "n": "int64"})
    return agg[["label", "n", "silhouette"]] \
        .sort_values("label").reset_index(drop=True)


SQL_SILHOUETTE_EMBEDDINGS = """
    WITH c AS (
        SELECT label, dim, round(avg(x), 6) AS v
        FROM (SELECT label, generate_subscripts(embedding, 1) AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS x
              FROM embeddings)
        GROUP BY 1, 2
    ),
    e AS (
        SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    d AS (
        SELECT e.vec_id, e.label AS own, c.label AS cl,
               sqrt(sum((e.x - c.v) * (e.x - c.v))) AS dist
        FROM e JOIN c USING (dim)
        GROUP BY 1, 2, 3
    ),
    ab AS (
        SELECT vec_id, own,
               max(CASE WHEN cl = own THEN dist END) AS a,
               min(CASE WHEN cl <> own THEN dist END) AS b
        FROM d GROUP BY 1, 2
    )
    SELECT own AS label, CAST(count(*) AS BIGINT) AS n,
           round(avg(CASE WHEN greatest(a, b) > 0
                          THEN (b - a) / greatest(a, b)
                          ELSE 0.0 END), 6) AS silhouette
    FROM ab GROUP BY 1
"""


# ---------------------------------------------------------------------------
# quantization error / F1 threshold sweep / forward as-of (batch 15)
# ---------------------------------------------------------------------------

def q_quantization_error_embeddings(sf_dir: str) -> pd.DataFrame:
    """Symmetric int8 quantization audit (the embedding-compression
    decision input for ANN at scale): per vector, scale = max|x|/127,
    q = ⌊x/scale + 0.5⌋ (explicit round-half-up on BOTH engines — SQL
    round() is half-away while numpy is banker's, so neither is used),
    reconstruction MSE = mean((x − q·scale)²). Stateless vectorized map;
    all-zero vectors emit zero error."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def qerr(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        scale = np.abs(X).max(axis=1) / 127.0
        s = np.where(scale > 0, scale, 1.0)[:, None]
        q = np.floor(X / s + 0.5)
        mse = ((X - q * s) ** 2).mean(axis=1)
        return pd.DataFrame({
            "vec_id": b["vec_id"],
            "scale": np.round(scale, 6) + 0.0,
            "mse": np.round(mse, 9) + 0.0})

    out = ds.map_batches(qerr, batch_format="pandas").to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


SQL_QUANTIZATION_ERROR = """
    WITH e AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, max(abs(x)) / 127.0 AS scale
        FROM e GROUP BY 1
    ),
    q AS (
        SELECT e.vec_id, s.scale,
               e.x - floor(e.x / (CASE WHEN s.scale > 0
                                       THEN s.scale ELSE 1 END) + 0.5)
                     * (CASE WHEN s.scale > 0 THEN s.scale ELSE 1 END)
                   AS err
        FROM e JOIN s USING (vec_id)
    )
    SELECT vec_id, round(max(scale), 6) + 0.0 AS scale,
           round(avg(err * err), 9) + 0.0 AS mse
    FROM q GROUP BY 1
"""


def q_best_f1_threshold_documents(sf_dir: str) -> pd.DataFrame:
    """Threshold sweep maximizing F1 (the standard classifier-calibration
    fold) — score = n_chars, positive class = lang 'en' (the SCORE is
    deliberately naive; the OPERATOR under test is the distributed sweep).
    Rows reduce to one (score, n_pos, n_neg) row per distinct score; the
    cumulative TP/FP fold over the descending-sorted reduced table finds
    the smallest best threshold (rounded-F1 desc, threshold asc)."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars", "lang"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        pos = (b["lang"] == "en").astype(np.int64)
        return pd.DataFrame({"score": b["n_chars"].astype(np.int64),
                             "__p": pos, "__n": 1 - pos})

    red = hash_aggregate(docs.map_batches(pre, batch_format="pandas"),
                         ["score"], {"n_pos": ("__p", "sum"),
                                     "n_neg": ("__n", "sum")},
                         num_partitions=_NP).to_pandas()
    red = red.sort_values("score", ascending=False).reset_index(drop=True)
    tp = red["n_pos"].cumsum().to_numpy(np.float64)
    fp = red["n_neg"].cumsum().to_numpy(np.float64)
    p_total = float(red["n_pos"].sum())
    fn = p_total - tp
    f1 = np.round(2 * tp / (2 * tp + fp + fn), 6)
    order = np.lexsort((red["score"].to_numpy(), -f1))
    best = order[0]
    return pd.DataFrame({
        "threshold": np.array([red.loc[best, "score"]], dtype=np.int64),
        "f1": [f1[best]],
        "precision": [np.round(tp[best] / (tp[best] + fp[best]), 6)],
        "recall": [np.round(tp[best] / p_total, 6)]})


SQL_BEST_F1_THRESHOLD = """
    WITH s AS (
        SELECT n_chars AS score,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_pos,
               sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS n_neg
        FROM documents GROUP BY 1
    ),
    c AS (
        SELECT score,
               sum(n_pos) OVER (ORDER BY score DESC) AS tp,
               sum(n_neg) OVER (ORDER BY score DESC) AS fp,
               (SELECT sum(n_pos) FROM s) AS p_total
        FROM s
    ),
    f AS (
        SELECT score, tp, fp, p_total,
               round(2.0 * tp / (2.0 * tp + fp + (p_total - tp)), 6)
                   AS f1,
               row_number() OVER (
                   ORDER BY round(2.0 * tp
                                  / (2.0 * tp + fp + (p_total - tp)), 6)
                       DESC, score) AS rn
        FROM c
    )
    SELECT CAST(score AS BIGINT) AS threshold, f1,
           round(tp * 1.0 / (tp + fp), 6) AS precision,
           round(tp * 1.0 / p_total, 6) AS recall
    FROM f WHERE rn = 1
"""


def q_asof_forward_events(sf_dir: str) -> pd.DataFrame:
    """FORWARD as-of join (the existing as-of entry runs backward): each
    'purchase' picks the same user's NEXT 'click' at or after it —
    stages/join.asof_join(direction='forward'). No-match purchases emit
    the 9999-12-31 / NULLF sentinels. ((user_id, ts) is unique, so the
    nearest-forward row is total-ordered on both engines.)"""
    from forecastframe_ray.stages.join import asof_join

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "ts", "value"])
    left = ev.map_batches(
        lambda b: b[b["event_type"] == "purchase"]
        [["event_id", "user_id", "ts", "value"]],
        batch_format="pandas")
    right = ev.map_batches(
        lambda b: b[b["event_type"] == "click"]
        [["user_id", "ts", "value"]].rename(
            columns={"ts": "click_ts", "value": "click_value"}),
        batch_format="pandas")
    out = asof_join(left, right, on=["user_id"], left_ts="ts",
                    right_ts="click_ts", direction="forward",
                    num_partitions=_NP).to_pandas()
    out["click_ts"] = out["click_ts"].fillna(pd.Timestamp("9999-12-31"))
    out["click_value"] = out["click_value"].fillna(NULLF)
    out = out.astype({"event_id": "int64", "user_id": "int64"})
    out = out[["event_id", "user_id", "ts", "value", "click_ts",
               "click_value"]]
    return out.sort_values("event_id").reset_index(drop=True)


SQL_ASOF_FORWARD = f"""
    WITH p AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS click_ts, value AS click_value FROM events
        WHERE event_type = 'click'
    ),
    m AS (
        SELECT p.event_id, min(c.click_ts) AS nts
        FROM p JOIN c ON c.user_id = p.user_id AND c.click_ts >= p.ts
        GROUP BY 1
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           COALESCE(cv.click_ts, TIMESTAMP '9999-12-31') AS click_ts,
           COALESCE(cv.click_value, {NULLF}) AS click_value
    FROM p
    LEFT JOIN m USING (event_id)
    LEFT JOIN c cv ON cv.user_id = p.user_id AND cv.click_ts = m.nts
"""


# ---------------------------------------------------------------------------
# watermark late-arrival scan / weighted median (batch 16)
# ---------------------------------------------------------------------------

def q_late_events_watermark(sf_dir: str) -> pd.DataFrame:
    """Streaming late-arrival audit: reading events in ARRIVAL order
    (event_id), the watermark is the running max event time seen so far;
    an event is late when it lands > 1 hour behind the watermark. The
    classic distributed PREFIX-SCAN shape: arrival-range partitions each
    compute a local running max, the P per-partition maxima fold on the
    driver into exclusive prefix offsets (P numbers — tiny), and a second
    vectorized pass applies them. Summarized per event_type (count +
    late count + max lateness seconds)."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "ts"])
    n_total = int(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)
    P = _NP

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__arr"] = (b["event_id"].to_numpy(np.int64) * P
                       // max(n_total, 1)).clip(0, P - 1)
        return b

    from forecastframe_ray.stages.agg import keyed_map_partitions

    def local_max(part: pd.DataFrame) -> pd.DataFrame:
        # a hash partition may hold several arrival-range keys
        out = part.groupby("__arr", sort=False)["ts"].max().reset_index()
        return out.rename(columns={"ts": "mx"})

    parts = keyed_map_partitions(
        _read(sf_dir, "events", ["event_id", "ts"])
        .map_batches(assign, batch_format="pandas"),
        ["__arr"], local_max, num_partitions=P).to_pandas() \
        .sort_values("__arr")
    # exclusive prefix max per partition (driver fold over P rows)
    pmax = {}
    run = pd.Timestamp.min
    for _, r in parts.iterrows():
        pmax[int(r["__arr"])] = run
        run = max(run, r["mx"])

    def flag(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        # a hash partition may hold several arrival-range keys — each has
        # its own exclusive-prefix watermark
        for p, g in part.groupby("__arr", sort=False):
            g = g.sort_values("event_id")
            ts = g["ts"]
            wm = np.maximum.accumulate(
                ts.astype("datetime64[us]").astype("int64").to_numpy())
            prefix = pmax.get(int(p), pd.Timestamp.min)
            if prefix > pd.Timestamp.min:
                wm = np.maximum(wm, np.int64(prefix.value // 1000))
            late_s = (wm - ts.astype("datetime64[us]").astype("int64")
                      .to_numpy()) / 1e6
            outs.append(pd.DataFrame({
                "event_type": g["event_type"],
                "__late": (late_s > 3600.0).astype(np.int64),
                "__lat_s": late_s,
                "__one": np.ones(len(g), dtype=np.int64)}))
        return pd.concat(outs, ignore_index=True)

    out = hash_aggregate(
        keyed_map_partitions(
            ev.map_batches(assign, batch_format="pandas"),
            ["__arr"], flag, num_partitions=P),
        ["event_type"],
        {"n": ("__one", "sum"), "n_late": ("__late", "sum"),
         "max_late_s": ("__lat_s", "max")},
        num_partitions=4).to_pandas()
    out = out.astype({"n": "int64", "n_late": "int64"})
    out = _round(out, ["max_late_s"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_LATE_EVENTS_WATERMARK = """
    WITH w AS (
        SELECT event_type, ts,
               max(ts) OVER (ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS wm
        FROM events
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN epoch_us(wm) - epoch_us(ts) > 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           round(max((epoch_us(wm) - epoch_us(ts)) / 1e6), 6)
               AS max_late_s
    FROM w GROUP BY 1
"""


def q_weighted_median_events(sf_dir: str) -> pd.DataFrame:
    """Weighted median (lower weighted median — the smallest value whose
    cumulative weight reaches half the total) of event value per type,
    weighted by the JSON ``k`` volume field. Rows reduce to one
    (type, value, Σweight) row per distinct value first; the cumulative
    fold runs over that reduced table."""
    from forecastframe_ray.functions.scalar import extract_json_int

    ev = _read(sf_dir, "events", ["event_type", "value", "props"])
    ext = extract_json_int(ev, "props", "k")

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"],
                             "value": b["value"],
                             "__w": b["k"].astype("float64")})

    red = hash_aggregate(ext.map_batches(pre, batch_format="pandas"),
                         ["event_type", "value"], {"w": ("__w", "sum")},
                         num_partitions=_NP).to_pandas()
    rows = []
    for et, g in red.groupby("event_type", sort=True):
        g = g.sort_values("value")
        w = g["w"].to_numpy(np.float64)
        half = w.sum() / 2.0
        ix = int(np.searchsorted(np.cumsum(w), half))
        rows.append((et, int(w.sum()),
                     np.round(float(g["value"].iloc[ix]), 6)))
    out = pd.DataFrame(rows, columns=["event_type", "total_w",
                                      "w_median"])
    out["total_w"] = out["total_w"].astype("int64")
    return out.reset_index(drop=True)


SQL_WEIGHTED_MEDIAN = """
    WITH e AS (
        SELECT event_type, value,
               sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS w
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, value,
               sum(w) OVER (PARTITION BY event_type ORDER BY value) AS cw,
               sum(w) OVER (PARTITION BY event_type) AS tw
        FROM e
    )
    SELECT event_type, CAST(max(tw) AS BIGINT) AS total_w,
           round(min(CASE WHEN cw >= tw / 2.0 THEN value END), 6)
               AS w_median
    FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# calendar heatmap / embedding covariance (batch 17)
# ---------------------------------------------------------------------------

def q_hour_dow_heatmap_events(sf_dir: str) -> pd.DataFrame:
    """Hour-of-day × ISO-weekday activity heatmap (count + mean value per
    cell) — the classic traffic-pattern matrix, one narrow two-key
    reduce."""
    ev = _read(sf_dir, "events", ["ts", "value"])

    def cell(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dow": (b["ts"].dt.dayofweek + 1).astype(np.int64),
            "hour": b["ts"].dt.hour.astype(np.int64),
            "__v": b["value"].to_numpy(np.float64),
            "__one": np.ones(len(b), dtype=np.int64)})

    out = hash_aggregate(ev.map_batches(cell, batch_format="pandas"),
                         ["dow", "hour"],
                         {"n": ("__one", "sum"), "sum_v": ("__v", "sum")},
                         num_partitions=4).to_pandas()
    out["mean_v"] = np.round(out["sum_v"].to_numpy(np.float64)
                             / out["n"].to_numpy(np.float64), 6)
    out = out.astype({"dow": "int64", "hour": "int64", "n": "int64"})
    out = _round(out, ["sum_v"], 6)
    return out[["dow", "hour", "n", "sum_v", "mean_v"]] \
        .sort_values(["dow", "hour"]).reset_index(drop=True)


SQL_HOUR_DOW_HEATMAP = """
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 6) AS sum_v,
           round(sum(value) / count(*), 6) AS mean_v
    FROM events GROUP BY 1, 2
"""


def q_covariance_embeddings(sf_dir: str) -> pd.DataFrame:
    """Sample covariance matrix of the embedding dimensions (the PCA /
    whitening input) via the one-pass distributed moment plan: each batch
    contributes (n, Σx, XᵀX) partials, one tiny driver fold finishes
    ``cov = (XᵀX − n·x̄x̄ᵀ)/(n−1)``. Emitted as the upper triangle in
    long form. PARITY NOTE: entries are 6dp-rounded; the oracle is
    DuckDB's covar_samp over the unnested dim pairs."""
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        d = X.shape[1]
        xtx = X.T @ X
        iu = np.triu_indices(d)
        return pd.DataFrame({
            "da": iu[0].astype(np.int64), "db": iu[1].astype(np.int64),
            "xtx": xtx[iu],
            "sa": X.sum(axis=0)[iu[0]], "sb": X.sum(axis=0)[iu[1]],
            "n": np.full(len(iu[0]), len(b), dtype=np.int64)})

    agg = hash_aggregate(ds.map_batches(partial, batch_format="pandas"),
                         ["da", "db"],
                         {"xtx": ("xtx", "sum"), "sa": ("sa", "sum"),
                          "sb": ("sb", "sum"), "n": ("n", "sum")},
                         num_partitions=_NP).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    cov = (agg["xtx"].to_numpy(np.float64)
           - agg["sa"].to_numpy(np.float64)
           * agg["sb"].to_numpy(np.float64) / n) / (n - 1.0)
    out = pd.DataFrame({
        "dim_a": agg["da"].astype("int64") + 1,   # 1-based like the oracle
        "dim_b": agg["db"].astype("int64") + 1,
        "cov": np.round(cov, 6) + 0.0})
    return out.sort_values(["dim_a", "dim_b"]).reset_index(drop=True)


SQL_COVARIANCE_EMBEDDINGS = """
    WITH e AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    )
    SELECT a.dim AS dim_a, b.dim AS dim_b,
           round(covar_samp(a.x, b.x), 6) + 0.0 AS cov
    FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# debounce / point-in-time state (batch 18)
# ---------------------------------------------------------------------------

def q_debounce_events(sf_dir: str) -> pd.DataFrame:
    """Burst compaction (debounce): per (user, type) stream, events
    within 5 minutes of their predecessor chain into one burst
    (gaps-and-islands on the inter-event gap), and only each burst's
    FIRST event survives — the standard duplicate-click/retry suppressor.
    Summarized per user: events in, bursts kept, compaction ratio."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    GAP_US = 5 * 60 * 1_000_000

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in part.groupby("user_id", sort=False):
            n_in = len(g)
            kept = 0
            for _, s in g.groupby("event_type", sort=False):
                t = np.sort(s["ts"].astype("datetime64[us]")
                            .astype("int64").to_numpy())
                kept += int(1 + (np.diff(t) > GAP_US).sum())
            rows.append((uid, n_in, kept,
                         np.round(kept / n_in, 6)))
        return pd.DataFrame(rows, columns=["user_id", "n_events",
                                           "n_kept", "keep_ratio"])

    out = keyed_map_partitions(ev, ["user_id"], kernel,
                               num_partitions=_NP).to_pandas()
    out = out.astype({"user_id": "int64", "n_events": "int64",
                      "n_kept": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)


SQL_DEBOUNCE_EVENTS = """
    WITH l AS (
        SELECT user_id, event_type, ts,
               LAG(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts) AS pt
        FROM events
    ),
    k AS (
        SELECT user_id,
               CASE WHEN pt IS NULL
                         OR epoch_us(ts) - epoch_us(pt) > 300000000
                    THEN 1 ELSE 0 END AS is_first
        FROM l
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_first) AS BIGINT) AS n_kept,
           round(sum(is_first) * 1.0 / count(*), 6) AS keep_ratio
    FROM k GROUP BY 1
"""


def q_point_in_time_user_state(sf_dir: str) -> pd.DataFrame:
    """Point-in-time dimension lookup (the SCD2 entry's 'AS OF T' query):
    at the stream's integer-epoch-us midpoint, each user's then-active
    event_type — the latest event at or before T ((user_id, ts) unique ⇒
    deterministic). Users with no activity by T are absent. One keyed
    arg-max reduce."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    span = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    ss = span["ts"].to_pandas().astype("datetime64[us]").astype("int64")
    cut = pd.Timestamp((int(ss.min()) + int(ss.max())) // 2, unit="us")

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["ts"] <= cut]

    from forecastframe_ray.stages.agg import keyed_map_partitions

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        idx = part.groupby("user_id", sort=False)["ts"].idxmax()
        sub = part.loc[idx]
        return pd.DataFrame({"user_id": sub["user_id"],
                             "state_type": sub["event_type"],
                             "state_ts": sub["ts"]})

    out = keyed_map_partitions(
        ev.map_batches(pre, batch_format="pandas"),
        ["user_id"], kernel, num_partitions=_NP).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


SQL_POINT_IN_TIME_STATE = """
    WITH cut AS (
        SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2)
            AS c FROM events
    )
    SELECT user_id,
           arg_max(event_type, ts) AS state_type,
           max(ts) AS state_ts
    FROM events CROSS JOIN cut
    WHERE ts <= cut.c
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# corpus checksum / column profile (batch 19)
# ---------------------------------------------------------------------------

def q_corpus_checksum_documents(sf_dir: str) -> pd.DataFrame:
    """Order-insensitive corpus checksum (the integrity stamp a resume /
    replication check compares): per-row 60-bit md5 prefix of the text,
    summed mod 2⁶¹−1 — commutative, so any partitioning/arrival order
    yields the same stamp. Per-batch partial sums keep the shuffle at one
    int per block."""
    import hashlib

    MOD = (1 << 61) - 1
    docs = _read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = 0
        for t in b["text"].fillna(""):
            s = (s + int(hashlib.md5(t.encode()).hexdigest()[:15], 16)) \
                % MOD
        return pd.DataFrame({"part_sum": np.array([s], dtype=np.int64),
                             "n": np.array([len(b)], dtype=np.int64)})

    # fold the tiny per-block partials with PYTHON ints on the driver —
    # partials approach 2^61, so an int64 aggregate sum would overflow
    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    total = sum(int(x) for x in parts["part_sum"]) % MOD
    return pd.DataFrame({
        "n_docs": np.array([int(parts["n"].sum())], dtype=np.int64),
        "checksum": np.array([total], dtype=np.int64)})


SQL_CORPUS_CHECKSUM = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(CAST(('0x' || substr(md5(text), 1, 15))
                              AS BIGINT) AS HUGEINT))
                % 2305843009213693951 AS BIGINT) AS checksum
    FROM documents
"""


def q_profile_orders(sf_dir: str) -> pd.DataFrame:
    """Generic column profiler over orders (the data-quality first-look):
    per column — row count, null count, distinct count, min and max
    rendered as text. Distinct counts reduce per column via the narrow
    per-(column, value-digest) plan; min/max are algebraic."""
    orders = _read(sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]

    def render(v) -> str:
        if isinstance(v, float):
            return f"{v:.2f}"
        if isinstance(v, pd.Timestamp):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        return str(v)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # TYPED per-batch min/max per column (string-rendered extremes
        # would aggregate lexicographically — "1000" < "999")
        row = {"__k": 0, "n": len(b)}
        for c in cols:
            row[f"null_{c}"] = int(b[c].isna().sum())
            row[f"mn_{c}"] = b[c].min()
            row[f"mx_{c}"] = b[c].max()
        return pd.DataFrame([row])

    aggs = {"n": ("n", "sum")}
    for c in cols:
        aggs[f"null_{c}"] = (f"null_{c}", "sum")
        aggs[f"mn_{c}"] = (f"mn_{c}", "min")
        aggs[f"mx_{c}"] = (f"mx_{c}", "max")
    onerow = hash_aggregate(
        orders.map_batches(partial, batch_format="pandas"),
        ["__k"], aggs, num_partitions=2).to_pandas().iloc[0]
    base = pd.DataFrame(
        [(c, int(onerow["n"]), int(onerow[f"null_{c}"]),
          render(onerow[f"mn_{c}"]), render(onerow[f"mx_{c}"]))
         for c in cols],
        columns=["col", "n", "n_null", "mn", "mx"])

    def dvals(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for c in cols:
            outs.append(pd.DataFrame({
                "col": c, "val": b[c].astype(str)}))
        return pd.concat(outs, ignore_index=True)

    dv = hash_aggregate(
        hash_aggregate(orders.map_batches(dvals, batch_format="pandas"),
                       ["col", "val"], {"__n": ("val", "size")},
                       num_partitions=_NP),
        ["col"], {"n_distinct": ("val", "size")},
        num_partitions=4).to_pandas()
    out = base.merge(dv, on="col")
    out = out.astype({"n": "int64", "n_null": "int64",
                      "n_distinct": "int64"})
    return out[["col", "n", "n_null", "n_distinct", "mn", "mx"]] \
        .sort_values("col").reset_index(drop=True)


SQL_PROFILE_ORDERS = """
    SELECT * FROM (
      SELECT 'o_orderkey' AS col, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
             CAST(min(o_orderkey) AS VARCHAR) AS mn,
             CAST(max(o_orderkey) AS VARCHAR) AS mx
      FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_custkey) AS BIGINT),
             CAST(min(o_custkey) AS VARCHAR),
             CAST(max(o_custkey) AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_orderstatus) AS BIGINT),
             min(o_orderstatus), max(o_orderstatus) FROM orders
      UNION ALL
      SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_totalprice) AS BIGINT),
             printf('%.2f', min(o_totalprice)),
             printf('%.2f', max(o_totalprice)) FROM orders
      UNION ALL
      SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_orderdate) AS BIGINT),
             strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
             strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders
      UNION ALL
      SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT),
             min(o_orderpriority), max(o_orderpriority) FROM orders
    ) ORDER BY col
"""


# ---------------------------------------------------------------------------
# Grubbs outlier / order reconciliation / bounce rate (batch 20)
# ---------------------------------------------------------------------------

def q_grubbs_daily_events(sf_dir: str) -> pd.DataFrame:
    """Grubbs single-outlier statistic (Grubbs 1950 — public) per daily
    series: ``G = max|v − mean| / sd`` (ddof=1), with the offending day.
    One keyed kernel; constant series (sd = 0) emit NULLF. Ties on
    |v − mean| break to the earliest day on both engines."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            v = g["v"].to_numpy(np.float64)
            sd = float(v.std(ddof=1)) if len(v) > 1 else 0.0
            dev = np.round(np.abs(v - v.mean()), 6)
            ix = int(np.argmax(dev))  # first max = earliest day
            gstat = np.round(dev[ix] / sd, 6) if sd > 0 else NULLF
            rows.append((et, len(v), g["d"].iloc[ix], gstat))
        return pd.DataFrame(rows, columns=["event_type", "n",
                                           "outlier_d", "g_stat"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_GRUBBS_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    s AS (
        SELECT event_type, count(*) AS n, avg(v) AS m,
               stddev_samp(v) AS sd
        FROM daily GROUP BY 1
    ),
    d AS (
        SELECT daily.event_type, daily.d,
               round(abs(daily.v - s.m), 6) AS dev, s.n, s.sd
        FROM daily JOIN s USING (event_type)
    ),
    r AS (
        SELECT event_type, d, dev, n, sd,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY dev DESC, d) AS rn
        FROM d
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, d AS outlier_d,
           CASE WHEN sd > 0 THEN round(dev / sd, 6)
                ELSE {NULLF} END AS g_stat
    FROM r WHERE rn = 1
"""


def q_reconciliation_orders_lineitem(sf_dir: str) -> pd.DataFrame:
    """Cross-table reconciliation (the warehouse trust check): each
    order's header ``o_totalprice`` against its lineitems' gross
    ``Σ extendedprice·(1−discount)·(1+tax)`` — coverage counts plus the
    mean/median header-to-detail ratio. The detail side pre-reduces per
    order (narrow), the header side hash-joins in; ratio stats fold over
    the per-order table."""
    from forecastframe_ray.stages.join import hash_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])

    def gross(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b["l_orderkey"],
            "__g": b["l_extendedprice"].to_numpy(np.float64)
                   * (1.0 - b["l_discount"].to_numpy(np.float64))
                   * (1.0 + b["l_tax"].to_numpy(np.float64))})

    from forecastframe_ray.stages.join import consolidate_for_join

    # the detail side is a coarse-shuffle output — consolidate before the
    # join exchange (empty column-less blocks stall/break Dataset.join)
    detail = consolidate_for_join(
        hash_aggregate(li.map_batches(gross, batch_format="pandas"),
                       ["o_orderkey"], {"g": ("__g", "sum")},
                       num_partitions=_NP), 8)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    joined = hash_join(consolidate_for_join(orders, 8), detail,
                       on=["o_orderkey"], num_partitions=8).to_pandas()
    ratio = np.round(joined["o_totalprice"].to_numpy(np.float64)
                     / np.round(joined["g"].to_numpy(np.float64), 6), 6)
    n_orders = int(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    return pd.DataFrame({
        "n_orders": np.array([n_orders], dtype=np.int64),
        "n_with_lines": np.array([len(joined)], dtype=np.int64),
        "mean_ratio": [np.round(float(ratio.mean()), 6)],
        "p50_ratio": [np.round(float(np.percentile(ratio, 50)), 6)]})


SQL_RECONCILIATION = """
    WITH d AS (
        SELECT l_orderkey AS o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)
                         * (1 + l_tax)), 6) AS g
        FROM lineitem GROUP BY 1
    ),
    j AS (
        SELECT round(o_totalprice / g, 6) AS ratio
        FROM orders JOIN d USING (o_orderkey)
    )
    SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_with_lines,
           round(avg(ratio), 6) AS mean_ratio,
           round(quantile_cont(ratio, 0.5), 6) AS p50_ratio
    FROM j
"""


def q_bounce_rate_daily(sf_dir: str) -> pd.DataFrame:
    """Bounce rate per day (classic web analytics): share of sessions
    starting that day with exactly ONE event. Sessions come from the
    fused keyed sessionize stage (30-min gap); the per-session reduce and
    the daily fold are both narrow."""
    sess = _sessionized_events(sf_dir)
    per = hash_aggregate(sess, ["user_id", "session_id"],
                         {"n_events": ("event_id", "count"),
                          "start_ts": ("ts", "min")},
                         num_partitions=_NP)

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "d": b["start_ts"].dt.floor("D"),
            "__b": (b["n_events"] == 1).astype(np.int64),
            "__one": np.ones(len(b), dtype=np.int64)})

    out = hash_aggregate(per.map_batches(day_fn, batch_format="pandas"),
                         ["d"], {"n_sessions": ("__one", "sum"),
                                 "n_bounce": ("__b", "sum")},
                         num_partitions=4).to_pandas()
    out["bounce_rate"] = np.round(
        out["n_bounce"].to_numpy(np.float64)
        / out["n_sessions"].to_numpy(np.float64), 6)
    out = out.astype({"n_sessions": "int64", "n_bounce": "int64"})
    return out[["d", "n_sessions", "n_bounce", "bounce_rate"]] \
        .sort_values("d").reset_index(drop=True)


SQL_BOUNCE_RATE_DAILY = f"""
    WITH b AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w
                            > INTERVAL {_SESSION_GAP_S} SECOND
                    THEN 1 ELSE 0 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id
        FROM b
    ),
    per AS (
        SELECT user_id, session_id, count(*) AS n_events,
               date_trunc('day', min(ts)) AS d
        FROM s GROUP BY 1, 2
    )
    SELECT d, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS bounce_rate
    FROM per GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Naive2 forecast / KMV set operations (batch 21)
# ---------------------------------------------------------------------------

def q_naive2_forecast_daily(sf_dir: str) -> pd.DataFrame:
    """Naive2 forecast (the M-competition deseasonalized-naive benchmark)
    per daily series — EXACT oracle, no degenerate gate: multiplicative
    ROW-seasonal indices (slot mean / grand mean, zero slots → 1), last
    deseasonalized value re-seasonalized 7 days ahead. Drives the 12th
    registered estimator end-to-end (keyed fit, state broadcast,
    future-grid scorer)."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", estimator="naive2", period=7)
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    return df.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_NAIVE2_FORECAST = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    gm AS (
        SELECT event_type, avg(v) AS g, count(*) AS n,
               max(d) AS d_last, arg_max(v, rn) AS y_last
        FROM r GROUP BY 1
    ),
    seas AS (
        SELECT r.event_type, (rn - 1) % 7 AS six,
               CASE WHEN gm.g = 0 OR avg(r.v) / gm.g = 0 THEN 1.0
                    ELSE avg(r.v) / gm.g END AS s
        FROM r JOIN gm USING (event_type)
        GROUP BY 1, 2, gm.g
    ),
    f AS (
        SELECT gm.*, fd.d, datediff('day', gm.d_last, fd.d) AS h
        FROM gm CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    )
    SELECT f.event_type, f.d,
           round(f.y_last / sl.s * COALESCE(sf2.s, 1.0), 6) AS predicted_v
    FROM f
    JOIN seas sl ON sl.event_type = f.event_type
                AND sl.six = (f.n - 1) % 7
    LEFT JOIN seas sf2 ON sf2.event_type = f.event_type
                      AND sf2.six = (f.n - 1 + f.h) % 7
"""


def q_kmv_set_ops_gate(sf_dir: str) -> pd.DataFrame:
    """KMV set operations (Beyer et al. 2007 — public): distinct 'click'
    and 'view' user sets as KMV sketches; union by sketch merge,
    intersection by inclusion–exclusion. In the k=4096 EXACT regime every
    number is value-oracled against COUNT(DISTINCT); a k=64 estimated
    union must land within 30% (≈2.4σ) — the gate bit."""
    from forecastframe_ray.stages.sketch import (distinct_sketch,
                                                 kmv_estimate, kmv_merge,
                                                 kmv_from_bytes)

    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def only(types):
        return ev.map_batches(
            lambda b, t=types: b[b["event_type"].isin(t)],
            batch_format="pandas")

    def sk(types, k):
        df = distinct_sketch(only(types), ["event_type"], "user_id",
                             k=k, num_partitions=4).to_pandas()
        mats = [kmv_from_bytes(x) for x in df["kmv"]]
        return kmv_merge(mats, k) if mats else np.array([], dtype=np.uint64)

    a = sk(["click"], 4096)
    b = sk(["view"], 4096)
    assert len(a) < 4096 and len(b) < 4096  # exact regime
    union = kmv_merge([a, b], 4096)
    n_a, n_b = len(a), len(b)
    n_union = len(union)
    n_inter = n_a + n_b - n_union
    est_union = kmv_estimate(kmv_merge([sk(["click"], 64),
                                        sk(["view"], 64)], 64), 64)
    ok = abs(est_union - n_union) / n_union <= 0.30
    return pd.DataFrame({
        "n_click_users": np.array([n_a], dtype=np.int64),
        "n_view_users": np.array([n_b], dtype=np.int64),
        "n_union": np.array([n_union], dtype=np.int64),
        "n_intersect": np.array([n_inter], dtype=np.int64),
        "est_ok": [bool(ok)]})


SQL_KMV_SET_OPS_GATE = """
    SELECT CAST(count(DISTINCT CASE WHEN event_type = 'click'
                                    THEN user_id END) AS BIGINT)
               AS n_click_users,
           CAST(count(DISTINCT CASE WHEN event_type = 'view'
                                    THEN user_id END) AS BIGINT)
               AS n_view_users,
           CAST(count(DISTINCT CASE WHEN event_type IN ('click', 'view')
                                    THEN user_id END) AS BIGINT)
               AS n_union,
           CAST(count(DISTINCT CASE WHEN event_type = 'click'
                                    THEN user_id END)
                + count(DISTINCT CASE WHEN event_type = 'view'
                                      THEN user_id END)
                - count(DISTINCT CASE WHEN event_type IN ('click', 'view')
                                      THEN user_id END) AS BIGINT)
               AS n_intersect,
           true AS est_ok
    FROM events
"""


# ---------------------------------------------------------------------------
# forecast combination / L-moments / expected shortfall (batch 22)
# ---------------------------------------------------------------------------

def q_combo_forecast_daily(sf_dir: str) -> pd.DataFrame:
    """Forecast combination (Bates & Granger 1969 — public; the 'simple
    average beats the components' classic): the equal-weight mean of the
    three exactly-SQL-reproducible baselines — naive (SES α=1),
    seasonal-naive (ROW lag 7) and drift — per series over the 7-day
    future grid. Every component drives its registered estimator
    end-to-end; the oracle recomputes all three closed forms."""
    fr = _daily_frame(sf_dir)
    parts = []
    for est, kw in (("ses", {"alpha": 1.0}),
                    ("seasonal_naive", {"period": 7}),
                    ("drift", {})):
        p = fr.predict(periods=7, freq="D", estimator=est, **kw) \
            .to_pandas()[["event_type", "d", "predicted_v"]] \
            .rename(columns={"predicted_v": est})
        parts.append(p.set_index(["event_type", "d"]))
    out = pd.concat(parts, axis=1).reset_index()
    out["combo_v"] = np.round(
        (out["ses"] + out["seasonal_naive"] + out["drift"]) / 3.0, 6)
    out = out[["event_type", "d", "combo_v"]]
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_COMBO_FORECAST = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    s AS (
        SELECT event_type, max(n) AS n, max(d) AS d_last,
               arg_max(v, rn) AS y_last,
               arg_min(v, rn) AS y_first
        FROM r GROUP BY 1
    ),
    f AS (
        SELECT s.*, fd.d, datediff('day', s.d_last, fd.d) AS h
        FROM s CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    ),
    sn AS (  -- seasonal-naive: value at row n - 7 + ((h-1) mod 7) + 1
        SELECT f.event_type, f.d,
               r.v AS snv
        FROM f JOIN r ON r.event_type = f.event_type
                     AND r.rn = f.n - 7 + ((f.h - 1) % 7) + 1
    )
    SELECT f.event_type, f.d,
           round((f.y_last
                  + sn.snv
                  + (f.y_last + f.h * (f.y_last - f.y_first)
                               / (f.n - 1))) / 3.0, 6) AS combo_v
    FROM f JOIN sn ON sn.event_type = f.event_type AND sn.d = f.d
"""


def q_lmoments_events(sf_dir: str) -> pd.DataFrame:
    """First three L-moments per event type (Hosking 1990 — public; the
    robust distribution-shape family): λ₁ = mean, λ₂ (L-scale) and
    τ₃ = λ₃/λ₂ (L-skewness) from the probability-weighted moments
    ``b_r = Σ C(i−1, r) x_(i) / (n·C(n−1, r))``. One keyed kernel per
    type (sorted vector + rank weights); the oracle mirrors the rank
    arithmetic with row_number."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            x = np.sort(g["value"].to_numpy(np.float64))
            n = len(x)
            i = np.arange(1, n + 1, dtype=np.float64)
            b0 = x.mean()
            b1 = ((i - 1) * x).sum() / (n * (n - 1.0))
            b2 = ((i - 1) * (i - 2) * x).sum() \
                / (n * (n - 1.0) * (n - 2.0))
            l1 = b0
            l2 = 2 * b1 - b0
            l3 = 6 * b2 - 6 * b1 + b0
            rows.append((et, n, np.round(l1, 6), np.round(l2, 6),
                         np.round(l3 / l2, 6) if l2 != 0 else NULLF))
        return pd.DataFrame(rows, columns=["event_type", "n", "l1", "l2",
                                           "tau3"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_LMOMENTS = f"""
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_type) AS i,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    b AS (
        SELECT event_type, max(n) AS n,
               avg(value) AS b0,
               sum((i - 1) * value) / (max(n) * (max(n) - 1.0)) AS b1,
               sum((i - 1) * (i - 2) * value)
                   / (max(n) * (max(n) - 1.0) * (max(n) - 2.0)) AS b2
        FROM r GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(b0, 6) AS l1,
           round(2 * b1 - b0, 6) AS l2,
           CASE WHEN 2 * b1 - b0 <> 0
                THEN round((6 * b2 - 6 * b1 + b0) / (2 * b1 - b0), 6)
                ELSE {NULLF} END AS tau3
    FROM b
"""


def q_expected_shortfall_events(sf_dir: str) -> pd.DataFrame:
    """Expected shortfall / CVaR (public risk convention): per event
    type, the mean of values STRICTLY ABOVE the 6dp-rounded p95
    (``quantile_cont``) — the tail-severity number next to the p99 the
    percentile entry pins. Empty tails emit NULLF."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["value"].to_numpy(np.float64)
            thr = np.round(np.percentile(v, 95), 6)
            tail = v[v > thr]
            es = np.round(float(tail.mean()), 6) if len(tail) else NULLF
            rows.append((et, len(v), thr, len(tail), es))
        return pd.DataFrame(rows, columns=["event_type", "n", "p95",
                                           "n_tail", "es95"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = out.astype({"n": "int64", "n_tail": "int64"})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_EXPECTED_SHORTFALL = f"""
    WITH q AS (
        SELECT event_type, count(*) AS n,
               round(quantile_cont(value, 0.95), 6) AS p95
        FROM events GROUP BY 1
    )
    SELECT q.event_type, CAST(q.n AS BIGINT) AS n, q.p95,
           CAST(count(e.value) AS BIGINT) AS n_tail,
           COALESCE(round(avg(e.value), 6), {NULLF}) AS es95
    FROM q LEFT JOIN events e
        ON e.event_type = q.event_type AND e.value > q.p95
    GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Winkler interval score / Theil U / PSI drift (batch 23)
# ---------------------------------------------------------------------------

def q_winkler_interval_daily(sf_dir: str) -> pd.DataFrame:
    """Winkler interval score (Winkler 1972 — public; the standard
    interval-forecast evaluation): per series, the naive interval
    ``lag1 ± 1.96·σ`` (σ = ddof=1 std of ALL lag-1 residuals — the
    in-sample evaluation convention, documented) scored at α=0.05:
    ``W = (u−l) + (2/α)·(l−y)⁺ + (2/α)·(y−u)⁺``, plus empirical
    coverage. Completes the metrics family with an INTERVAL metric next
    to the point metrics. Interval bounds are 6dp-rounded on both
    engines before scoring."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    Z, A = 1.96, 0.05

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            v = g["v"].to_numpy(np.float64)
            res = np.diff(v)
            if len(res) < 2:
                continue
            sd = float(res.std(ddof=1))
            lo = np.round(v[:-1] - Z * sd, 6)
            hi = np.round(v[:-1] + Z * sd, 6)
            y = v[1:]
            w = (hi - lo) \
                + (2.0 / A) * np.maximum(lo - y, 0.0) \
                + (2.0 / A) * np.maximum(y - hi, 0.0)
            rows.append((et, len(y),
                         np.round(float(w.mean()), 6),
                         np.round(float(((y >= lo) & (y <= hi)).mean()),
                                  6)))
        return pd.DataFrame(rows, columns=["event_type", "n",
                                           "mean_winkler", "coverage"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_WINKLER_INTERVAL = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS p
        FROM daily
    ),
    s AS (
        SELECT event_type, stddev_samp(v - p) AS sd
        FROM l WHERE p IS NOT NULL GROUP BY 1
    ),
    b AS (
        SELECT l.event_type, l.v AS y,
               round(l.p - 1.96 * s.sd, 6) AS lo,
               round(l.p + 1.96 * s.sd, 6) AS hi
        FROM l JOIN s USING (event_type) WHERE l.p IS NOT NULL
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(avg((hi - lo)
                     + 40.0 * greatest(lo - y, 0)
                     + 40.0 * greatest(y - hi, 0)), 6) AS mean_winkler,
           round(avg(CASE WHEN y >= lo AND y <= hi
                          THEN 1.0 ELSE 0.0 END), 6) AS coverage
    FROM b GROUP BY 1
"""


def q_theil_u_daily(sf_dir: str) -> pd.DataFrame:
    """Theil's U (M-competition convention — public): the seasonal-naive
    (ROW lag 7) RMSE over the naive (lag 1) RMSE per series, on the rows
    where BOTH forecasts exist — < 1 means the weekly pattern beats
    persistence."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            v = g["v"].to_numpy(np.float64)
            if len(v) < 8:
                continue
            y = v[7:]
            e_sn = y - v[:-7]
            e_n = y - v[6:-1]
            rmse_sn = float(np.sqrt((e_sn ** 2).mean()))
            rmse_n = float(np.sqrt((e_n ** 2).mean()))
            u = np.round(rmse_sn / rmse_n, 6) if rmse_n > 0 else NULLF
            rows.append((et, len(y), np.round(rmse_sn, 6),
                         np.round(rmse_n, 6), u))
        return pd.DataFrame(rows, columns=["event_type", "n", "rmse_sn7",
                                           "rmse_naive", "theil_u"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_THEIL_U = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, v,
               LAG(v, 1) OVER w AS p1, LAG(v, 7) OVER w AS p7
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    e AS (SELECT * FROM l WHERE p7 IS NOT NULL)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sqrt(avg((v - p7) * (v - p7))), 6) AS rmse_sn7,
           round(sqrt(avg((v - p1) * (v - p1))), 6) AS rmse_naive,
           CASE WHEN sqrt(avg((v - p1) * (v - p1))) > 0
                THEN round(sqrt(avg((v - p7) * (v - p7)))
                           / sqrt(avg((v - p1) * (v - p1))), 6)
                ELSE {NULLF} END AS theil_u
    FROM e GROUP BY 1
"""


def q_psi_orders_priority(sf_dir: str) -> pd.DataFrame:
    """Population Stability Index (public credit-scoring / ML-monitoring
    convention): the o_orderpriority mix of the FIRST order-date half vs
    the second — ``PSI = Σ (p−q)·ln(p/q)`` over the category bins
    (integer-epoch-us midpoint split; both halves' bins union, zero bins
    guarded with the 1e−6 floor convention). One narrow two-key reduce;
    the PSI fold runs over the tiny bin table."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])
    span = pq.read_table(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate"])
    ss = span["o_orderdate"].to_pandas().astype("datetime64[us]") \
        .astype("int64")
    cut = pd.Timestamp((int(ss.min()) + int(ss.max())) // 2, unit="us")

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "prio": b["o_orderpriority"],
            "__a": (b["o_orderdate"] < cut).astype(np.int64),
            "__b": (b["o_orderdate"] >= cut).astype(np.int64)})

    red = hash_aggregate(orders.map_batches(pre, batch_format="pandas"),
                         ["prio"], {"n_a": ("__a", "sum"),
                                    "n_b": ("__b", "sum")},
                         num_partitions=4).to_pandas()
    na = float(red["n_a"].sum())
    nb = float(red["n_b"].sum())
    p = np.maximum(red["n_a"].to_numpy(np.float64) / na, 1e-6)
    q = np.maximum(red["n_b"].to_numpy(np.float64) / nb, 1e-6)
    psi = float(((p - q) * np.log(p / q)).sum())
    return pd.DataFrame({
        "n_first_half": np.array([int(na)], dtype=np.int64),
        "n_second_half": np.array([int(nb)], dtype=np.int64),
        "psi": [np.round(psi, 6)]})


SQL_PSI_ORDERS = """
    WITH cut AS (
        SELECT make_timestamp((epoch_us(min(o_orderdate))
                               + epoch_us(max(o_orderdate))) // 2) AS c
        FROM orders
    ),
    r AS (
        SELECT o_orderpriority AS prio,
               sum(CASE WHEN o_orderdate < c THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN o_orderdate >= c THEN 1 ELSE 0 END) AS n_b
        FROM orders CROSS JOIN cut GROUP BY 1
    ),
    t AS (SELECT sum(n_a) AS na, sum(n_b) AS nb FROM r)
    SELECT CAST(t.na AS BIGINT) AS n_first_half,
           CAST(t.nb AS BIGINT) AS n_second_half,
           round(sum((greatest(n_a / t.na, 1e-6)
                      - greatest(n_b / t.nb, 1e-6))
                     * ln(greatest(n_a / t.na, 1e-6)
                          / greatest(n_b / t.nb, 1e-6))), 6) AS psi
    FROM r CROSS JOIN t GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Jensen-Shannon source divergence / Cohen's kappa (batch 24)
# ---------------------------------------------------------------------------

def q_js_divergence_sources(sf_dir: str) -> pd.DataFrame:
    """Jensen–Shannon divergence (nats) between each source's whitespace
    token distribution and the corpus distribution — the corpus-mix
    monitoring number. Present-token terms fold distributedly from the
    per-(source, token) reduce joined with the per-token corpus totals;
    the absent-token mass closes in CLOSED FORM
    (``0.5·ln2·(1 − Σ_present q)``), so no per-source full-vocabulary
    pass is ever needed."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        outs_s, outs_t = [], []
        for s, t in zip(b["source"], b["text"].fillna("")):
            tt = t.split()
            outs_s.extend([s] * len(tt))
            outs_t.extend(tt)
        return pd.DataFrame({"source": outs_s, "tok": outs_t,
                             "__one": np.ones(len(outs_t),
                                              dtype=np.int64)})

    st = hash_aggregate(docs.map_batches(toks, batch_format="pandas"),
                        ["source", "tok"], {"n": ("__one", "sum")},
                        num_partitions=_NP).to_pandas()
    tot_by_tok = st.groupby("tok")["n"].sum()
    n_all = float(st["n"].sum())
    rows = []
    for src, g in st.groupby("source", sort=True):
        n_src = float(g["n"].sum())
        p = g["n"].to_numpy(np.float64) / n_src
        q = tot_by_tok.loc[g["tok"]].to_numpy(np.float64) / n_all
        m = (p + q) / 2.0
        present = 0.5 * float((p * np.log(p / m)
                               + q * np.log(q / m)).sum())
        absent = 0.5 * np.log(2.0) * (1.0 - float(q.sum()))
        rows.append((src, int(n_src), np.round(present + absent, 6)))
    out = pd.DataFrame(rows, columns=["source", "n_tokens", "js_div"])
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.reset_index(drop=True)


SQL_JS_DIVERGENCE_SOURCES = r"""
    WITH g AS (
        SELECT source, unnest(regexp_extract_all(text, '\S+')) AS tok
        FROM documents
    ),
    st AS (SELECT source, tok, count(*) AS n FROM g GROUP BY 1, 2),
    tt AS (SELECT tok, sum(n) AS nt FROM st GROUP BY 1),
    tots AS (SELECT sum(n) AS n_all FROM st),
    src AS (SELECT source, sum(n) AS n_src FROM st GROUP BY 1),
    terms AS (
        SELECT st.source,
               st.n / src.n_src AS p,
               tt.nt / tots.n_all AS q
        FROM st JOIN tt USING (tok) JOIN src USING (source)
                CROSS JOIN tots
    )
    SELECT source, CAST(max(src.n_src) AS BIGINT) AS n_tokens,
           round(0.5 * sum(p * ln(p / ((p + q) / 2))
                           + q * ln(q / ((p + q) / 2)))
                 + 0.5 * ln(2) * (1 - sum(q)), 6) AS js_div
    FROM terms JOIN src USING (source)
    GROUP BY 1
"""


def q_cohen_kappa_lang(sf_dir: str) -> pd.DataFrame:
    """Cohen's kappa (Cohen 1960 — public) of the n-gram lang-ID
    heuristic against the corpus label — chance-corrected agreement,
    folded from the same confusion counts the lang-confusion entry pins:
    ``κ = (p_o − p_e)/(1 − p_e)`` with p_e = Σ row-share · col-share."""
    conf = q_lang_confusion_documents(sf_dir)
    n = float(conf["n"].sum())
    po = float(conf.loc[conf["lang_true"] == conf["lang_pred"], "n"].sum()) / n
    row = conf.groupby("lang_true")["n"].sum() / n
    col = conf.groupby("lang_pred")["n"].sum() / n
    langs = sorted(set(row.index) | set(col.index))
    pe = float(sum(row.get(l, 0.0) * col.get(l, 0.0) for l in langs))
    kappa = (po - pe) / (1.0 - pe) if pe < 1.0 else NULLF
    return pd.DataFrame({
        "n_docs": np.array([int(n)], dtype=np.int64),
        "p_observed": [np.round(po, 6)],
        "p_expected": [np.round(pe, 6)],
        "kappa": [np.round(kappa, 6)]})


SQL_COHEN_KAPPA_LANG = f"""
    WITH conf AS ({{conf}}),
    t AS (SELECT sum(n) AS nn FROM conf),
    po AS (
        SELECT sum(CASE WHEN lang_true = lang_pred THEN n ELSE 0 END)
                   / t.nn AS po
        FROM conf CROSS JOIN t GROUP BY t.nn
    ),
    r AS (SELECT lang_true AS l, sum(n) AS nr FROM conf GROUP BY 1),
    c AS (SELECT lang_pred AS l, sum(n) AS nc FROM conf GROUP BY 1),
    pe AS (
        SELECT sum(r.nr * c.nc) / (t.nn * t.nn) AS pe
        FROM r JOIN c USING (l) CROSS JOIN t GROUP BY t.nn
    )
    SELECT CAST(t.nn AS BIGINT) AS n_docs,
           round(po.po, 6) AS p_observed,
           round(pe.pe, 6) AS p_expected,
           CASE WHEN pe.pe < 1.0
                THEN round((po.po - pe.pe) / (1.0 - pe.pe), 6)
                ELSE {NULLF} END AS kappa
    FROM po CROSS JOIN pe CROSS JOIN t
"""

# substitute the confusion CTE (replace, not .format — the confusion SQL
# may itself contain braces)
SQL_COHEN_KAPPA_LANG = SQL_COHEN_KAPPA_LANG.replace(
    "{conf}", SQL_LANG_CONFUSION)


# ---------------------------------------------------------------------------
# blocking recall gate (batch 25)
# ---------------------------------------------------------------------------

def q_blocking_recall_documents(sf_dir: str) -> pd.DataFrame:
    """Recall gate for the classical BLOCKING dedup (minhash_recall
    pattern): its pair output must contain ≥90% of ALL true pairs with
    normalized char-5-gram Jaccard ≥ 0.7 — the exact truth is recomputed
    on both sides (here brute-force with the size-ratio prune, in SQL by
    the exploded normalized-shingle oracle). Prefix blocking's recall is
    CORPUS-DEPENDENT (pairs differing in their first 12 normalized chars
    are invisible to it — the structural contrast with LSH banding);
    this gate documents where the classical baseline stands on this
    corpus."""
    import re

    docs_df = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def norm(t: str) -> str:
        t = re.sub(r"[^a-z0-9 ]", "", t.lower())
        return re.sub(r" +", " ", t).strip()

    nt = [norm(t) for t in docs_df["text"].fillna("")]
    sets = [_char_shingles(t) for t in nt]
    ids = docs_df["doc_id"].to_numpy()
    true_pairs = set()
    for i in range(len(sets)):
        si, zi = sets[i], len(sets[i])
        for j in range(i + 1, len(sets)):
            zj = len(sets[j])
            if min(zi, zj) < 0.7 * max(zi, zj):
                continue
            inter = len(si & sets[j])
            jac = inter / (zi + zj - inter)
            if jac >= 0.7:
                true_pairs.add((ids[i], ids[j]))
    blk = q_blocking_dedup_documents(sf_dir)
    found = set(zip(blk["id_a"], blk["id_b"]))
    hit = sum(p in found for p in true_pairs)
    recall = hit / max(len(true_pairs), 1)
    return pd.DataFrame({
        "n_true": pd.Series([len(true_pairs)], dtype="int64"),
        "recall_ok": pd.Series([recall >= 0.9], dtype="bool")})


SQL_BLOCKING_RECALL = """
    WITH nrm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                                                  '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS nt
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(strlen(nt) - 4, 1)),
                   i -> substr(nt, i, 5))) AS s
        FROM nrm
    ),
    cand AS (
        SELECT a.s AS sa, b.s AS sb
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE least(length(a.s), length(b.s))
              >= 0.7 * greatest(length(a.s), length(b.s))
    ),
    j AS (
        SELECT CAST(length(list_intersect(sa, sb)) AS DOUBLE)
               / (length(sa) + length(sb) - length(list_intersect(sa, sb)))
               AS jac
        FROM cand
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true, true AS recall_ok
    FROM j WHERE jac >= 0.7
"""


# ---------------------------------------------------------------------------
# changepoint via SSE argmin / local maxima (batch 26)
# ---------------------------------------------------------------------------

def q_changepoint_sse_daily(sf_dir: str) -> pd.DataFrame:
    """Single-changepoint detection by binary segmentation (the first
    step of PELT/binseg — public): per series the split minimizing the
    two-segment SSE (prefix-sum closed form: ``SSE_seg = Σx² −
    (Σx)²/n``), reported with the variance-reduction share
    ``1 − SSE_split/SSE_total``. Ties break to the EARLIEST split day.
    One keyed vectorized kernel; the oracle mirrors the prefix cumsums
    with windows."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").reset_index(drop=True)
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < 3:
                continue
            cs = np.cumsum(v)
            cs2 = np.cumsum(v * v)
            k = np.arange(1, n)  # left size
            sse_l = cs2[:-1] - cs[:-1] ** 2 / k
            sse_r = (cs2[-1] - cs2[:-1]) \
                - (cs[-1] - cs[:-1]) ** 2 / (n - k)
            sse = np.round(sse_l + sse_r, 6)
            total = np.round(cs2[-1] - cs[-1] ** 2 / n, 6)
            ix = int(np.argmin(sse))  # first min = earliest split
            red = np.round(1.0 - sse[ix] / total, 6) if total > 0 \
                else NULLF
            rows.append((et, n, g["d"].iloc[ix], red))
        return pd.DataFrame(rows, columns=["event_type", "n",
                                           "split_after_d",
                                           "var_reduction"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_CHANGEPOINT_SSE = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               row_number() OVER w AS k,
               count(*) OVER (PARTITION BY event_type) AS n,
               sum(v) OVER (PARTITION BY event_type ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS cs,
               sum(v * v) OVER (PARTITION BY event_type ORDER BY d
                                ROWS UNBOUNDED PRECEDING) AS cs2,
               sum(v) OVER (PARTITION BY event_type) AS ts,
               sum(v * v) OVER (PARTITION BY event_type) AS ts2
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    s AS (
        SELECT event_type, d, n, ts, ts2,
               round((cs2 - cs * cs / k)
                     + ((ts2 - cs2) - (ts - cs) * (ts - cs) / (n - k)),
                     6) AS sse
        FROM r WHERE k < n AND n >= 3
    ),
    b AS (
        SELECT event_type, d, n, ts, ts2, sse,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY sse, d) AS rn
        FROM s
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, d AS split_after_d,
           CASE WHEN round(ts2 - ts * ts / n, 6) > 0
                THEN round(1.0 - sse / round(ts2 - ts * ts / n, 6), 6)
                ELSE {NULLF} END AS var_reduction
    FROM b WHERE rn = 1
"""


def q_local_maxima_daily(sf_dir: str) -> pd.DataFrame:
    """Local-maxima (peak) profile per daily series: days strictly above
    BOTH neighbors (interior rows only) — peak count, the tallest peak's
    value and its day (value-desc, day-asc tie-break)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").reset_index(drop=True)
            v = g["v"].to_numpy(np.float64)
            if len(v) < 3:
                continue
            peak = (v[1:-1] > v[:-2]) & (v[1:-1] > v[2:])
            ixs = np.flatnonzero(peak) + 1
            if len(ixs) == 0:
                rows.append((et, 0, NULLF,
                             pd.Timestamp("9999-12-31")))
                continue
            order = ixs[np.lexsort((ixs, -v[ixs]))]
            top = int(order[0])
            rows.append((et, len(ixs), np.round(v[top], 6),
                         g["d"].iloc[top]))
        return pd.DataFrame(rows, columns=["event_type", "n_peaks",
                                           "top_peak_v", "top_peak_d"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_peaks"] = out["n_peaks"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_LOCAL_MAXIMA = f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
        SELECT event_type, d, v,
               LAG(v) OVER w AS pv, LEAD(v) OVER w AS nv
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    p AS (
        SELECT event_type, d, v FROM l
        WHERE pv IS NOT NULL AND nv IS NOT NULL
          AND v > pv AND v > nv
    ),
    b AS (
        SELECT event_type, d, v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY v DESC, d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS np
        FROM p
    ),
    base AS (SELECT DISTINCT event_type FROM daily
             WHERE (SELECT count(*) FROM daily d2
                    WHERE d2.event_type = daily.event_type) >= 3)
    SELECT base.event_type,
           CAST(COALESCE(b.np, 0) AS BIGINT) AS n_peaks,
           COALESCE(round(b.v, 6), {NULLF}) AS top_peak_v,
           COALESCE(b.d, TIMESTAMP '9999-12-31') AS top_peak_d
    FROM base LEFT JOIN b ON b.event_type = base.event_type AND b.rn = 1
"""


# ---------------------------------------------------------------------------
# damped Holt gate / activation latency (batch 27)
# ---------------------------------------------------------------------------

def q_holt_damped_gate_daily(sf_dir: str) -> pd.DataFrame:
    """Damped-trend Holt forecast, oracle-GATED through the α=1/β=1
    degenerate fit (l_T = y_T, b_T = y_T − y_{T−1}, exactly as the plain
    Holt gate pins) with the φ=0.9 damped horizon sum
    ``φ(1−φʰ)/(1−φ)`` — all SQL-expressible. Drives the 13th registered
    estimator; general (α, β) is already pinned by the Holt recursion
    test, and φ=1 recovers plain Holt by construction."""
    fr = _daily_frame(sf_dir)
    preds = fr.predict(periods=7, freq="D", estimator="holt_damped",
                       alpha=1.0, beta=1.0, phi=0.9)
    df = preds.to_pandas()[["event_type", "d", "predicted_v"]]
    df = _round(df, ["predicted_v"], 6)
    return df.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_HOLT_DAMPED_GATE = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC)
                   AS rn
        FROM daily
    ),
    s AS (
        SELECT event_type,
               max(CASE WHEN rn = 1 THEN v END) AS y_last,
               max(CASE WHEN rn = 2 THEN v END) AS y_prev,
               max(CASE WHEN rn = 1 THEN d END) AS d_last
        FROM r GROUP BY 1
    ),
    f AS (
        SELECT s.*, fd.d, datediff('day', s.d_last, fd.d) AS h
        FROM s CROSS JOIN (
            SELECT unnest(generate_series(maxd + INTERVAL 1 DAY,
                                          maxd + INTERVAL 7 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT max(d) AS maxd FROM daily)
        ) fd
    )
    SELECT event_type, d,
           round(y_last
                 + 0.9 * (1 - pow(0.9, h)) / 0.1
                   * (y_last - COALESCE(y_prev, y_last)), 6)
               AS predicted_v
    FROM f
"""


def q_activation_latency_users(sf_dir: str) -> pd.DataFrame:
    """Activation latency (the PLG growth metric): for users reaching
    ≥5 events, the seconds from their 1st to their 5th event —
    summarized as activated-user count plus median/p90 latency
    (``quantile_cont`` twins). One keyed kernel picks each user's 5th
    stamp ((user_id, ts) unique ⇒ total order)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in part.groupby("user_id", sort=False):
            t = np.sort(g["ts"].astype("datetime64[us]").astype("int64")
                        .to_numpy())
            if len(t) < 5:
                continue
            rows.append((uid, (t[4] - t[0]) / 1e6))
        return pd.DataFrame(rows, columns=["user_id", "lat_s"])

    lat = keyed_map_partitions(ev, ["user_id"], kernel,
                               num_partitions=_NP).to_pandas()
    if len(lat) == 0:
        return pd.DataFrame({
            "n_activated": np.array([0], dtype=np.int64),
            "median_s": [NULLF], "p90_s": [NULLF]})
    v = lat["lat_s"].to_numpy(np.float64)
    return pd.DataFrame({
        "n_activated": np.array([len(v)], dtype=np.int64),
        "median_s": [np.round(np.percentile(v, 50), 6)],
        "p90_s": [np.round(np.percentile(v, 90), 6)]})


SQL_ACTIVATION_LATENCY = f"""
    WITH r AS (
        SELECT user_id, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        FROM events
    ),
    l AS (
        SELECT user_id,
               (epoch_us(max(CASE WHEN rn = 5 THEN ts END))
                - epoch_us(max(CASE WHEN rn = 1 THEN ts END))) / 1e6
                   AS lat_s
        FROM r WHERE rn IN (1, 5) GROUP BY 1
        HAVING max(CASE WHEN rn = 5 THEN ts END) IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_activated,
           COALESCE(round(quantile_cont(lat_s, 0.5), 6), {NULLF})
               AS median_s,
           COALESCE(round(quantile_cont(lat_s, 0.9), 6), {NULLF}) AS p90_s
    FROM l
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 / Q4 / Q12 shapes (public TPC-H spec, adapted to available columns)
# ---------------------------------------------------------------------------

_Q6_LO = "1996-01-01"
_Q6_HI = "1997-01-01"


def q_q6_revenue_filter(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape (public spec): tight scan-filter-aggregate — revenue
    that would be gained by dropping small discounts on low-quantity lines
    in one shipping year. The whole operator is a pruned 4-column read →
    vectorized per-batch mask + partial (sum, count) combiner → tiny driver
    fold; no shuffle at any scale."""
    lo, hi = pd.Timestamp(_Q6_LO), pd.Timestamp(_Q6_HI)
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = ((b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
             & (b["l_discount"] >= 0.02) & (b["l_discount"] <= 0.04)
             & (b["l_quantity"] < 24.0))
        sel = b.loc[m]
        rev = (sel["l_extendedprice"].to_numpy(np.float64)
               * sel["l_discount"].to_numpy(np.float64)).sum()
        return pd.DataFrame({"rev": [rev], "n": [int(m.sum())]})

    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "revenue": [np.round(float(parts["rev"].sum()), 4)],
        "n_lines": np.array([int(parts["n"].sum())], dtype=np.int64),
    })


SQL_Q6_REVENUE = f"""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}'
      AND l_shipdate < TIMESTAMP '{_Q6_HI}'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
"""


def q_q4_priority_exists(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders placed in a window
    that have AT LEAST ONE returned lineitem (`l_returnflag = 'R'` stands in
    for the spec's commit-late predicate — this corpus carries no
    commit/receipt dates), counted per priority. The EXISTS is a distributed
    semi-join: the probe side dedups to distinct orderkeys FIRST (narrow
    int64 column, partial dedup inside each batch then a hash dedup), so
    the join ships one row per qualifying order, never the full lineitem
    fan-in; counts come from the CPU-clamped hash aggregate."""
    from forecastframe_ray.stages.join import hash_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-07-01")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def ret_keys(b: pd.DataFrame) -> pd.DataFrame:
        k = b.loc[b["l_returnflag"] == "R", "l_orderkey"].unique()
        return pd.DataFrame({"o_orderkey": k})

    keys = hash_aggregate(li.map_batches(ret_keys, batch_format="pandas"),
                          ["o_orderkey"], {"dummy": ("o_orderkey", "count")},
                          num_partitions=_NP).drop_columns(["dummy"])

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)],
        batch_format="pandas")

    joined = hash_join(orders, keys, on=["o_orderkey"], num_partitions=_NP)
    out = hash_count(joined, ["o_orderpriority"], out_col="order_count",
                     num_partitions=_NP).to_pandas()
    out["order_count"] = out["order_count"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_Q4_PRIORITY = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY 1 ORDER BY 1
"""


def q_q12_returnflag_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split, `l_returnflag` standing
    in for the absent shipmode column): lines shipped in one year joined to
    their orders; per flag, how many belong to critical-priority orders
    (1-URGENT / 2-HIGH) vs the rest. The CASE indicators are computed
    vectorized inside the join output batches and pre-summed by the partial
    combiner, so the exchange carries one row per (flag, partial)."""
    from forecastframe_ray.stages.join import hash_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag",
                                    "l_shipdate"])
    li = li.map_batches(
        lambda b: b.loc[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi),
                        ["l_orderkey", "l_returnflag"]],
        batch_format="pandas")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")

    joined = hash_join(li, orders, on=["l_orderkey"], num_partitions=_NP)

    def indicators(b: pd.DataFrame) -> pd.DataFrame:
        hi_pri = b["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        return pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "high_line_count": hi_pri.astype(np.int64),
            "low_line_count": (~hi_pri).astype(np.int64),
        })

    agg = hash_aggregate(joined.map_batches(indicators,
                                            batch_format="pandas"),
                         ["l_returnflag"],
                         {"high_line_count": ("high_line_count", "sum"),
                          "low_line_count": ("low_line_count", "sum")},
                         num_partitions=_NP).to_pandas()
    for c in ("high_line_count", "low_line_count"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("l_returnflag").reset_index(drop=True)


SQL_Q12_PRIORITY = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# technical indicators on the daily spine (public formulas: Cutler RSI,
# Lane stochastic oscillator, Granville on-balance volume)
# ---------------------------------------------------------------------------

def q_rsi_daily_events(sf_dir: str) -> pd.DataFrame:
    """Cutler's RSI (simple-average variant — the Wilder original is a
    recursive EWM, not SQL-expressible): 14-row trailing means of the
    up/down moves of the daily series, RSI = 100·ag/(ag+al). Flat windows
    (ag+al = 0) pin to 50 on both engines; the first row of each series
    (no move yet) is the NULL sentinel. One co-located kernel per series."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            dv = g["v"].diff()
            gains = dv.clip(lower=0.0)
            losses = (-dv).clip(lower=0.0)
            ag = gains.rolling(14, min_periods=1).mean().to_numpy(np.float64)
            al = losses.rolling(14, min_periods=1).mean().to_numpy(np.float64)
            tot = ag + al
            rsi = np.where(tot > 0, 100.0 * ag / np.where(tot > 0, tot, 1.0),
                           50.0)
            rsi = np.where(np.isnan(tot), np.nan, rsi)
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"], "v": g["v"],
                "rsi14": np.round(rsi, 6) + 0.0}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "rsi14"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = _fill(out, ["rsi14"])
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_RSI_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    mv AS (
        SELECT event_type, d, v,
               v - LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS dv
        FROM daily
    ),
    w AS (
        SELECT event_type, d, v,
               avg(CASE WHEN dv IS NULL THEN NULL
                        ELSE greatest(dv, 0) END) OVER w1 AS ag,
               avg(CASE WHEN dv IS NULL THEN NULL
                        ELSE greatest(-dv, 0) END) OVER w1 AS al
        FROM mv WINDOW w1 AS (PARTITION BY event_type ORDER BY d
                              ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, v,
           COALESCE(round(CASE WHEN ag IS NULL THEN NULL
                               WHEN ag + al > 0
                               THEN 100.0 * ag / (ag + al)
                               ELSE 50.0 END, 6) + 0.0, {NULLF}) AS rsi14
    FROM w
"""


def q_stochastic_daily_events(sf_dir: str) -> pd.DataFrame:
    """Lane stochastic oscillator on the daily spine: %K = position of
    today's value inside the trailing-14 (incl. today) min..max range,
    %D = 3-row mean of the unrounded %K. Flat ranges pin to 50; %D needs
    ≥1 finite %K in its window. Co-located kernel per series; the oracle
    nests two window CTEs."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            v = g["v"].astype(np.float64)
            lo = v.rolling(14, min_periods=1).min()
            hi = v.rolling(14, min_periods=1).max()
            rng = (hi - lo).to_numpy()
            k = np.where(rng > 0,
                         100.0 * (v.to_numpy() - lo.to_numpy())
                         / np.where(rng > 0, rng, 1.0), 50.0)
            dcol = pd.Series(k).rolling(3, min_periods=1).mean() \
                .to_numpy(np.float64)
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"], "v": g["v"],
                "pct_k": np.round(k, 6) + 0.0,
                "pct_d": np.round(dcol, 6) + 0.0}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "pct_k", "pct_d"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_STOCHASTIC_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               min(v) OVER w1 AS lo, max(v) OVER w1 AS hi
        FROM daily WINDOW w1 AS (PARTITION BY event_type ORDER BY d
                                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    k AS (
        SELECT event_type, d, v,
               CASE WHEN hi > lo THEN 100.0 * (v - lo) / (hi - lo)
                    ELSE 50.0 END AS kv
        FROM r
    )
    SELECT event_type, d, v,
           round(kv, 6) + 0.0 AS pct_k,
           round(avg(kv) OVER (PARTITION BY event_type ORDER BY d
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
               + 0.0 AS pct_d
    FROM k
"""


def q_obv_daily_events(sf_dir: str) -> pd.DataFrame:
    """Granville on-balance volume adapted to the daily value spine:
    running sum of +v / −v / 0 by the sign of the day-over-day move (first
    row of each series contributes 0). Prefix sums are per-series
    co-located state — exactly the cumulative pattern the MTD/drawdown
    kernels use; oracle is SUM OVER UNBOUNDED PRECEDING."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            v = g["v"].to_numpy(np.float64)
            dv = np.diff(v, prepend=np.nan)
            step = np.where(np.isnan(dv), 0.0,
                            np.where(dv > 0, v, np.where(dv < 0, -v, 0.0)))
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"], "v": g["v"],
                "obv": np.round(np.cumsum(step), 6) + 0.0}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "obv"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_OBV_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    mv AS (
        SELECT event_type, d, v,
               v - LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS dv
        FROM daily
    )
    SELECT event_type, d, v,
           round(sum(CASE WHEN dv IS NULL THEN 0.0
                          WHEN dv > 0 THEN v
                          WHEN dv < 0 THEN -v ELSE 0.0 END)
                 OVER (PARTITION BY event_type ORDER BY d
                       ROWS UNBOUNDED PRECEDING), 6) + 0.0 AS obv
    FROM mv
"""


# ---------------------------------------------------------------------------
# rolling kurtosis / Kendall tau-b vs market / global max-concurrency sweep
# ---------------------------------------------------------------------------

def q_rolling_kurt_daily(sf_dir: str) -> pd.DataFrame:
    """W1 fourth-moment shape statistic: trailing-14 sample EXCESS kurtosis
    (bias-corrected G2 — pandas ``rolling.kurt`` and DuckDB ``kurtosis``
    agree on the estimator), ≥4 points required. Completes the rolling
    moment family (mean/std → skew → kurt); same co-located kernel shape."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            k = g["v"].rolling(14, min_periods=4).kurt() \
                .to_numpy(np.float64)
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"], "v": g["v"],
                "kurt14": np.round(k, 6) + 0.0}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "kurt14"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = _fill(out, ["kurt14"])
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_ROLLING_KURT_DAILY = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           COALESCE(CASE WHEN count(v) OVER w >= 4
                         THEN round(kurtosis(v) OVER w, 6) + 0.0 END,
                    {NULLF}) AS kurt14
    FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
"""


def q_kendall_tau_market_daily(sf_dir: str) -> pd.DataFrame:
    """Kendall tau-b (Kendall 1938, tie-corrected form) between each daily
    series and the MARKET total (sum over all series per day) — the
    rank-correlation counterpart of ``rolling_corr_market``. The market
    spine is one row per day (tiny; merged in as a broadcast), the pair
    statistics are a per-series vectorized sign-matrix kernel (quadratic in
    the SERIES length, which is bounded by the calendar, never by corpus
    size). Both engines quantize v and the market total to 6dp so tie
    detection agrees."""
    from forecastframe_ray.stages.agg import keyed_map_partitions
    from forecastframe_ray.stages.join import broadcast_left_join

    daily = _bucket_series(sf_dir, DAY_US, "d")
    mkt = hash_aggregate(daily, ["d"], {"m": ("v", "sum")},
                         num_partitions=4).to_pandas()
    mkt["m"] = np.round(mkt["m"].to_numpy(np.float64), 6)
    joined = broadcast_left_join(daily, mkt, on=["d"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            x = g["v"].to_numpy(np.float64)
            y = g["m"].to_numpy(np.float64)
            n = len(x)
            if n < 2:
                rows.append((et, n, np.nan))
                continue
            iu = np.triu_indices(n, k=1)
            sx = np.sign(x[:, None] - x[None, :])[iu]
            sy = np.sign(y[:, None] - y[None, :])[iu]
            prod = sx * sy
            conc = int((prod > 0).sum())
            disc = int((prod < 0).sum())
            tx_only = int(((sx == 0) & (sy != 0)).sum())
            ty_only = int(((sy == 0) & (sx != 0)).sum())
            den = np.sqrt(float(conc + disc + ty_only)
                          * float(conc + disc + tx_only))
            tau = (conc - disc) / den if den > 0 else np.nan
            rows.append((et, n, np.round(tau, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days", "tau_b"])

    out = keyed_map_partitions(joined, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["tau_b"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_KENDALL_TAU_MARKET = f"""
    WITH daily AS ({_DAILY_SQL}),
    mkt AS (SELECT d, round(sum(v), 6) AS m FROM daily GROUP BY d),
    j AS (SELECT event_type, daily.d, v, m FROM daily JOIN mkt USING (d)),
    p AS (
        SELECT a.event_type,
               sum(CASE WHEN (a.v - b.v) * (a.m - b.m) > 0
                        THEN 1 ELSE 0 END) AS conc,
               sum(CASE WHEN (a.v - b.v) * (a.m - b.m) < 0
                        THEN 1 ELSE 0 END) AS disc,
               sum(CASE WHEN a.v = b.v AND a.m <> b.m
                        THEN 1 ELSE 0 END) AS tx_only,
               sum(CASE WHEN a.m = b.m AND a.v <> b.v
                        THEN 1 ELSE 0 END) AS ty_only
        FROM j a JOIN j b ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY 1
    ),
    n AS (SELECT event_type, count(*) AS n_days FROM j GROUP BY 1)
    SELECT n.event_type, CAST(n.n_days AS BIGINT) AS n_days,
           COALESCE(round((conc - disc)
                          / sqrt((conc + disc + ty_only)
                                 * (conc + disc + tx_only)), 6) + 0.0,
                    {NULLF}) AS tau_b
    FROM n LEFT JOIN p ON n.event_type = p.event_type
    ORDER BY 1
"""


def q_max_concurrency_events(sf_dir: str) -> pd.DataFrame:
    """Peak concurrency of 30-minute activity intervals (one per event):
    the classic interval sweep — every interval contributes (+1 at start,
    −1 at end), peak = max prefix sum over boundaries ordered by
    (time, delta) with closes before opens at ties ([start, end)
    semantics). Distributed as a SINGLE-pass prefix scan: monotone
    time-range partitions each report (Σdelta, max local prefix) — P tiny
    rows — and the driver folds exclusive offsets; no second pass because
    the answer is a scalar, and no global sort because the partition
    mapping is order-preserving."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    span_us = 1_800_000_000  # 30 min
    ev = _read(sf_dir, "events", ["ts"])

    ext = ev.map_batches(
        lambda b: pd.DataFrame({
            "lo": [b["ts"].min()], "hi": [b["ts"].max()]}),
        batch_format="pandas").to_pandas()
    lo = ext["lo"].min().value // 1000
    hi = ext["hi"].max().value // 1000 + span_us
    P = _NP
    width = max((hi - lo) // P + 1, 1)

    def boundaries(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        ts = np.concatenate([t, t + span_us])
        delta = np.concatenate([np.ones(len(t), dtype=np.int64),
                                -np.ones(len(t), dtype=np.int64)])
        return pd.DataFrame({
            "t": ts, "delta": delta,
            "__rng": np.minimum((ts - lo) // width, P - 1)})

    def local(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        # a hash partition may hold several range keys — fold each alone
        for rng, g in part.groupby("__rng", sort=False):
            g = g.sort_values(["t", "delta"], kind="mergesort")
            c = np.cumsum(g["delta"].to_numpy(np.int64))
            rows.append((int(rng), int(c[-1]), int(c.max())))
        return pd.DataFrame(rows, columns=["__rng", "total", "local_max"])

    parts = keyed_map_partitions(
        ev.map_batches(boundaries, batch_format="pandas"),
        ["__rng"], local, num_partitions=P).to_pandas() \
        .sort_values("__rng")
    offset, best = 0, 0
    for _, r in parts.iterrows():
        best = max(best, offset + int(r["local_max"]))
        offset += int(r["total"])
    n = int(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)
    return pd.DataFrame({
        "max_concurrency": np.array([best], dtype=np.int64),
        "n_intervals": np.array([n], dtype=np.int64)})


SQL_MAX_CONCURRENCY = """
    WITH b AS (
        SELECT epoch_us(ts) AS t, 1 AS delta FROM events
        UNION ALL
        SELECT epoch_us(ts) + 1800000000, -1 FROM events
    ),
    s AS (
        SELECT sum(delta) OVER (ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS c
        FROM b
    )
    SELECT CAST(max(c) AS BIGINT) AS max_concurrency,
           CAST((SELECT count(*) FROM events) AS BIGINT) AS n_intervals
    FROM s
"""


# ---------------------------------------------------------------------------
# embedding-space audits: pairwise-cosine histogram, norm stats, spectral gate
# ---------------------------------------------------------------------------

def q_cosine_histogram_embeddings(sf_dir: str) -> pd.DataFrame:
    """Distribution audit of PAIRWISE cosine similarity: counts of all i<j
    pairs in ten fixed [−1,1] bins. The comparison matrix is broadcast once
    (`ray.put` semantics via closure capture — same shape as the ANN query
    broadcast) and each batch computes a |B|×n matmul + partial histogram,
    so the exchange carries 10 ints per batch. All-pairs is quadratic BY
    DEFINITION — at corpus scale the op audits a deterministic cap of rows
    (vec_id order, documented), which bounds the broadcast at cap×dim;
    sf-scale inputs sit below the cap so the oracle sees every pair. Sims
    are rounded to 6dp on both engines before binning so edge assignment
    agrees."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy(np.int64)
    norms = np.linalg.norm(M, axis=1)
    Mn = M / np.where(norms > 0, norms, 1.0)[:, None]

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        B = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        bn = np.linalg.norm(B, axis=1)
        Bn = B / np.where(bn > 0, bn, 1.0)[:, None]
        sims = Bn @ Mn.T
        bid = b["vec_id"].to_numpy(np.int64)
        mask = bid[:, None] < ids[None, :]
        s = np.round(sims[mask], 6)
        binned = np.clip(np.floor((s + 1.0) / 0.2), 0, 9).astype(np.int64)
        counts = np.bincount(binned, minlength=10)
        return pd.DataFrame({"bin": np.arange(10, dtype=np.int64),
                             "n_pairs": counts})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("bin", as_index=False)["n_pairs"].sum()
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.sort_values("bin").reset_index(drop=True)


SQL_COSINE_HISTOGRAM = """
    WITH p AS (
        SELECT CAST(least(greatest(floor(
                   (round(list_cosine_similarity(a.embedding, b.embedding),
                          6) + 1.0) / 0.2), 0), 9) AS BIGINT) AS bin
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ),
    bins AS (SELECT unnest(generate_series(0, 9)) AS bin)
    SELECT CAST(bins.bin AS BIGINT) AS bin,
           CAST(count(p.bin) AS BIGINT) AS n_pairs
    FROM bins LEFT JOIN p ON bins.bin = p.bin
    GROUP BY 1 ORDER BY 1
"""


def q_norm_stats_embeddings(sf_dir: str) -> pd.DataFrame:
    """Per-label L2-norm profile (n, mean, min, max) — the standard sanity
    gate before cosine ops (zero / unnormalized vectors distort every
    similarity). Vectorized per-batch norms → the CPU-clamped hash
    aggregate; one tiny exchange row per (label, partial)."""
    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def norms(b: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"label": b["label"],
                             "nrm": np.linalg.norm(M, axis=1)})

    agg = hash_aggregate(emb.map_batches(norms, batch_format="pandas"),
                         ["label"],
                         {"n": ("nrm", "count"), "mean_norm": ("nrm", "mean"),
                          "min_norm": ("nrm", "min"),
                          "max_norm": ("nrm", "max")},
                         num_partitions=4).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    agg = _round(agg, ["mean_norm", "min_norm", "max_norm"], 6)
    return agg.sort_values("label").reset_index(drop=True)


SQL_NORM_STATS = """
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           round(avg(sqrt(list_dot_product(embedding, embedding))), 6)
               AS mean_norm,
           round(min(sqrt(list_dot_product(embedding, embedding))), 6)
               AS min_norm,
           round(max(sqrt(list_dot_product(embedding, embedding))), 6)
               AS max_norm
    FROM embeddings GROUP BY 1 ORDER BY 1
"""


def q_pca_spectrum_gate_embeddings(sf_dir: str) -> pd.DataFrame:
    """Spectral gate for the PCA path: the eigenvalues of the one-pass
    population covariance must satisfy Σλ = trace(C) and Σλ² = ‖C‖²_F
    (Schatten-1/2 identities) — both right-hand sides are SQL-computable
    from unnested per-dimension covariances WITHOUT an eigensolver, so the
    driver-side eigh (64×64 — constant, never data-sized) is pinned by an
    exact oracle. Covariance partials are per-batch (n, Σx, ΣxxT) combiner
    rows; nothing data-sized leaves the cluster."""
    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "n": [len(M)],
            "sx": [M.sum(axis=0).tobytes()],
            "sxx": [(M.T @ M).tobytes()],
        })

    parts = emb.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    d = 64
    sx = np.sum([np.frombuffer(v, dtype=np.float64) for v in parts["sx"]],
                axis=0)
    sxx = np.sum([np.frombuffer(v, dtype=np.float64).reshape(d, d)
                  for v in parts["sxx"]], axis=0)
    mu = sx / n
    C = sxx / n - np.outer(mu, mu)
    lam = np.linalg.eigvalsh(C)
    return pd.DataFrame({
        "n_dims": np.array([d], dtype=np.int64),
        "trace": [np.round(float(lam.sum()), 4)],
        "frob2": [np.round(float((lam ** 2).sum()), 4)],
    })


SQL_PCA_SPECTRUM_GATE = """
    WITH e AS (
        SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    c AS (
        SELECT a.i AS i, b.i AS j, covar_pop(a.x, b.x) AS cv
        FROM e a JOIN e b USING (vec_id)
        GROUP BY 1, 2
    )
    SELECT CAST(max(i) AS BIGINT) AS n_dims,
           round(sum(CASE WHEN i = j THEN cv ELSE 0 END), 4) AS trace,
           round(sum(cv * cv), 4) AS frob2
    FROM c
"""


# ---------------------------------------------------------------------------
# schema-evolution union + deterministic text normalization
# ---------------------------------------------------------------------------

def q_schema_evolution_union(sf_dir: str) -> pd.DataFrame:
    """Lakehouse schema-evolution read: two file generations of the orders
    table (v1 carries price, v2 carries date+priority) unioned BY NAME with
    null fill via ``stages.reshape.union_by_name`` — no shuffle, the blocks
    just conform and concatenate. Summarized per generation so the oracle
    pins both the null-fill and the row routing."""
    from forecastframe_ray.stages.reshape import union_by_name

    v1 = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    v1 = v1.map_batches(lambda b: b[b["o_orderkey"] % 2 == 0],
                        batch_format="pandas")
    v2 = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"])
    v2 = v2.map_batches(lambda b: b[b["o_orderkey"] % 2 == 1],
                        batch_format="pandas")
    u = union_by_name([v1, v2])

    def mark(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "gen": np.where(b["o_totalprice"].notna(), "v1", "v2"),
            "has_price": b["o_totalprice"].notna().astype(np.int64),
            "has_date": b["o_orderdate"].notna().astype(np.int64),
            "price": b["o_totalprice"].fillna(0.0),
            "one": np.ones(len(b), dtype=np.int64)})

    agg = hash_aggregate(u.map_batches(mark, batch_format="pandas"),
                         ["gen"],
                         {"n": ("one", "sum"),
                          "n_price": ("has_price", "sum"),
                          "n_date": ("has_date", "sum"),
                          "sum_price": ("price", "sum")},
                         num_partitions=4).to_pandas()
    for c in ("n", "n_price", "n_date"):
        agg[c] = agg[c].astype(np.int64)
    agg = _round(agg, ["sum_price"], 4)
    return agg.sort_values("gen").reset_index(drop=True)


SQL_SCHEMA_EVOLUTION_UNION = """
    WITH u AS (
        SELECT o_orderkey, o_totalprice, NULL::TIMESTAMP AS o_orderdate,
               NULL::VARCHAR AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, NULL, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT CASE WHEN o_totalprice IS NOT NULL THEN 'v1' ELSE 'v2' END AS gen,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_price,
           CAST(sum(CASE WHEN o_orderdate IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_date,
           round(sum(COALESCE(o_totalprice, 0)), 4) AS sum_price
    FROM u GROUP BY 1 ORDER BY 1
"""


def q_normalize_text_documents(sf_dir: str) -> pd.DataFrame:
    """Deterministic text canonicalization (the byte-identity contract the
    north_rule demands of extraction, applied as a standalone stage): NFC
    unicode normalization → lowercase → strip → collapse ASCII whitespace
    runs to one space; emitted as (doc_id, md5, n_chars) so the oracle
    checks the exact bytes without shipping them. Stateless vectorized
    map_batches; the whitespace class is pinned to ASCII on both engines
    (python re vs RE2 \\s semantics differ on unicode)."""
    import hashlib
    import re as _re
    import unicodedata

    ws = _re.compile(r"[ \t\n\r\f]+")
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].fillna("")
        out = [ws.sub(" ", unicodedata.normalize("NFC", t).lower()).strip()
               for t in texts]
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "md5": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in out],
            "n_chars": np.array([len(t) for t in out], dtype=np.int64)})

    out = docs.map_batches(norm, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_NORMALIZE_TEXT = """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))),
                                   '[ \t\n\r\f]+', ' ', 'g'))) AS md5,
           CAST(length(trim(regexp_replace(lower(nfc_normalize(
                    COALESCE(text, ''))), '[ \t\n\r\f]+', ' ', 'g')))
                AS BIGINT) AS n_chars
    FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# graph centrality / business-day calendar / Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def q_pagerank_types_events(sf_dir: str) -> pd.DataFrame:
    """Weighted PageRank (Brin-Page 1998, damping 0.85, 3 synchronous
    iterations from uniform) over the event-type transition graph. Edge
    weights come from the distributed per-user transition kernel (same
    shape as ``transition_counts_events``); the power iteration itself runs
    on the driver over a T×T matrix where T = event-type CARDINALITY —
    bounded by the vocabulary, never the corpus. Precondition (checked):
    every node has out-weight > 0; the oracle unrolls the same 3
    iterations as nested CTEs."""
    from forecastframe_ray.keys import partition_ids

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__part"] = partition_ids(b, ["user_id"], _NP)
        return b

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts"], kind="mergesort")
        nxt = part.groupby("user_id", sort=False)["event_type"].shift(-1)
        ok = nxt.notna()
        sub = pd.DataFrame({"p": part["event_type"][ok], "q": nxt[ok]})
        out = sub.groupby(["p", "q"], sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    partial = (ev.map_batches(assign, batch_format="pandas")
               .groupby("__part").map_groups(pairs, batch_format="pandas"))
    edges = hash_aggregate(partial, ["p", "q"], {"n": ("n", "sum")},
                           num_partitions=4).to_pandas()

    nodes = sorted(set(edges["p"]) | set(edges["q"]))
    idx = {t: i for i, t in enumerate(nodes)}
    T = len(nodes)
    W = np.zeros((T, T), dtype=np.float64)
    for p, q, n in edges.itertuples(index=False):
        W[idx[p], idx[q]] = float(n)
    wout = W.sum(axis=1)
    if (wout <= 0).any():
        raise RuntimeError("pagerank: dangling node (no out-transitions)")
    P = W / wout[:, None]
    pr = np.full(T, 1.0 / T)
    for _ in range(3):
        pr = 0.15 / T + 0.85 * (pr @ P)
    return pd.DataFrame({"event_type": nodes,
                         "pr3": np.round(pr, 6) + 0.0}) \
        .sort_values("event_type").reset_index(drop=True)


SQL_PAGERANK_TYPES = """
    WITH tr AS (
        SELECT event_type AS p,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS q
        FROM events
    ),
    e AS (SELECT p, q, count(*)::DOUBLE AS n FROM tr
          WHERE q IS NOT NULL GROUP BY 1, 2),
    w AS (SELECT p, sum(n) AS wout FROM e GROUP BY 1),
    nodes AS (SELECT DISTINCT event_type FROM events),
    nn AS (SELECT count(*)::DOUBLE AS t FROM nodes),
    r0 AS (SELECT event_type, 1.0 / nn.t AS pr FROM nodes, nn),
    r1 AS (SELECT n.event_type,
                  0.15 / nn.t + 0.85 * COALESCE(
                      (SELECT sum(r0.pr * e.n / w.wout)
                       FROM e JOIN r0 ON r0.event_type = e.p
                              JOIN w ON w.p = e.p
                       WHERE e.q = n.event_type), 0) AS pr
           FROM nodes n, nn),
    r2 AS (SELECT n.event_type,
                  0.15 / nn.t + 0.85 * COALESCE(
                      (SELECT sum(r1.pr * e.n / w.wout)
                       FROM e JOIN r1 ON r1.event_type = e.p
                              JOIN w ON w.p = e.p
                       WHERE e.q = n.event_type), 0) AS pr
           FROM nodes n, nn),
    r3 AS (SELECT n.event_type,
                  0.15 / nn.t + 0.85 * COALESCE(
                      (SELECT sum(r2.pr * e.n / w.wout)
                       FROM e JOIN r2 ON r2.event_type = e.p
                              JOIN w ON w.p = e.p
                       WHERE e.q = n.event_type), 0) AS pr
           FROM nodes n, nn)
    SELECT event_type, round(pr, 6) + 0.0 AS pr3 FROM r3 ORDER BY 1
"""


def q_business_days_to_ship(sf_dir: str) -> pd.DataFrame:
    """Order→ship latency in BUSINESS days (Mon–Fri, [order, ship) interval
    — numpy ``busday_count`` semantics) per order priority, over the rows
    where the ship date is not before the order date (this synthetic corpus
    has no causal guarantee; the filter is part of the contract). The join
    is the CPU-clamped distributed hash join; the busday arithmetic is one
    vectorized C call per batch. Oracle expands each interval with
    generate_series — exact, if quadratic in days (oracle-side only)."""
    from forecastframe_ray.stages.join import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")
    joined = hash_join(li, orders, on=["l_orderkey"], num_partitions=_NP)

    def busdays(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] >= b["o_orderdate"]]
        a = b["o_orderdate"].to_numpy().astype("datetime64[D]")
        s = b["l_shipdate"].to_numpy().astype("datetime64[D]")
        return pd.DataFrame({
            "o_orderpriority": b["o_orderpriority"],
            "bd": np.busday_count(a, s).astype(np.float64),
            "one": np.ones(len(b), dtype=np.int64)})

    agg = hash_aggregate(joined.map_batches(busdays, batch_format="pandas"),
                         ["o_orderpriority"],
                         {"n": ("one", "sum"), "mean_bd": ("bd", "mean"),
                          "max_bd": ("bd", "max")},
                         num_partitions=4).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    agg["max_bd"] = agg["max_bd"].astype(np.int64)
    agg = _round(agg, ["mean_bd"], 6)
    return agg.sort_values("o_orderpriority").reset_index(drop=True)


SQL_BUSINESS_DAYS = """
    WITH j AS (
        SELECT o_orderpriority, o_orderdate, l_shipdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate
    ),
    d AS (
        SELECT o_orderpriority, o_orderdate, l_shipdate,
               CASE WHEN l_shipdate = o_orderdate THEN 0
                    ELSE (SELECT count(*) FROM
                          unnest(generate_series(j.o_orderdate,
                                                 j.l_shipdate
                                                   - INTERVAL 1 DAY,
                                                 INTERVAL 1 DAY)) AS t(dd)
                          WHERE isodow(dd) <= 5) END AS bd
        FROM j
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round(avg(bd), 6) AS mean_bd, CAST(max(bd) AS BIGINT) AS max_bd
    FROM d GROUP BY 1 ORDER BY 1
"""


def q_heavy_hitters_users_events(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries heavy hitters (1982; mergeable-summaries form, Agarwal
    et al. 2013): every user with more than n/k of all events. Pass 1:
    each batch reduces to a ≤k-counter MG summary (exact in-batch counts,
    then the (k+1)-th-largest subtraction), summaries merge by counter
    addition + re-truncation — the MG guarantee (no miss for true
    heavy hitters) survives merging. Pass 2 re-counts ONLY the surviving
    candidates exactly (broadcast filter + hash count) so the emitted
    counts carry no sketch error; the oracle is a plain HAVING."""
    K = 500
    ev = _read(sf_dir, "events", ["user_id"])
    n_total = int(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)
    thresh = n_total / K

    def mg_batch(b: pd.DataFrame) -> pd.DataFrame:
        cnt = b["user_id"].value_counts()
        if len(cnt) > K:
            sub = cnt.iloc[K]  # (k+1)-th largest
            cnt = (cnt - sub).iloc[:K]
            cnt = cnt[cnt > 0]
        return pd.DataFrame({"user_id": cnt.index.to_numpy(),
                             "c": cnt.to_numpy(np.int64)})

    partials = ev.map_batches(mg_batch, batch_format="pandas").to_pandas()
    merged = partials.groupby("user_id")["c"].sum().sort_values(
        ascending=False)
    if len(merged) > K:
        sub = merged.iloc[K]
        merged = (merged - sub).iloc[:K]
        merged = merged[merged > 0]
    cand = set(merged.index.tolist())

    exact = hash_count(
        ev.map_batches(lambda b: b[b["user_id"].isin(cand)],
                       batch_format="pandas"),
        ["user_id"], out_col="n_events", num_partitions=4).to_pandas()
    exact = exact[exact["n_events"] > thresh].copy()
    exact["n_events"] = exact["n_events"].astype(np.int64)
    exact["user_id"] = exact["user_id"].astype(np.int64)
    return exact.sort_values("user_id").reset_index(drop=True)


SQL_HEAVY_HITTERS_USERS = """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    HAVING count(*) > (SELECT count(*) FROM events) / 500.0
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# quantile normalization / state dwell time / grouped OLS
# ---------------------------------------------------------------------------

def q_quantile_normalize_daily(sf_dir: str) -> pd.DataFrame:
    """Quantile normalization (Bolstad et al. 2003 — the microarray
    standard) across the daily series: every series' r-th order statistic
    is replaced by the MEAN of the r-th order statistics across all series,
    making the per-series marginal distributions identical. Rank assignment
    is deterministic ((v, d) ties). Two tiny exchanges: per-series ranking
    is a co-located kernel, the cross-series rank means are one
    hash-aggregate over (rank) — rows bounded by the calendar."""
    from forecastframe_ray.stages.agg import keyed_map_partitions
    from forecastframe_ray.stages.join import broadcast_left_join

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def rank_kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values(["v", "d"], kind="mergesort").copy()
            g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
            outs.append(g)
        return pd.concat(outs, ignore_index=True)

    ranked = keyed_map_partitions(daily, ["event_type"], rank_kernel,
                                  num_partitions=_NP)
    means = hash_aggregate(ranked, ["rnk"], {"qn_v": ("v", "mean")},
                           num_partitions=4).to_pandas()
    means["qn_v"] = np.round(means["qn_v"].to_numpy(np.float64), 6)
    out = broadcast_left_join(ranked, means, on=["rnk"]).to_pandas()
    out = out[["event_type", "d", "v", "rnk", "qn_v"]]
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_QUANTILE_NORMALIZE_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY v, d) AS rnk
        FROM daily
    ),
    m AS (SELECT rnk, round(avg(v), 6) AS qn_v FROM r GROUP BY 1)
    SELECT event_type, d, v, CAST(r.rnk AS BIGINT) AS rnk, qn_v
    FROM r JOIN m ON r.rnk = m.rnk
"""


def q_state_dwell_time_events(sf_dir: str) -> pd.DataFrame:
    """Time-in-state aggregation (uptime/monitoring semantics): each event
    puts its user INTO the state named by its type until that user's next
    event; dwell = gap to the next event, attributed to the CURRENT type
    (each user's last event has no dwell). Per-user ordering is a
    partition-id shuffle kernel with a vectorized grouped shift — the same
    co-location contract the transition matrix uses — then one tiny merge
    aggregate per state."""
    from forecastframe_ray.keys import partition_ids

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__part"] = partition_ids(b, ["user_id"], _NP)
        return b

    def dwell(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts"], kind="mergesort").copy()
        part["__t"] = part["ts"].astype("datetime64[us]").astype("int64")
        nxt = part.groupby("user_id", sort=False)["__t"].shift(-1)
        ok = nxt.notna()
        dw = (nxt[ok].to_numpy(np.float64)
              - part["__t"][ok].to_numpy(np.float64)) / 1e6
        sub = pd.DataFrame({"event_type": part["event_type"][ok],
                            "dw": dw,
                            "one": np.ones(int(ok.sum()), dtype=np.int64)})
        return (sub.groupby("event_type", sort=False)
                .agg(n=("one", "sum"), sum_dw=("dw", "sum"),
                     max_dw=("dw", "max")).reset_index())

    partial = (ev.map_batches(assign, batch_format="pandas")
               .groupby("__part").map_groups(dwell, batch_format="pandas"))
    out = hash_aggregate(partial, ["event_type"],
                         {"n": ("n", "sum"), "sum_dw": ("sum_dw", "sum"),
                          "max_dw": ("max_dw", "max")},
                         num_partitions=4).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out["mean_dw_s"] = out["sum_dw"] / out["n"]
    out = _round(out[["event_type", "n", "mean_dw_s", "max_dw"]],
                 ["mean_dw_s", "max_dw"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_STATE_DWELL_TIME = """
    WITH g AS (
        SELECT event_type,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
                - epoch_us(ts)) / 1e6 AS dw
        FROM events
    )
    SELECT event_type, CAST(count(dw) AS BIGINT) AS n,
           round(sum(dw) / count(dw), 6) AS mean_dw_s,
           round(max(dw), 6) AS max_dw
    FROM g WHERE dw IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def q_ols_price_quantity_brand(sf_dir: str) -> pd.DataFrame:
    """Grouped bivariate OLS (price-elasticity audit): per part BRAND,
    regress quantity on extended price across lineitems — slope, intercept
    and Pearson r from the five streaming moments (n, Σx, Σy, Σxy, Σx²,
    Σy²). The brand lookup is a broadcast dim join (part is the small
    side); the moments pre-reduce per batch so the exchange carries one
    row per (brand, partial). Oracle uses regr_slope/regr_intercept/corr."""
    from forecastframe_ray.stages.join import broadcast_left_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"]).to_pandas() \
        .rename(columns={"p_partkey": "l_partkey"})
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])
    joined = broadcast_left_join(li, part, on=["l_partkey"])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_extendedprice"].to_numpy(np.float64)
        y = b["l_quantity"].to_numpy(np.float64)
        g = pd.DataFrame({"p_brand": b["p_brand"], "x": x, "y": y,
                          "xy": x * y, "x2": x * x, "y2": y * y,
                          "one": np.ones(len(b), dtype=np.int64)})
        return (g.groupby("p_brand", sort=False)
                .agg(n=("one", "sum"), sx=("x", "sum"), sy=("y", "sum"),
                     sxy=("xy", "sum"), sx2=("x2", "sum"),
                     sy2=("y2", "sum")).reset_index())

    agg = hash_aggregate(joined.map_batches(moments, batch_format="pandas"),
                         ["p_brand"],
                         {"n": ("n", "sum"), "sx": ("sx", "sum"),
                          "sy": ("sy", "sum"), "sxy": ("sxy", "sum"),
                          "sx2": ("sx2", "sum"), "sy2": ("sy2", "sum")},
                         num_partitions=4).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    sx, sy = agg["sx"].to_numpy(np.float64), agg["sy"].to_numpy(np.float64)
    sxy = agg["sxy"].to_numpy(np.float64)
    sx2, sy2 = agg["sx2"].to_numpy(np.float64), agg["sy2"].to_numpy(np.float64)
    cov = sxy - sx * sy / n
    vx = sx2 - sx * sx / n
    vy = sy2 - sy * sy / n
    slope = cov / vx
    out = pd.DataFrame({
        "p_brand": agg["p_brand"],
        "n": agg["n"].astype(np.int64),
        "slope": np.round(slope, 9) + 0.0,
        "intercept": np.round(sy / n - slope * sx / n, 6) + 0.0,
        "r": np.round(cov / np.sqrt(vx * vy), 6) + 0.0})
    return out.sort_values("p_brand").reset_index(drop=True)


SQL_OLS_PRICE_QUANTITY = """
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(l_quantity, l_extendedprice), 9) + 0.0 AS slope,
           round(regr_intercept(l_quantity, l_extendedprice), 6) + 0.0
               AS intercept,
           round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS r
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier survival / Sharpe drift ratio / id-sequence gap audit
# ---------------------------------------------------------------------------

def q_kaplan_meier_users(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier survival estimator (1958) over user lifetimes: lifetime
    = whole days between a user's first and last event; a user whose last
    event falls within 7 days of corpus end is CENSORED (still alive at
    their observed lifetime), otherwise their lifetime is a death. S(t)
    steps down only at death times: S = Π(1 − d_i/n_i) over ordered
    distinct lifetimes. Distribution: per-user (min,max) is one hash
    aggregate; lifetimes then reduce to (t, deaths, total) rows bounded by
    the CALENDAR (whole days), and only that tiny table reaches the driver
    for the ordered product."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    span = hash_aggregate(ev, ["user_id"],
                          {"first_ts": ("ts", "min"),
                           "last_ts": ("ts", "max")},
                          num_partitions=_NP)
    end = ev.map_batches(lambda b: pd.DataFrame({"m": [b["ts"].max()]}),
                         batch_format="pandas").to_pandas()["m"].max()
    cutoff = end - pd.Timedelta(days=7)

    def life(b: pd.DataFrame) -> pd.DataFrame:
        t = ((b["last_ts"].astype("datetime64[us]").astype("int64")
              - b["first_ts"].astype("datetime64[us]").astype("int64"))
             // DAY_US).astype(np.int64)
        return pd.DataFrame({
            "t": t,
            "death": (b["last_ts"] <= cutoff).astype(np.int64),
            "one": np.ones(len(b), dtype=np.int64)})

    tab = hash_aggregate(span.map_batches(life, batch_format="pandas"),
                         ["t"], {"d": ("death", "sum"), "c": ("one", "sum")},
                         num_partitions=4).to_pandas().sort_values("t")
    total = int(tab["c"].sum())
    at_risk = total - np.concatenate([[0], np.cumsum(tab["c"].to_numpy())[:-1]])
    surv = np.cumprod(1.0 - tab["d"].to_numpy(np.float64) / at_risk)
    out = pd.DataFrame({
        "t_days": tab["t"].astype(np.int64).to_numpy(),
        "n_at_risk": at_risk.astype(np.int64),
        "n_deaths": tab["d"].astype(np.int64).to_numpy(),
        "survival": np.round(surv, 6) + 0.0})
    return out.reset_index(drop=True)


SQL_KAPLAN_MEIER = """
    WITH u AS (
        SELECT user_id, min(ts) AS f, max(ts) AS l FROM events GROUP BY 1
    ),
    ce AS (SELECT max(ts) AS e FROM events),
    lt AS (
        SELECT (epoch_us(l) - epoch_us(f)) // 86400000000 AS t,
               CASE WHEN l <= (SELECT e - INTERVAL 7 DAY FROM ce)
                    THEN 1 ELSE 0 END AS death
        FROM u
    ),
    tab AS (SELECT t, sum(death) AS d, count(*) AS c FROM lt GROUP BY 1),
    r AS (
        SELECT t, d, c,
               (SELECT count(*) FROM lt) - COALESCE(
                   sum(c) OVER (ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS n_at_risk
        FROM tab
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_deaths,
           round(product(1.0 - d / n_at_risk) OVER (ORDER BY t), 6) + 0.0
               AS survival
    FROM r ORDER BY t
"""


def q_sharpe_daily_events(sf_dir: str) -> pd.DataFrame:
    """Annualized Sharpe-style drift ratio per daily series, on ABSOLUTE
    day-over-day moves (the daily sums cross zero, so relative returns are
    ill-posed): √365 · mean(Δv) / std(Δv, ddof=1). One co-located kernel
    per series; oracle is avg/stddev_samp over the lagged difference."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            dv = g["v"].diff().dropna().to_numpy(np.float64)
            if len(dv) < 2 or dv.std(ddof=1) == 0:
                rows.append((et, len(dv), np.nan))
                continue
            rows.append((et, len(dv),
                         np.round(np.sqrt(365.0) * dv.mean()
                                  / dv.std(ddof=1), 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_moves",
                                           "sharpe"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_moves"] = out["n_moves"].astype(np.int64)
    out = _fill(out, ["sharpe"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_SHARPE_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    mv AS (
        SELECT event_type,
               v - LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS dv
        FROM daily
    )
    SELECT event_type, CAST(count(dv) AS BIGINT) AS n_moves,
           COALESCE(round(sqrt(365.0) * avg(dv) / stddev_samp(dv), 6) + 0.0,
                    {NULLF}) AS sharpe
    FROM mv WHERE dv IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def q_id_gaps_events(sf_dir: str) -> pd.DataFrame:
    """Sequence-integrity audit: the 50 largest runs of MISSING event_ids
    within the 'click' stream (gaps between consecutive observed ids),
    largest-first then by position. Distributed as monotone id-range
    partitions: each partition emits its INTERNAL gaps vectorized plus its
    (min,max) — cross-partition boundary gaps fold on the driver from P
    tiny rows, so no global sort happens. Top-50 is a per-partition
    partial + driver merge."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_id", "event_type"])
    clicks = ev.map_batches(
        lambda b: b.loc[b["event_type"] == "click", ["event_id"]],
        batch_format="pandas")
    n_total = int(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)
    P = _NP

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__rng"] = (b["event_id"].to_numpy(np.int64) * P
                      // max(n_total, 1)).clip(0, P - 1)
        return b

    def local(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rng, g in part.groupby("__rng", sort=False):
            ids = np.sort(g["event_id"].to_numpy(np.int64))
            d = np.diff(ids)
            at = np.nonzero(d > 1)[0]
            for i in at:
                rows.append((int(rng), int(ids[i] + 1), int(ids[i + 1] - 1),
                             0))
            rows.append((int(rng), int(ids[0]), int(ids[-1]), 1))
        return pd.DataFrame(rows, columns=["__rng", "a", "b", "is_span"])

    parts = keyed_map_partitions(clicks.map_batches(assign,
                                                    batch_format="pandas"),
                                 ["__rng"], local,
                                 num_partitions=P).to_pandas()
    gaps = parts[parts["is_span"] == 0][["a", "b"]].copy()
    spans = parts[parts["is_span"] == 1].sort_values("__rng")
    # boundary gaps between consecutive non-empty partitions
    brows = []
    prev_max = None
    for _, r in spans.iterrows():
        if prev_max is not None and r["a"] > prev_max + 1:
            brows.append((prev_max + 1, r["a"] - 1))
        prev_max = r["b"]
    if brows:
        gaps = pd.concat([gaps, pd.DataFrame(brows, columns=["a", "b"])],
                         ignore_index=True)
    gaps["gap_len"] = (gaps["b"] - gaps["a"] + 1).astype(np.int64)
    out = gaps.sort_values(["gap_len", "a"], ascending=[False, True]) \
        .head(50)[["a", "b", "gap_len"]].astype(np.int64)
    return out.rename(columns={"a": "gap_start", "b": "gap_end"}) \
        .reset_index(drop=True)


SQL_ID_GAPS = """
    WITH c AS (
        SELECT event_id,
               LAG(event_id) OVER (ORDER BY event_id) AS prev_id
        FROM events WHERE event_type = 'click'
    )
    SELECT CAST(prev_id + 1 AS BIGINT) AS gap_start,
           CAST(event_id - 1 AS BIGINT) AS gap_end,
           CAST(event_id - prev_id - 1 AS BIGINT) AS gap_len
    FROM c WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
    ORDER BY gap_len DESC, gap_start LIMIT 50
"""


# ---------------------------------------------------------------------------
# quadratic trend / zero-floored stock balance / weekday seasonal adjustment
# ---------------------------------------------------------------------------

def q_quadratic_trend_daily(sf_dir: str) -> pd.DataFrame:
    """Degree-2 polynomial trend per daily series, fit EXACTLY by Cramer's
    rule on the normal equations — six moment sums (n, Σt, Σt², Σt³, Σt⁴,
    Σv, Σvt, Σvt²) fully determine (a,b,c), so both engines evaluate the
    same closed form and the oracle needs no linear-algebra library.
    t = whole days since each series' first day (keeps the moments small).
    Moments pre-reduce per batch; one row per (series, partial) crosses."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            t = ((g["d"].astype("datetime64[us]").astype("int64")
                  - g["d"].astype("datetime64[us]").astype("int64").min())
                 // DAY_US).to_numpy(np.float64)
            v = g["v"].to_numpy(np.float64)
            n = float(len(v))
            s1, s2, s3, s4 = (t.sum(), (t**2).sum(), (t**3).sum(),
                              (t**4).sum())
            b0, b1, b2 = v.sum(), (v*t).sum(), (v*t*t).sum()
            A = np.array([[n, s1, s2], [s1, s2, s3], [s2, s3, s4]])
            det = np.linalg.det(A)
            if abs(det) < 1e-9:
                rows.append((et, int(n), np.nan, np.nan, np.nan))
                continue
            def rep(col, bv=np.array([b0, b1, b2])):
                M = A.copy(); M[:, col] = bv
                return np.linalg.det(M)
            a, b, c = rep(0) / det, rep(1) / det, rep(2) / det
            rows.append((et, int(n), np.round(a, 6) + 0.0,
                         np.round(b, 6) + 0.0, np.round(c, 8) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "coef_a", "coef_b", "coef_c"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["coef_a", "coef_b", "coef_c"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_QUADRATIC_TREND = f"""
    WITH daily AS ({_DAILY_SQL}),
    tt AS (
        SELECT event_type, v,
               CAST(datediff('day',
                    min(d) OVER (PARTITION BY event_type), d) AS DOUBLE)
                   AS t
        FROM daily
    ),
    m AS (
        SELECT event_type, count(*)::DOUBLE AS n, sum(t) AS s1,
               sum(t*t) AS s2, sum(t*t*t) AS s3, sum(t*t*t*t) AS s4,
               sum(v) AS b0, sum(v*t) AS b1, sum(v*t*t) AS b2
        FROM tt GROUP BY 1
    ),
    dets AS (
        SELECT event_type, n,
               n*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2)
                   AS det,
               b0*(s2*s4 - s3*s3) - s1*(b1*s4 - s3*b2)
                   + s2*(b1*s3 - s2*b2) AS det_a,
               n*(b1*s4 - b2*s3) - b0*(s1*s4 - s3*s2)
                   + s2*(s1*b2 - s2*b1) AS det_b,
               n*(s2*b2 - s3*b1) - s1*(s1*b2 - b1*s2)
                   + b0*(s1*s3 - s2*s2) AS det_c
        FROM m
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN abs(det) >= 1e-9
                         THEN round(det_a / det, 6) + 0.0 END, {NULLF})
               AS coef_a,
           COALESCE(CASE WHEN abs(det) >= 1e-9
                         THEN round(det_b / det, 6) + 0.0 END, {NULLF})
               AS coef_b,
           COALESCE(CASE WHEN abs(det) >= 1e-9
                         THEN round(det_c / det, 8) + 0.0 END, {NULLF})
               AS coef_c
    FROM dets ORDER BY 1
"""


def q_stock_balance_daily(sf_dir: str) -> pd.DataFrame:
    """Zero-floored running balance (inventory semantics: demand can't
    drive stock negative): S_t = max(0, S_{t−1} + Δv_t). The recursion is
    NOT a prefix sum, but has the exact closed form
    S_t = P_t − min(0, min_{j≤t} P_j) with P the plain cumsum — which IS
    window-expressible, so the oracle needs no recursion and the kernel
    stays one vectorized pass. Flows are the day-over-day moves of the
    daily series (first day flows its own value)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            v = g["v"].to_numpy(np.float64)
            flow = np.diff(v, prepend=0.0)
            flow[0] = v[0]
            P = np.cumsum(flow)
            runmin = np.minimum.accumulate(P)
            bal = P - np.minimum(runmin, 0.0)
            outs.append(pd.DataFrame({
                "event_type": g["event_type"], "d": g["d"],
                "flow": np.round(flow, 6) + 0.0,
                "balance": np.round(bal, 6) + 0.0}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "flow", "balance"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_STOCK_BALANCE = f"""
    WITH daily AS ({_DAILY_SQL}),
    f AS (
        SELECT event_type, d,
               COALESCE(v - LAG(v) OVER w, v) AS flow
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    p AS (
        SELECT event_type, d, flow,
               sum(flow) OVER w2 AS cum
        FROM f WINDOW w2 AS (PARTITION BY event_type ORDER BY d
                             ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, d, round(flow, 6) + 0.0 AS flow,
           round(cum - least(min(cum) OVER w2, 0), 6) + 0.0 AS balance
    FROM p WINDOW w2 AS (PARTITION BY event_type ORDER BY d
                         ROWS UNBOUNDED PRECEDING)
"""


def q_weekday_adjust_daily(sf_dir: str) -> pd.DataFrame:
    """Weekday seasonal ADJUSTMENT (not just the profile): per series,
    v_adj = v − mean(v | same weekday) + mean(v) — removes the day-of-week
    effect while preserving the level. Both factor means are per-series
    aggregates computed inside one co-located kernel (grouped transform,
    no second shuffle); the oracle is two nested window averages."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy()
        part["dow"] = part["d"].dt.dayofweek.astype(np.int64)
        g = part.groupby("event_type", sort=False)
        grand = g["v"].transform("mean")
        dowm = part.groupby(["event_type", "dow"], sort=False)["v"] \
            .transform("mean")
        part["v_adj"] = np.round(
            part["v"].to_numpy(np.float64) - dowm.to_numpy(np.float64)
            + grand.to_numpy(np.float64), 6) + 0.0
        return part[["event_type", "d", "v", "v_adj"]]

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_WEEKDAY_ADJUST = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           round(v - avg(v) OVER (PARTITION BY event_type, isodow(d))
                   + avg(v) OVER (PARTITION BY event_type), 6) + 0.0
               AS v_adj
    FROM daily
"""


# ---------------------------------------------------------------------------
# AR(1) fit / partial-pooling shrinkage / exponential inter-arrival KS
# ---------------------------------------------------------------------------

def q_ar1_forecast_daily(sf_dir: str) -> pd.DataFrame:
    """Exact AR(1)-with-intercept fit per daily series: OLS of v_t on
    v_{t-1} (phi = Σ(x−x̄)(y−ȳ)/Σ(x−x̄)², c = ȳ − φx̄ — the same closed
    form DuckDB's regr_slope/regr_intercept evaluate), plus the one-step
    forecast c + φ·v_T. Pairs are formed inside the co-located partition
    kernel; only (series, 4 floats) rows cross the exchange."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            if len(v) < 3:
                rows.append((et, max(len(v) - 1, 0), np.nan, np.nan, np.nan))
                continue
            x, y = v[:-1], v[1:]
            xm, ym = x.mean(), y.mean()
            sxx = ((x - xm) ** 2).sum()
            if sxx < 1e-12:
                rows.append((et, len(x), np.nan, np.nan, np.nan))
                continue
            phi = ((x - xm) * (y - ym)).sum() / sxx
            c = ym - phi * xm
            rows.append((et, len(x), np.round(phi, 6) + 0.0,
                         np.round(c, 6) + 0.0,
                         np.round(c + phi * v[-1], 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_pairs", "phi",
                                           "intercept", "next_forecast"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    out = _fill(out, ["phi", "intercept", "next_forecast"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_AR1_FORECAST = f"""
    WITH daily AS ({_DAILY_SQL}),
    p AS (
        SELECT event_type, v,
               LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS x
        FROM daily
    ),
    fit AS (
        SELECT event_type, count(*) AS n_pairs,
               regr_slope(v, x) AS phi, regr_intercept(v, x) AS c
        FROM p WHERE x IS NOT NULL GROUP BY 1
    ),
    last AS (SELECT event_type, arg_max(v, d) AS v_last FROM daily GROUP BY 1)
    SELECT f.event_type, CAST(f.n_pairs AS BIGINT) AS n_pairs,
           COALESCE(CASE WHEN f.n_pairs >= 2
                         THEN round(f.phi, 6) + 0.0 END, {NULLF}) AS phi,
           COALESCE(CASE WHEN f.n_pairs >= 2
                         THEN round(f.c, 6) + 0.0 END, {NULLF}) AS intercept,
           COALESCE(CASE WHEN f.n_pairs >= 2
                         THEN round(f.c + f.phi * l.v_last, 6) + 0.0 END,
                    {NULLF}) AS next_forecast
    FROM fit f JOIN last l USING (event_type) ORDER BY 1
"""


def q_pooled_shrinkage_daily(sf_dir: str) -> pd.DataFrame:
    """Empirical-Bayes partial pooling of per-series daily means toward the
    grand mean (one-way random-effects shrinkage, cf. Gelman & Hill ch. 12):
    τ² = max(0, var(m_i) − s²_pooled·mean(1/n_i)) by method of moments,
    shrink_i = τ²/(τ² + s²_pooled/n_i), m̃_i = gm + shrink_i·(m_i − gm).
    Engine side: one map-side (n, Σv, Σv²) combine per series — the k-row
    moment table is the only thing that leaves the cluster."""
    ev = _bucket_series(sf_dir, DAY_US, "d")

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["v2"] = b["v"].to_numpy(np.float64) ** 2
        b["n"] = 1.0
        return b[["event_type", "n", "v", "v2"]]

    agg = hash_aggregate(ev.map_batches(moments, batch_format="pandas"),
                         ["event_type"],
                         {"n": ("n", "sum"), "s": ("v", "sum"),
                          "ss": ("v2", "sum")}, num_partitions=_NP)
    g = agg.to_pandas().sort_values("event_type").reset_index(drop=True)
    n = g["n"].to_numpy(np.float64)
    m = g["s"].to_numpy(np.float64) / n
    s2 = (g["ss"].to_numpy(np.float64) - n * m * m) / (n - 1.0)
    gm = m.mean()
    vb = m.var(ddof=1)
    s2p = ((n - 1.0) * s2).sum() / (n.sum() - len(n))
    tau2 = max(0.0, vb - s2p * (1.0 / n).mean())
    shrink = tau2 / (tau2 + s2p / n)
    return pd.DataFrame({
        "event_type": g["event_type"],
        "n_days": n.astype(np.int64),
        "mean_raw": np.round(m, 6) + 0.0,
        "shrink": np.round(shrink, 6) + 0.0,
        "mean_shrunk": np.round(gm + shrink * (m - gm), 6) + 0.0,
    })


SQL_POOLED_SHRINKAGE = f"""
    WITH daily AS ({_DAILY_SQL}),
    g AS (
        SELECT event_type, count(*)::DOUBLE AS n, avg(v) AS m,
               var_samp(v) AS s2
        FROM daily GROUP BY 1
    ),
    t AS (
        SELECT avg(m) AS gm, var_samp(m) AS vb,
               sum((n - 1) * s2) / (sum(n) - count(*)) AS s2p,
               avg(1.0 / n) AS inv
        FROM g
    ),
    t2 AS (SELECT gm, s2p, greatest(0, vb - s2p * inv) AS tau2 FROM t)
    SELECT g.event_type, CAST(g.n AS BIGINT) AS n_days,
           round(g.m, 6) + 0.0 AS mean_raw,
           round(t2.tau2 / (t2.tau2 + t2.s2p / g.n), 6) + 0.0 AS shrink,
           round(t2.gm + (g.m - t2.gm) * t2.tau2
                 / (t2.tau2 + t2.s2p / g.n), 6) + 0.0 AS mean_shrunk
    FROM g CROSS JOIN t2 ORDER BY 1
"""


def q_interarrival_expfit_events(sf_dir: str) -> pd.DataFrame:
    """Exponential inter-arrival fit + Kolmogorov-Smirnov goodness-of-fit
    per event type: gaps g_i between consecutive events (ordered by
    (ts, event_id)), MLE mean = avg(g) (rounded to 6 so both engines
    evaluate the SAME fitted CDF), and the one-sample KS statistic
    D = max_i max(i/n − F(g_(i)), F(g_(i)) − (i−1)/n) against
    F(g) = 1 − exp(−g/mean). Sorting happens inside the co-located
    partition; one row per type crosses."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "ts", "event_id"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values(["ts", "event_id"])
            us = g["ts"].astype("int64").to_numpy()
            if len(us) < 2:
                rows.append((et, 0, np.nan, np.nan))
                continue
            gaps = np.diff(us) / 1e6
            mg = np.round(gaps.mean(), 6) + 0.0
            gs = np.sort(gaps)
            nn = float(len(gs))
            rn = np.arange(1, len(gs) + 1, dtype=np.float64)
            F = 1.0 - np.exp(-gs / mg)
            ks = np.maximum(rn / nn - F, F - (rn - 1.0) / nn).max()
            rows.append((et, len(gs), mg, np.round(ks, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                           "mean_gap_s", "ks_stat"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_gaps"] = out["n_gaps"].astype(np.int64)
    out = _fill(out, ["mean_gap_s", "ks_stat"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_INTERARRIVAL_EXPFIT = f"""
    WITH o AS (
        SELECT event_type, ts,
               LAG(ts) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS prev
        FROM events
    ),
    gaps AS (
        SELECT event_type,
               (epoch_us(ts) - epoch_us(prev)) / 1e6 AS g
        FROM o WHERE prev IS NOT NULL
    ),
    m AS (
        SELECT event_type, count(*)::DOUBLE AS n,
               round(avg(g), 6) + 0.0 AS mg
        FROM gaps GROUP BY 1
    ),
    r AS (
        SELECT g.event_type, g.g, m.n, m.mg,
               ROW_NUMBER() OVER (PARTITION BY g.event_type
                                  ORDER BY g.g) AS rn
        FROM gaps g JOIN m USING (event_type)
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps, mg AS mean_gap_s,
           round(max(greatest(rn / n - (1 - exp(-g / mg)),
                              (1 - exp(-g / mg)) - (rn - 1) / n)), 6) + 0.0
               AS ks_stat
    FROM r GROUP BY event_type, n, mg ORDER BY 1
"""


# ---------------------------------------------------------------------------
# lexical richness / Good-Turing spectrum / per-doc word entropy
# ---------------------------------------------------------------------------

def q_lexical_richness_documents(sf_dir: str) -> pd.DataFrame:
    """Lexical-richness profile per source over whitespace tokens: token
    count N, type count V, hapax ratio V1/V, Simpson's repeat index
    D = Σc(c−1)/(N(N−1)) and Yule's K = 10⁴·(Σc² − N)/N². Every sum is an
    INTEGER over the (source, token) count table (one map-side partial +
    one coarse-hash merge), so both engines divide identical integers —
    only the final ratios are float."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[["source"]].copy()
        ex["tok"] = b["text"].str.split()
        ex = ex.explode("tok").dropna(subset=["tok"])
        vc = ex.groupby(["source", "tok"], sort=False).size()
        out = vc.rename("cnt").reset_index()
        return out.rename(columns={"tok": "token"})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["source", "token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP)

    def spectrum(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": b["source"], "n": c, "v": np.ones_like(c),
            "v1": (c == 1).astype(np.int64), "c2": c * c,
            "cc1": c * (c - 1)})

    s = hash_aggregate(tc.map_batches(spectrum, batch_format="pandas"),
                       ["source"],
                       {"n": ("n", "sum"), "v": ("v", "sum"),
                        "v1": ("v1", "sum"), "c2": ("c2", "sum"),
                        "cc1": ("cc1", "sum")},
                       num_partitions=_NP).to_pandas()
    s = s.sort_values("source").reset_index(drop=True)
    n = s["n"].to_numpy(np.float64)
    return pd.DataFrame({
        "source": s["source"],
        "n_tokens": s["n"].astype(np.int64),
        "n_types": s["v"].astype(np.int64),
        "hapax_ratio": np.round(s["v1"].to_numpy(np.float64)
                                / s["v"].to_numpy(np.float64), 6) + 0.0,
        "simpson_d": np.round(s["cc1"].to_numpy(np.float64)
                              / (n * (n - 1.0)), 6) + 0.0,
        "yule_k": np.round(1e4 * (s["c2"].to_numpy(np.float64) - n)
                           / (n * n), 6) + 0.0,
    })


SQL_LEXICAL_RICHNESS = r"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
    s AS (
      SELECT source, sum(c) AS n, count(*) AS v,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS v1,
             sum(c * c) AS c2, sum(c * (c - 1)) AS cc1
      FROM tc GROUP BY 1
    )
    SELECT source, CAST(n AS BIGINT) AS n_tokens, CAST(v AS BIGINT) AS n_types,
           round(v1 * 1.0 / v, 6) + 0.0 AS hapax_ratio,
           round(cc1 * 1.0 / (n * (n - 1.0)), 6) + 0.0 AS simpson_d,
           round(1e4 * (c2 - n) / (n * n * 1.0), 6) + 0.0 AS yule_k
    FROM s ORDER BY 1
"""


def q_good_turing_documents(sf_dir: str) -> pd.DataFrame:
    """Good-Turing frequency-of-frequencies over the corpus vocabulary:
    N_r = number of token types seen exactly r times (r = 1..10) and the
    adjusted count r* = (r+1)·N_{r+1}/N_r (Gale & Sampson's unsmoothed
    estimator; NULLF where N_{r+1} is absent). The spectrum is two chained
    integer count-aggregates — no floats until the final ratio."""
    docs = _read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["text"].str.split().explode().dropna().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "cnt": vc.to_numpy(np.int64)})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP)

    def to_r(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"r": b["c"].astype(np.int64), "one": 1})

    ff = hash_aggregate(tc.map_batches(to_r, batch_format="pandas"),
                        ["r"], {"nr": ("one", "sum")},
                        num_partitions=_NP).to_pandas()
    ff = ff.set_index("r")["nr"]
    rows = []
    for r in range(1, 11):
        nr = int(ff.get(r, 0))
        nr1 = int(ff.get(r + 1, 0))
        rstar = (np.round((r + 1.0) * nr1 / nr, 6) + 0.0
                 if nr > 0 and nr1 > 0 else NULLF)
        rows.append((r, nr, rstar))
    return pd.DataFrame(rows, columns=["r", "n_r", "r_star"]) \
        .astype({"r": np.int64, "n_r": np.int64})


SQL_GOOD_TURING = rf"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
    ff AS (SELECT c AS r, count(*) AS nr FROM tc GROUP BY 1),
    grid AS (SELECT unnest(range(1, 11)) AS r)
    SELECT g.r, CAST(COALESCE(f1.nr, 0) AS BIGINT) AS n_r,
           COALESCE(CASE WHEN f1.nr > 0 AND f2.nr > 0
                         THEN round((g.r + 1.0) * f2.nr / f1.nr, 6) + 0.0
                    END, {NULLF}) AS r_star
    FROM grid g
    LEFT JOIN ff f1 ON f1.r = g.r
    LEFT JOIN ff f2 ON f2.r = g.r + 1
    ORDER BY g.r
"""


def q_word_entropy_documents(sf_dir: str) -> pd.DataFrame:
    """Per-document Shannon word entropy (bits) over whitespace tokens —
    H = log2(n) − (Σ c·log2 c)/n — plus the normalized form H/log2(V)
    (NULLF for single-type or empty docs). Fully per-row parallel: the
    explode/groupby runs inside each batch, nothing shuffles."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[["doc_id"]].copy()
        ex["tok"] = b["text"].str.split()
        ex = ex.explode("tok").dropna(subset=["tok"])
        tc = ex.groupby(["doc_id", "tok"], sort=False).size() \
            .rename("c").reset_index()
        c = tc["c"].to_numpy(np.float64)
        tc["clc"] = c * np.log2(c)
        g = tc.groupby("doc_id", sort=False)
        agg = pd.DataFrame({"n": g["c"].sum(), "v": g["c"].size(),
                            "slc": g["clc"].sum()}).reset_index()
        out = b[["doc_id"]].merge(agg, on="doc_id", how="left")
        n = out["n"].fillna(0).to_numpy(np.float64)
        v = out["v"].fillna(0).to_numpy(np.float64)
        slc = out["slc"].fillna(0).to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            h = np.where(n > 0, np.log2(np.maximum(n, 1.0)) - slc
                         / np.maximum(n, 1.0), np.nan)
            hn = np.where(v > 1, h / np.log2(np.maximum(v, 2.0)), np.nan)
        return pd.DataFrame({
            "doc_id": out["doc_id"],
            "n_tokens": n.astype(np.int64),
            "n_types": v.astype(np.int64),
            "entropy_bits": np.where(np.isnan(h), NULLF,
                                     np.round(h, 6) + 0.0),
            "norm_entropy": np.where(np.isnan(hn), NULLF,
                                     np.round(hn, 6) + 0.0),
        })

    out = docs.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_WORD_ENTROPY = rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY 1, 2),
    d AS (
      SELECT doc_id, sum(c) AS n, count(*) AS v,
             sum(c * log2(c)) AS slc
      FROM tc GROUP BY 1
    )
    SELECT doc.doc_id,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(d.v, 0) AS BIGINT) AS n_types,
           COALESCE(CASE WHEN d.n > 0
                         THEN round(log2(d.n) - d.slc / d.n, 6) + 0.0 END,
                    {NULLF}) AS entropy_bits,
           COALESCE(CASE WHEN d.v > 1
                         THEN round((log2(d.n) - d.slc / d.n)
                                    / log2(d.v), 6) + 0.0 END,
                    {NULLF}) AS norm_entropy
    FROM documents doc LEFT JOIN d USING (doc_id)
    ORDER BY doc.doc_id
"""


# ---------------------------------------------------------------------------
# HyperLogLog gate / variance F-test / cross-sectional z-score
# ---------------------------------------------------------------------------

def q_hll_distinct_gate(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog accuracy gate (distinct_users_kmv_gate pattern): the
    p=12 (4096-register, σ≈1.6%) HLL estimate of distinct users per event
    type must land within 5% (≈3σ) of exact; ``n_exact`` comes from the
    engine's exact-regime KMV sketch and is value-oracled against
    count(DISTINCT). Exercises stages/sketch.py's second mergeable
    distinct carry — fixed 4 KB per group vs KMV's 8·k bytes."""
    from forecastframe_ray.stages.sketch import distinct_sketch, hll_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    est = hll_distinct(ev, ["event_type"], "user_id",
                       p=12, num_partitions=8).to_pandas()
    exact = distinct_sketch(ev, ["event_type"], "user_id",
                            k=4096, num_partitions=8).to_pandas()
    assert bool(exact["is_exact"].all())
    out = exact[["event_type"]].copy()
    out["n_exact"] = exact["distinct_est"].astype("int64")
    rel_err = np.abs(est.set_index("event_type").loc[
        out["event_type"], "distinct_est"].to_numpy()
        - out["n_exact"].to_numpy()) / out["n_exact"].to_numpy()
    out["err_ok"] = rel_err <= 0.05
    return out.sort_values("event_type").reset_index(drop=True)


SQL_HLL_DISTINCT_GATE = """
    SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS err_ok
    FROM events GROUP BY 1 ORDER BY 1
"""


def q_variance_ftest_daily(sf_dir: str) -> pd.DataFrame:
    """Two-sample variance F-test between the first and second time-halves
    of each daily series (heteroscedasticity / regime-change screen):
    halves split at row_number ≤ n//2 in day order, F = s₁²/s₂² with
    sample variances. NULLF when either half has < 2 points or s₂² = 0."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n1 = len(v) // 2
            a, b = v[:n1], v[n1:]
            if len(a) < 2 or len(b) < 2:
                rows.append((et, len(a), len(b), np.nan, np.nan, np.nan))
                continue
            v1, v2 = a.var(ddof=1), b.var(ddof=1)
            f = v1 / v2 if v2 > 0 else np.nan
            rows.append((et, len(a), len(b), np.round(v1, 6) + 0.0,
                         np.round(v2, 6) + 0.0,
                         np.round(f, 6) + 0.0 if np.isfinite(f) else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n1", "n2",
                                           "var1", "var2", "f_stat"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["n1", "n2"]] = out[["n1", "n2"]].astype(np.int64)
    out = _fill(out, ["var1", "var2", "f_stat"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_VARIANCE_FTEST = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    h AS (SELECT event_type, v,
                 CASE WHEN rn <= n // 2 THEN 1 ELSE 2 END AS half FROM r),
    a AS (SELECT event_type, half, count(*) AS cnt, var_samp(v) AS s2
          FROM h GROUP BY 1, 2)
    SELECT a1.event_type,
           CAST(a1.cnt AS BIGINT) AS n1, CAST(a2.cnt AS BIGINT) AS n2,
           COALESCE(CASE WHEN a1.cnt >= 2 AND a2.cnt >= 2
                         THEN round(a1.s2, 6) + 0.0 END, {NULLF}) AS var1,
           COALESCE(CASE WHEN a1.cnt >= 2 AND a2.cnt >= 2
                         THEN round(a2.s2, 6) + 0.0 END, {NULLF}) AS var2,
           COALESCE(CASE WHEN a1.cnt >= 2 AND a2.cnt >= 2 AND a2.s2 > 0
                         THEN round(a1.s2 / a2.s2, 6) + 0.0 END, {NULLF})
               AS f_stat
    FROM a a1 JOIN a a2 ON a1.event_type = a2.event_type
                        AND a1.half = 1 AND a2.half = 2
    ORDER BY 1
"""


def q_cross_sectional_zscore_daily(sf_dir: str) -> pd.DataFrame:
    """Cross-sectional standardization: each series' daily value z-scored
    against the SAME-DAY distribution across all series (the feature that
    makes heterogeneous series comparable in pooled models). Day moments
    reduce first (day-cardinality result, broadcast back) — the
    daily_share_events plan shape. NULLF when the day has < 2 series or
    zero dispersion."""
    daily = _bucket_series(sf_dir, DAY_US, "d").materialize()

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["v2"] = b["v"].to_numpy(np.float64) ** 2
        b["n"] = 1.0
        return b[["d", "n", "v", "v2"]]

    stats = hash_aggregate(daily.map_batches(moments, batch_format="pandas"),
                           ["d"], {"n": ("n", "sum"), "s": ("v", "sum"),
                                   "ss": ("v2", "sum")},
                           num_partitions=4).to_pandas()
    n = stats["n"].to_numpy(np.float64)
    m = stats["s"].to_numpy(np.float64) / n
    with np.errstate(invalid="ignore"):
        sd = np.sqrt(np.maximum(
            (stats["ss"].to_numpy(np.float64) - n * m * m) / (n - 1.0), 0.0))
    mean_map = dict(zip(stats["d"], m))
    sd_map = dict(zip(stats["d"], np.where(n >= 2, sd, np.nan)))

    def z(b: pd.DataFrame) -> pd.DataFrame:
        mu = b["d"].map(mean_map).to_numpy(np.float64)
        s = b["d"].map(sd_map).to_numpy(np.float64)
        v = b["v"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            zz = np.where(s > 0, np.round((v - mu) / s, 6) + 0.0, np.nan)
        return pd.DataFrame({"event_type": b["event_type"], "d": b["d"],
                             "v": b["v"], "z_cs": zz})

    out = daily.map_batches(z, batch_format="pandas").to_pandas()
    out = _fill(out, ["z_cs"])
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_CROSS_SECTIONAL_ZSCORE = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, d, v,
           COALESCE(CASE WHEN count(*) OVER w >= 2
                          AND stddev_samp(v) OVER w > 0
                         THEN round((v - avg(v) OVER w)
                                    / stddev_samp(v) OVER w, 6) + 0.0 END,
                    {NULLF}) AS z_cs
    FROM daily WINDOW w AS (PARTITION BY d)
"""


# ---------------------------------------------------------------------------
# bigram LM perplexity / dominant ACF period / holiday-distance calendar
# ---------------------------------------------------------------------------

def q_bigram_perplexity_documents(sf_dir: str) -> pd.DataFrame:
    """Per-doc perplexity under the corpus's add-one-smoothed bigram LM
    (pipelines/tfidf.bigram_doc_logprob) — the quality-filter signal CCNet
    computes with an external LM, here self-trained so it stays
    SQL-oracle-able end to end."""
    from forecastframe_ray.pipelines.tfidf import bigram_doc_logprob

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = bigram_doc_logprob(docs, num_partitions=_NP).to_pandas()
    out = out.astype({"doc_id": "int64", "n_bigrams": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_BIGRAM_PERPLEXITY = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ),
    dbg AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
    cb AS (SELECT w1, w2, sum(tf) AS c FROM dbg GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(tf) AS n1 FROM dbg GROUP BY 1),
    vocab AS (
      SELECT count(DISTINCT token) AS v
      FROM (SELECT unnest(t) AS token FROM toks)
    ),
    sc AS (
      SELECT dbg.doc_id,
             sum(dbg.tf * ln((cb.c + 1.0) / (c1.n1 + vocab.v))) AS s,
             sum(dbg.tf) AS m
      FROM dbg JOIN cb USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
      GROUP BY 1
    )
    SELECT doc_id, CAST(m AS BIGINT) AS n_bigrams,
           round(s / m, 6) + 0.0 AS lm_logprob,
           round(exp(-s / m), 6) + 0.0 AS perplexity
    FROM sc ORDER BY doc_id
"""


def q_dominant_period_daily(sf_dir: str) -> pd.DataFrame:
    """Dominant seasonal period per series: the lag k ∈ [2, 10] maximizing
    the sample ACF r_k = Σ_{t>k}(v_t−v̄)(v_{t−k}−v̄) / Σ(v_t−v̄)² — the
    autodetect step before seasonal models pick their period. Argmax is
    taken over r_k ROUNDED to 6 (tie → smallest k) so both engines rank
    identical values."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            dv = v - v.mean()
            den = (dv ** 2).sum()
            best_k, best_r = None, None
            for k in range(2, 11):
                if len(v) <= k or den <= 0:
                    continue
                r = np.round((dv[k:] * dv[:-k]).sum() / den, 6) + 0.0
                if best_r is None or r > best_r:
                    best_k, best_r = k, r
            if best_k is None:
                rows.append((et, 0, np.nan))
            else:
                rows.append((et, best_k, best_r))
        return pd.DataFrame(rows, columns=["event_type", "best_lag",
                                           "best_acf"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["best_lag"] = out["best_lag"].astype(np.int64)
    out = _fill(out, ["best_acf"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DOMINANT_PERIOD = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu FROM daily GROUP BY 1),
    r AS (
        SELECT d.event_type, d.v, m.mu,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.d) AS rn
        FROM daily d JOIN m USING (event_type)
    ),
    den AS (SELECT event_type, sum((v - mu) * (v - mu)) AS den
            FROM r GROUP BY 1),
    ks AS (SELECT unnest(range(2, 11)) AS k),
    acf AS (
        SELECT a.event_type, ks.k,
               round(sum((a.v - a.mu) * (b.v - b.mu)) / any_value(den.den),
                     6) + 0.0 AS rk
        FROM ks, r a
        JOIN r b ON a.event_type = b.event_type AND a.rn = b.rn + ks.k
        JOIN den ON den.event_type = a.event_type
        WHERE den.den > 0
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, k, rk,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY rk DESC, k) AS pos
        FROM acf
    )
    SELECT event_type, CAST(k AS BIGINT) AS best_lag, rk AS best_acf
    FROM ranked WHERE pos = 1 ORDER BY 1
"""


#: fixed civil-holiday list bracketing the testdata window (deterministic —
#: a calendar feature table, not external data)
_HOLIDAYS = ("2024-01-01", "2024-01-15", "2024-02-14", "2024-02-19")


def q_holiday_distance_daily(sf_dir: str) -> pd.DataFrame:
    """Holiday-distance calendar features per (series, day): is_holiday,
    signed days to the NEAREST holiday (negative = holiday is in the past;
    ties to the future one), from a fixed four-date civil list. The classic
    forecastframe-style calendar enrich, vectorized via searchsorted."""
    daily = _bucket_series(sf_dir, DAY_US, "d")
    hol = np.array([pd.Timestamp(h).value // 1000 for h in _HOLIDAYS],
                   dtype=np.int64)  # epoch us

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        us = b["d"].astype("datetime64[us]").astype("int64").to_numpy()
        pos = np.searchsorted(hol, us)
        nxt = hol[np.minimum(pos, len(hol) - 1)]
        prv = hol[np.maximum(pos - 1, 0)]
        d_next = (nxt - us) // DAY_US
        d_prev = (us - prv) // DAY_US
        has_next = pos < len(hol)
        has_prev = pos > 0
        # signed distance to nearest: future positive, past negative
        pick_next = has_next & (~has_prev | (d_next <= d_prev))
        nearest = np.where(pick_next, d_next, -d_prev)
        return pd.DataFrame({
            "event_type": b["event_type"], "d": b["d"], "v": b["v"],
            "is_holiday": nearest == 0,
            "days_to_nearest": nearest.astype(np.int64)})

    out = daily.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


_HOLIDAY_VALUES = ", ".join(f"(DATE '{h}')" for h in _HOLIDAYS)

SQL_HOLIDAY_DISTANCE = f"""
    WITH daily AS ({_DAILY_SQL}),
    hol AS (SELECT * FROM (VALUES {_HOLIDAY_VALUES}) AS t(h)),
    dist AS (
        SELECT d.event_type, d.d, d.v,
               min(CASE WHEN h.h >= d.d
                        THEN datediff('day', CAST(d.d AS DATE), h.h) END)
                   AS d_next,
               min(CASE WHEN h.h < d.d
                        THEN datediff('day', h.h, CAST(d.d AS DATE)) END)
                   AS d_prev
        FROM daily d CROSS JOIN hol h GROUP BY 1, 2, 3
    )
    SELECT event_type, d, v,
           COALESCE(d_next, d_prev + 1) = 0 AS is_holiday,
           CAST(CASE WHEN d_next IS NOT NULL
                      AND (d_prev IS NULL OR d_next <= d_prev)
                     THEN d_next ELSE -d_prev END AS BIGINT)
               AS days_to_nearest
    FROM dist
"""


# ---------------------------------------------------------------------------
# TSB intermittent forecast gate / Hurst R/S exponent / peak-load stats
# ---------------------------------------------------------------------------

def q_tsb_gate_daily(sf_dir: str) -> pd.DataFrame:
    """TSB (Teunter-Syntetos-Babai) forecast, oracle-GATED through the
    α=1, β=½ closed form: with α=1 the size state is the last nonzero
    demand, and the β=½ probability recursion over demand indicators has
    the exact geometric-weight expansion
    p̂ = ½ⁿ⁻¹·I₁ + Σᵢ₌₂ⁿ ½·½ⁿ⁻ⁱ·Iᵢ — which IS window-expressible. The
    intermittent series is the same Mon/Thu/Sat mask the Croston gate
    uses; general (α, β) is pytest-pinned against a direct recursion."""
    from forecastframe_ray.pipelines.search import fit_tsb, score_tsb

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def mask(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        dow = b["d"].dt.dayofweek.to_numpy()
        b["v"] = np.where(np.isin(dow, (0, 3, 5)),
                          b["v"].to_numpy(np.float64), 0.0)
        return b

    masked = daily.map_batches(mask, batch_format="pandas").materialize()
    state = fit_tsb(masked, ["event_type"], "d", "v", alpha=1.0, beta=0.5)
    one = masked.map_batches(
        lambda b: b.drop_duplicates("event_type")[["event_type", "d"]],
        batch_format="pandas")
    scored = score_tsb(one, state, ["event_type"], "d", "v",
                       "tsb_forecast").to_pandas()
    out = scored.drop_duplicates("event_type")[["event_type", "tsb_forecast"]]
    out = _round(out, ["tsb_forecast"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_TSB_GATE = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (
        SELECT event_type, d,
               CASE WHEN (isodow(d) - 1) IN (0, 3, 5) THEN v ELSE 0 END AS v
        FROM daily
    ),
    r AS (
        SELECT event_type, d, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM m
    ),
    p AS (
        SELECT event_type,
               sum(CASE WHEN v <> 0 THEN
                     CASE WHEN rn = 1 THEN power(0.5, n - 1)
                          ELSE 0.5 * power(0.5, n - rn) END
                   ELSE 0 END) AS phat
        FROM r GROUP BY 1
    ),
    z AS (SELECT event_type, arg_max(v, d) AS zhat
          FROM m WHERE v <> 0 GROUP BY 1)
    SELECT p.event_type,
           round(COALESCE(p.phat * z.zhat, 0), 6) + 0.0 AS tsb_forecast
    FROM p LEFT JOIN z USING (event_type) ORDER BY 1
"""


def q_hurst_rs_daily(sf_dir: str) -> pd.DataFrame:
    """Two-scale rescaled-range (R/S) Hurst estimate per series (Hurst
    1951; Mandelbrot & Wallis 1969): R/S of a segment = range of the
    cumulative mean-adjusted sum / sample std; the exponent is
    H = log2(RS_full / mean(RS of the two time-halves)) — >0.5 persistent,
    <0.5 mean-reverting. Segments split at row n//2 like the F-test;
    NULLF when any segment has < 2 points or zero dispersion."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def rs(seg: np.ndarray) -> float:
        if len(seg) < 2:
            return np.nan
        sd = seg.std(ddof=1)
        if sd <= 0:
            return np.nan
        c = np.cumsum(seg - seg.mean())
        return (c.max() - c.min()) / sd

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n1 = len(v) // 2
            rf, r1, r2 = rs(v), rs(v[:n1]), rs(v[n1:])
            if np.isnan(rf) or np.isnan(r1) or np.isnan(r2):
                rows.append((et, np.nan, np.nan, np.nan))
                continue
            half = (r1 + r2) / 2.0
            rows.append((et, np.round(rf, 6) + 0.0,
                         np.round(half, 6) + 0.0,
                         np.round(np.log2(rf / half), 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "rs_full",
                                           "rs_half_mean", "hurst"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = _fill(out, ["rs_full", "rs_half_mean", "hurst"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_HURST_RS = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    segs AS (
        SELECT event_type, d, v, 0 AS seg FROM r
        UNION ALL
        SELECT event_type, d, v,
               CASE WHEN rn <= n // 2 THEN 1 ELSE 2 END AS seg
        FROM r
    ),
    mu AS (SELECT event_type, seg, avg(v) AS mu, stddev_samp(v) AS sd,
                  count(*) AS cnt
           FROM segs GROUP BY 1, 2),
    c AS (
        SELECT s.event_type, s.seg,
               sum(s.v - mu.mu) OVER (PARTITION BY s.event_type, s.seg
                                      ORDER BY s.d
                                      ROWS UNBOUNDED PRECEDING) AS cum
        FROM segs s JOIN mu USING (event_type, seg)
    ),
    rng AS (SELECT event_type, seg, max(cum) - min(cum) AS rng
            FROM c GROUP BY 1, 2),
    rsv AS (
        SELECT r.event_type, r.seg,
               CASE WHEN mu.cnt >= 2 AND mu.sd > 0
                    THEN r.rng / mu.sd END AS rs
        FROM rng r JOIN mu USING (event_type, seg)
    ),
    piv AS (
        SELECT event_type,
               max(CASE WHEN seg = 0 THEN rs END) AS rf,
               avg(CASE WHEN seg IN (1, 2) THEN rs END) AS rh,
               bool_and(rs IS NOT NULL) AS ok
        FROM rsv GROUP BY 1
    )
    SELECT event_type,
           COALESCE(CASE WHEN ok THEN round(rf, 6) + 0.0 END, {NULLF})
               AS rs_full,
           COALESCE(CASE WHEN ok THEN round(rh, 6) + 0.0 END, {NULLF})
               AS rs_half_mean,
           COALESCE(CASE WHEN ok THEN round(log2(rf / rh), 6) + 0.0 END,
                    {NULLF}) AS hurst
    FROM piv ORDER BY 1
"""


def q_peak_stats_daily(sf_dir: str) -> pd.DataFrame:
    """Peak/load profile per series: the peak day (earliest on ties), peak
    value, mean, peak-to-mean ratio and load factor (mean/peak) — the
    capacity-planning summary of a traffic series."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values(["v", "d"], ascending=[False, True])
            peak_d, peak_v = g.iloc[0]["d"], float(g.iloc[0]["v"])
            mean_v = float(g["v"].mean())
            ptm = peak_v / mean_v if mean_v != 0 else np.nan
            lf = mean_v / peak_v if peak_v != 0 else np.nan
            rows.append((et, peak_d, np.round(peak_v, 6) + 0.0,
                         np.round(mean_v, 6) + 0.0,
                         np.round(ptm, 6) + 0.0 if np.isfinite(ptm)
                         else np.nan,
                         np.round(lf, 6) + 0.0 if np.isfinite(lf)
                         else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "peak_day",
                                           "peak_v", "mean_v",
                                           "peak_to_mean", "load_factor"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = _fill(out, ["peak_to_mean", "load_factor"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_PEAK_STATS = f"""
    WITH daily AS ({_DAILY_SQL}),
    s AS (
        SELECT event_type, min(d) FILTER (WHERE is_peak) AS peak_day,
               max(v) AS peak_v, avg(v) AS mean_v
        FROM (SELECT event_type, d, v,
                     v = max(v) OVER (PARTITION BY event_type) AS is_peak
              FROM daily)
        GROUP BY 1
    )
    SELECT event_type, peak_day,
           round(peak_v, 6) + 0.0 AS peak_v,
           round(mean_v, 6) + 0.0 AS mean_v,
           COALESCE(CASE WHEN mean_v <> 0
                         THEN round(peak_v / mean_v, 6) + 0.0 END, {NULLF})
               AS peak_to_mean,
           COALESCE(CASE WHEN peak_v <> 0
                         THEN round(mean_v / peak_v, 6) + 0.0 END, {NULLF})
               AS load_factor
    FROM s ORDER BY 1
"""


# ---------------------------------------------------------------------------
# flagship-path pages oracle / strict 3-step funnel / circular hour stats
# ---------------------------------------------------------------------------

#: entry()'s deterministic page-synthesis constants (__ray_entry__.py)
_PAGE_EPOCH_US = 1_704_067_200_000_000
_PAGE_STRIDE = 9_999_999_989
_PAGE_SPAN_US = 28 * DAY_US


def q_host_tier_1d_pages(sf_dir: str) -> pd.DataFrame:
    """THE flagship path under a full SQL value-hash: documents →
    deterministic Common-Crawl-style page synthesis (entry()'s exact
    formulas) → html-binary text extraction (extract.py's tag-strip /
    unescape / whitespace-collapse contract) → url host keys → salted 1d
    retention tier over text_bytes. The oracle recomputes extraction
    byte-length and the tier algebra in pure SQL — so the html→text→tier
    chain is hash-pinned end to end, not just pytest byte-identity."""
    import html as _html
    import pyarrow as pa

    from forecastframe_ray.pipelines import web

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def to_pages(b: pd.DataFrame) -> pa.Table:
        urls, htmls, ts = [], [], []
        for doc_id, text, source in zip(b["doc_id"], b["text"], b["source"]):
            host = f"{source}.example.com".lower().replace(" ", "-")
            urls.append(f"https://{host}/doc/{doc_id}")
            htmls.append((
                f"<html><head><title>doc {doc_id}</title></head>"
                f"<body><p>{_html.escape(text)}</p></body></html>"
            ).encode("utf-8"))
            ts.append(_PAGE_EPOCH_US
                      + (int(doc_id) * _PAGE_STRIDE) % _PAGE_SPAN_US)
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
        })

    pages = docs.map_batches(to_pages, batch_format="pandas")
    prepared = web.prepare_series(pages)
    tier = web.build_tiers(prepared, series_keys=("host",),
                           num_salts=4)["1d"]
    df = tier.to_pandas()[["host", "bucket_us", "pages", "sum_val",
                           "min_val", "max_val", "mean_val", "std_val"]]
    df = _round(df, ["sum_val", "min_val", "max_val", "mean_val"], 6)
    df["std_val"] = np.round(df["std_val"].to_numpy(np.float64), 6)
    df = _fill(df, ["std_val"])
    return df.sort_values(["host", "bucket_us"]).reset_index(drop=True)


SQL_HOST_TIER_1D_PAGES = rf"""
    WITH pages AS (
        SELECT lower(replace(source, ' ', '-')) || '.example.com' AS host,
               ({_PAGE_EPOCH_US} + (doc_id * {_PAGE_STRIDE})
                % {_PAGE_SPAN_US}) AS ts_us,
               octet_length(encode('doc ' || doc_id || ' ' ||
                   trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS text_bytes
        FROM documents
    )
    SELECT host, (ts_us // {DAY_US}) * {DAY_US} AS bucket_us,
           CAST(count(*) AS DOUBLE) AS pages,
           round(sum(text_bytes), 6) AS sum_val,
           round(min(text_bytes), 6) AS min_val,
           round(max(text_bytes), 6) AS max_val,
           round(avg(text_bytes), 6) AS mean_val,
           COALESCE(round(stddev_samp(text_bytes), 6), {NULLF}) AS std_val
    FROM pages GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_funnel3_strict_events(sf_dir: str) -> pd.DataFrame:
    """Strictly-ordered 3-step funnel (view → click → purchase, each step
    strictly AFTER the previous one's first completion — the sequential-
    pattern semantics a bare per-type min-ts funnel gets wrong when steps
    interleave). Per-user chain mins compute inside one co-located
    partition via vectorized merges; one count row leaves."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        v = part[part["event_type"] == "view"].groupby("user_id")["ts"] \
            .min().rename("t1").reset_index()
        c = part[part["event_type"] == "click"].merge(v, on="user_id")
        c = c[c["ts"] > c["t1"]].groupby("user_id")["ts"] \
            .min().rename("t2").reset_index()
        p = part[part["event_type"] == "purchase"].merge(c, on="user_id")
        p = p[p["ts"] > p["t2"]]
        return pd.DataFrame({"s1": [len(v)], "s2": [len(c)],
                             "s3": [p["user_id"].nunique()]})

    parts = keyed_map_partitions(ev, ["user_id"], kernel,
                                 num_partitions=_NP).to_pandas()
    s1, s2, s3 = (int(parts["s1"].sum()), int(parts["s2"].sum()),
                  int(parts["s3"].sum()))
    return pd.DataFrame({
        "n_view": [s1], "n_click_after": [s2], "n_purchase_after": [s3],
        "rate_step2": [np.round(s2 / s1, 6) + 0.0 if s1 else NULLF],
        "rate_step3": [np.round(s3 / s2, 6) + 0.0 if s2 else NULLF],
    }).astype({"n_view": np.int64, "n_click_after": np.int64,
               "n_purchase_after": np.int64})


SQL_FUNNEL3_STRICT = f"""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY 1),
    p AS (SELECT DISTINCT e.user_id
          FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase')
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after,
           (SELECT count(*) FROM p) AS n_purchase_after,
           round((SELECT count(*) FROM c) * 1.0
                 / (SELECT count(*) FROM v), 6) + 0.0 AS rate_step2,
           round((SELECT count(*) FROM p) * 1.0
                 / (SELECT count(*) FROM c), 6) + 0.0 AS rate_step3
"""


def q_circular_hour_events(sf_dir: str) -> pd.DataFrame:
    """Circular (directional) statistics of event time-of-day per type:
    mean hour via atan2(Σsin θ, Σcos θ) with θ = 2π·(us-of-day)/86400e6,
    and the resultant length R = |Σe^{iθ}|/n (1 = perfectly peaked, 0 =
    uniform) — the correct way to average times that wrap at midnight.
    Sin/cos sums pre-reduce per batch; one row per type crosses."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us_day = (b["ts"].astype("int64").to_numpy() % DAY_US) \
            .astype(np.float64)
        theta = 2.0 * np.pi * us_day / float(DAY_US)
        return pd.DataFrame({"event_type": b["event_type"],
                             "s": np.sin(theta), "c": np.cos(theta),
                             "n": 1.0})

    agg = hash_aggregate(ev.map_batches(partial, batch_format="pandas"),
                         ["event_type"],
                         {"s": ("s", "sum"), "c": ("c", "sum"),
                          "n": ("n", "sum")}, num_partitions=_NP).to_pandas()
    s = agg["s"].to_numpy(np.float64)
    c = agg["c"].to_numpy(np.float64)
    n = agg["n"].to_numpy(np.float64)
    mean_h = (np.arctan2(s, c) % (2.0 * np.pi)) * 24.0 / (2.0 * np.pi)
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n_events": n.astype(np.int64),
        "mean_hour": np.round(mean_h, 6) + 0.0,
        "resultant_r": np.round(np.sqrt(s * s + c * c) / n, 6) + 0.0,
    }).sort_values("event_type").reset_index(drop=True)


SQL_CIRCULAR_HOUR = f"""
    WITH t AS (
        SELECT event_type,
               2 * pi() * (epoch_us(ts) % {DAY_US}) / {DAY_US} AS theta
        FROM events
    ),
    a AS (SELECT event_type, sum(sin(theta)) AS s, sum(cos(theta)) AS c,
                 count(*)::DOUBLE AS n
          FROM t GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           round(fmod(atan2(s, c) + 2 * pi(), 2 * pi())
                 * 24 / (2 * pi()), 6) + 0.0 AS mean_hour,
           round(sqrt(s * s + c * c) / n, 6) + 0.0 AS resultant_r
    FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# matrix-profile top motif / Pareto-frontier skyline / last-touch attribution
# ---------------------------------------------------------------------------

def q_motif_daily_events(sf_dir: str) -> pd.DataFrame:
    """Top motif per daily series (the Matrix Profile primitive, Yeh et al.
    2016): the pair of NON-OVERLAPPING 7-day windows minimizing
    z-normalized squared Euclidean distance. Windows index by row number
    in day order; argmin over d² ROUNDED to 6 with (a, b) tie-break so
    both engines rank identical values. Zero-dispersion windows are
    excluded (z undefined)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    M = 7

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            if len(v) < 2 * M:
                rows.append((et, 0, 0, np.nan))
                continue
            X = np.lib.stride_tricks.sliding_window_view(v, M)
            mu = X.mean(axis=1, keepdims=True)
            sd = X.std(axis=1, ddof=1, keepdims=True)
            ok = sd[:, 0] > 0
            best = None
            Z = np.where(sd > 0, (X - mu) / np.where(sd > 0, sd, 1.0), 0.0)
            nw = len(X)
            for a in range(nw):
                if not ok[a]:
                    continue
                for b in range(a + M, nw):
                    if not ok[b]:
                        continue
                    d2 = np.round(((Z[a] - Z[b]) ** 2).sum(), 6) + 0.0
                    if best is None or (d2, a, b) < best:
                        best = (d2, a, b)
            if best is None:
                rows.append((et, 0, 0, np.nan))
            else:
                rows.append((et, best[1] + 1, best[2] + 1, best[0]))
        return pd.DataFrame(rows, columns=["event_type", "a_start",
                                           "b_start", "dist2"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["a_start", "b_start"]] = out[["a_start", "b_start"]] \
        .astype(np.int64)
    out = _fill(out, ["dist2"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_MOTIF_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    w AS (
        SELECT event_type, rn AS a,
               avg(v) OVER f AS mu, stddev_samp(v) OVER f AS sd,
               count(*) OVER f AS cnt
        FROM r
        WINDOW f AS (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)
    ),
    z AS (
        SELECT w.event_type, w.a, r.rn - w.a AS k, (r.v - w.mu) / w.sd AS z
        FROM w JOIN r ON r.event_type = w.event_type
                      AND r.rn BETWEEN w.a AND w.a + 6
        WHERE w.cnt = 7 AND w.sd > 0
    ),
    d2 AS (
        SELECT za.event_type, za.a, zb.a AS b,
               round(sum((za.z - zb.z) * (za.z - zb.z)), 6) + 0.0 AS d2
        FROM z za JOIN z zb ON za.event_type = zb.event_type
                            AND za.k = zb.k AND zb.a >= za.a + 7
        GROUP BY 1, 2, 3
    ),
    best AS (
        SELECT event_type, a, b, d2,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY d2, a, b) AS pos
        FROM d2
    )
    SELECT r.event_type,
           CAST(COALESCE(best.a, 0) AS BIGINT) AS a_start,
           CAST(COALESCE(best.b, 0) AS BIGINT) AS b_start,
           COALESCE(best.d2, {NULLF}) AS dist2
    FROM (SELECT DISTINCT event_type FROM daily) r
    LEFT JOIN best ON best.event_type = r.event_type AND best.pos = 1
    ORDER BY 1
"""


def q_pareto_frontier_orders(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto frontier) of orders on (totalprice ↑ better,
    orderdate ↓ better): rows no other order STRICTLY beats on both axes.
    Distributed via the sort-skyline identity — per-date maxima reduce
    first (date-cardinality result), the running prior-date max broadcasts
    back, and a row survives iff prevmax(date) ≤ price. Never all-pairs."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_totalprice"])

    dm = hash_aggregate(orders, ["o_orderdate"],
                        {"mx": ("o_totalprice", "max")},
                        num_partitions=4).to_pandas() \
        .sort_values("o_orderdate").reset_index(drop=True)
    prevmax = dm["mx"].cummax().shift(1)
    pm_map = dict(zip(dm["o_orderdate"], prevmax))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        pm = b["o_orderdate"].map(pm_map).to_numpy(np.float64)
        mask = np.isnan(pm) | (pm <= b["o_totalprice"].to_numpy(np.float64))
        return b[mask]

    out = orders.map_batches(keep, batch_format="pandas").to_pandas()
    out = out.astype({"o_orderkey": np.int64})
    return out.sort_values("o_orderkey").reset_index(drop=True)


SQL_PARETO_FRONTIER = """
    WITH dm AS (SELECT o_orderdate AS dd, max(o_totalprice) AS mx
                FROM orders GROUP BY 1),
    rm AS (SELECT dd, max(mx) OVER (ORDER BY dd
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prevmax
           FROM dm)
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
    FROM orders o JOIN rm ON o.o_orderdate = rm.dd
    WHERE rm.prevmax IS NULL OR rm.prevmax <= o.o_totalprice
    ORDER BY 1
"""


def q_attribution_events(sf_dir: str) -> pd.DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent STRICTLY-earlier non-purchase event (ties at equal ts broken by
    highest event_id — deterministic on both engines). Per-user chains
    resolve inside one co-located partition via a single searchsorted pass
    over the (ts, event_id)-sorted stream; attributed counts + shares are
    the only rows out."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for uid, g in part.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"])
            np_mask = (g["event_type"] != "purchase").to_numpy()
            cand_ts = g["ts"].astype("int64").to_numpy()[np_mask]
            cand_type = g["event_type"].to_numpy()[np_mask]
            p_ts = g["ts"].astype("int64").to_numpy()[~np_mask]
            if len(p_ts) == 0 or len(cand_ts) == 0:
                continue
            pos = np.searchsorted(cand_ts, p_ts, side="left") - 1
            valid = pos >= 0
            outs.append(pd.Series(cand_type[pos[valid]]))
        if not outs:
            return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        vc = pd.concat(outs, ignore_index=True).value_counts()
        return pd.DataFrame({"event_type": vc.index.astype(str),
                             "n": vc.to_numpy(np.int64)})

    parts = keyed_map_partitions(ev, ["user_id"], kernel,
                                 num_partitions=_NP)
    agg = hash_aggregate(parts, ["event_type"], {"n_attributed": ("n", "sum")},
                         num_partitions=4).to_pandas()
    total = float(agg["n_attributed"].sum())
    agg["share"] = np.round(agg["n_attributed"].to_numpy(np.float64)
                            / total, 6) + 0.0
    agg["n_attributed"] = agg["n_attributed"].astype(np.int64)
    return agg.sort_values("event_type").reset_index(drop=True)


SQL_ATTRIBUTION = """
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    att AS (
        SELECT (SELECT e.event_type FROM events e
                WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
                  AND e.ts < p.ts
                ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS event_type
        FROM p
    ),
    c AS (SELECT event_type, count(*) AS n_attributed FROM att
          WHERE event_type IS NOT NULL GROUP BY 1)
    SELECT event_type, CAST(n_attributed AS BIGINT) AS n_attributed,
           round(n_attributed * 1.0 / (SELECT sum(n_attributed) FROM c), 6)
               + 0.0 AS share
    FROM c ORDER BY 1
"""


# ---------------------------------------------------------------------------
# top-down forecast reconciliation / JL projection gate / sentence stats
# ---------------------------------------------------------------------------

def q_topdown_forecast_daily(sf_dir: str) -> pd.DataFrame:
    """Hierarchical forecast reconciliation, top-down with historical
    proportions (Hyndman FPP3 §11): the TOTAL series gets the h=1 drift
    forecast T̂ = T_n + (T_n − T_1)/(n−1), then disaggregates by each
    series' share of the historical total — so the bottom forecasts sum
    to the top by construction (the reconciliation identity the rollup
    engine's hierarchy consumers rely on). Day totals and shares are two
    coarse aggregates; only k+n_days rows leave the cluster."""
    daily = _bucket_series(sf_dir, DAY_US, "d")

    tot = hash_aggregate(daily, ["d"], {"T": ("v", "sum")},
                         num_partitions=4).to_pandas().sort_values("d")
    T = tot["T"].to_numpy(np.float64)
    f_total = T[-1] + (T[-1] - T[0]) / (len(T) - 1.0)

    shares = hash_aggregate(daily, ["event_type"], {"sv": ("v", "sum")},
                            num_partitions=4).to_pandas()
    stot = float(shares["sv"].sum())
    sh = shares["sv"].to_numpy(np.float64) / stot
    return pd.DataFrame({
        "event_type": shares["event_type"],
        "share": np.round(sh, 6) + 0.0,
        "topdown_forecast": np.round(f_total * sh, 6) + 0.0,
    }).sort_values("event_type").reset_index(drop=True)


SQL_TOPDOWN_FORECAST = f"""
    WITH daily AS ({_DAILY_SQL}),
    tot AS (SELECT d, sum(v) AS T FROM daily GROUP BY 1),
    drift AS (
        SELECT arg_max(T, d) + (arg_max(T, d) - arg_min(T, d))
               / (count(*) - 1.0) AS f
        FROM tot
    ),
    s AS (SELECT event_type, sum(v) AS sv FROM daily GROUP BY 1),
    st AS (SELECT sum(sv) AS stot FROM s)
    SELECT s.event_type,
           round(s.sv / st.stot, 6) + 0.0 AS share,
           round(drift.f * s.sv / st.stot, 6) + 0.0 AS topdown_forecast
    FROM s CROSS JOIN st CROSS JOIN drift ORDER BY 1
"""


def q_jl_projection_gate_embeddings(sf_dir: str) -> pd.DataFrame:
    """Johnson-Lindenstrauss distortion gate: a deterministic ±1/√16
    sign-projection (splitmix64 of the flat matrix index) maps 64-d
    embeddings to 16-d; for the 100 fixed probe pairs (vec_id 2i, 2i+1,
    i < 100) the squared-distance ratio must land in [0.1, 3.0] (E=1,
    chi²₁₆/16 tails ≪ 1e-4 per pair — and the projection is deterministic,
    so the gate is a fixed fact, not a flake). ``d_exact`` is value-oracled
    against DuckDB's list_distance."""
    from forecastframe_ray.stages.sketch import _mix64

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    sub = emb.filter(lambda r: r["vec_id"] < 200).to_pandas()
    sub = sub.sort_values("vec_id").reset_index(drop=True)
    X = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
    dim, k = X.shape[1], 16
    idx = np.arange(dim * k, dtype=np.uint64)
    R = (np.where(_mix64(idx) >> np.uint64(63), 1.0, -1.0)
         .reshape(dim, k) / np.sqrt(k))
    P = X @ R
    ids = sub["vec_id"].to_numpy(np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}
    rows = []
    for i in range(100):
        a, b = 2 * i, 2 * i + 1
        if a not in pos or b not in pos:
            continue
        dx = X[pos[a]] - X[pos[b]]
        dp = P[pos[a]] - P[pos[b]]
        d2, p2 = float((dx ** 2).sum()), float((dp ** 2).sum())
        ok = True if d2 == 0 else 0.1 <= p2 / d2 <= 3.0
        rows.append((a, b, np.round(np.sqrt(d2), 6) + 0.0, ok))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "d_exact",
                                       "ratio_ok"]) \
        .astype({"id_a": np.int64, "id_b": np.int64})


SQL_JL_PROJECTION_GATE = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 200),
    p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_distance(a.v, b.v), 6) + 0.0 AS d_exact
        FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 2 = 0
    )
    SELECT id_a, id_b, d_exact, true AS ratio_ok FROM p ORDER BY id_a
"""


def q_sentence_stats_documents(sf_dir: str) -> pd.DataFrame:
    """Per-doc sentence segmentation stats (split on [.!?]+ runs, blank
    segments dropped): sentence count, mean and max whitespace-token
    length — the Gopher-family readability signals at sentence grain.
    Fully per-row parallel."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[["doc_id"]].copy()
        ex["sent"] = b["text"].str.split(r"[.!?]+", regex=True)
        ex = ex.explode("sent")
        ex["sent"] = ex["sent"].str.strip()
        ex = ex[ex["sent"].notna() & (ex["sent"] != "")]
        ex["nw"] = ex["sent"].str.split().str.len()
        g = ex.groupby("doc_id", sort=False)["nw"]
        agg = pd.DataFrame({"ns": g.size(), "mw": g.mean(),
                            "mx": g.max()}).reset_index()
        out = b[["doc_id"]].merge(agg, on="doc_id", how="left")
        return pd.DataFrame({
            "doc_id": out["doc_id"],
            "n_sentences": out["ns"].fillna(0).astype(np.int64),
            "mean_words": np.where(out["ns"].notna(),
                                   np.round(out["mw"].to_numpy(np.float64),
                                            6) + 0.0, NULLF),
            "max_words": out["mx"].fillna(0).astype(np.int64),
        })

    out = docs.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_SENTENCE_STATS = rf"""
    WITH s AS (
        SELECT doc_id, trim(x) AS sent
        FROM (SELECT doc_id,
                     unnest(string_split_regex(text, '[.!?]+')) AS x
              FROM documents)
        WHERE trim(x) <> ''
    ),
    w AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(sent, '\s+'),
                               y -> y <> '')) AS nw
        FROM s
    ),
    a AS (SELECT doc_id, count(*) AS ns, avg(nw) AS mw, max(nw) AS mx
          FROM w GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(a.ns, 0) AS BIGINT) AS n_sentences,
           COALESCE(round(a.mw, 6) + 0.0, {NULLF}) AS mean_words,
           CAST(COALESCE(a.mx, 0) AS BIGINT) AS max_words
    FROM documents d LEFT JOIN a USING (doc_id)
    ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# days since running peak / Page-Hinkley drift / Hill tail index
# ---------------------------------------------------------------------------

def q_days_since_peak_daily(sf_dir: str) -> pd.DataFrame:
    """Age of the running maximum per series row: days since the EARLIEST
    day that achieved the current expanding max (record days reset the
    clock; ties keep the older record — the drawdown-duration twin of the
    record-streak op). One co-located vectorized pass; the oracle uses the
    record-day identity peak_day = max(record day ≤ t)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            v = g["v"].to_numpy(np.float64)
            prev_max = np.concatenate(([-np.inf],
                                       np.maximum.accumulate(v)[:-1]))
            is_record = v > prev_max
            idx = np.where(is_record, np.arange(len(v)), 0)
            peak_idx = np.maximum.accumulate(idx)
            dus = g["d"].astype("datetime64[us]").astype("int64").to_numpy()
            g["days_since_peak"] = (dus - dus[peak_idx]) // DAY_US
            g["is_record"] = is_record
            outs.append(g[["event_type", "d", "v", "is_record",
                           "days_since_peak"]])
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "is_record",
                                  "days_since_peak"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["days_since_peak"] = out["days_since_peak"].astype(np.int64)
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_DAYS_SINCE_PEAK = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               v > COALESCE(max(v) OVER (PARTITION BY event_type ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1e308) AS is_record
        FROM daily
    )
    SELECT event_type, d, v, is_record,
           datediff('day',
                    CAST(max(CASE WHEN is_record THEN d END)
                         OVER (PARTITION BY event_type ORDER BY d
                               ROWS UNBOUNDED PRECEDING) AS DATE),
                    CAST(d AS DATE)) AS days_since_peak
    FROM r
"""


def q_page_hinkley_daily(sf_dir: str) -> pd.DataFrame:
    """Page-Hinkley upward-drift statistic per series (Page 1954; Hinkley
    1971, δ=0 form): deviations from the RUNNING mean cumulate into
    m_t = Σᵢ≤t (vᵢ − v̄ᵢ), and the alarm statistic is
    PH = max_T (m_T − min_{t≤T} m_t). Pure prefix algebra — one co-located
    pass engine-side, three nested window sums in the oracle."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            mu = np.cumsum(v) / np.arange(1, len(v) + 1)
            m = np.cumsum(v - mu)
            ph = (m - np.minimum.accumulate(m)).max()
            rows.append((et, len(v), np.round(ph, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "ph_stat"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_PAGE_HINKLEY = f"""
    WITH daily AS ({_DAILY_SQL}),
    a AS (
        SELECT event_type, d, v,
               sum(v) OVER w / ROW_NUMBER() OVER w2 AS mu
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS UNBOUNDED PRECEDING),
               w2 AS (PARTITION BY event_type ORDER BY d)
    ),
    m AS (
        SELECT event_type, d,
               sum(v - mu) OVER (PARTITION BY event_type ORDER BY d
                                 ROWS UNBOUNDED PRECEDING) AS m
        FROM a
    ),
    ph AS (
        SELECT event_type, d,
               m - min(m) OVER (PARTITION BY event_type ORDER BY d
                                ROWS UNBOUNDED PRECEDING) AS excess
        FROM m
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(max(excess), 6) + 0.0 AS ph_stat
    FROM ph GROUP BY 1 ORDER BY 1
"""


def q_hill_tail_events(sf_dir: str) -> pd.DataFrame:
    """Hill tail-index estimator over each type's positive values (Hill
    1975, k=50): ξ = (1/k)Σᵢ₌₁ᵏ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the descending order
    statistics, α = 1/ξ — the heavy-tail diagnosis that decides whether
    mean-based aggregates are even meaningful. Only the top k+1 per type
    cross the exchange (grouped top-k shape)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    K_TAIL = 50
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prune(b: pd.DataFrame) -> pd.DataFrame:
        # map-side combiner: only each batch's per-type top k+1 positive
        # values can be in the global top k+1 — the rest never shuffle
        b = b[b["value"] > 0]
        return (b.sort_values("value", ascending=False)
                 .groupby("event_type", sort=False).head(K_TAIL + 1))

    ev = ev.map_batches(prune, batch_format="pandas")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            x = g["value"].to_numpy(np.float64)
            x = np.sort(x[x > 0])[::-1]
            if len(x) < K_TAIL + 1:
                rows.append((et, 0, np.nan, np.nan))
                continue
            xi = float(np.mean(np.log(x[:K_TAIL] / x[K_TAIL])))
            rows.append((et, K_TAIL, np.round(xi, 6) + 0.0,
                         np.round(1.0 / xi, 6) + 0.0 if xi > 0 else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n_tail",
                                           "hill_xi", "alpha"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_tail"] = out["n_tail"].astype(np.int64)
    out = _fill(out, ["hill_xi", "alpha"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_HILL_TAIL = f"""
    WITH r AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value DESC) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value > 0
    ),
    thr AS (SELECT event_type, value AS x51 FROM r WHERE rn = 51),
    hill AS (
        SELECT r.event_type, avg(ln(r.value / thr.x51)) AS xi
        FROM r JOIN thr USING (event_type)
        WHERE r.rn <= 50
        GROUP BY 1
    ),
    base AS (SELECT DISTINCT event_type FROM events)
    SELECT b.event_type,
           CAST(CASE WHEN h.xi IS NOT NULL THEN 50 ELSE 0 END AS BIGINT)
               AS n_tail,
           COALESCE(round(h.xi, 6) + 0.0, {NULLF}) AS hill_xi,
           COALESCE(CASE WHEN h.xi > 0
                         THEN round(1.0 / h.xi, 6) + 0.0 END, {NULLF})
               AS alpha
    FROM base b LEFT JOIN hill h USING (event_type)
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# customer order gaps / hourly typical-day envelope / negative-binomial fit
# ---------------------------------------------------------------------------

def q_customer_order_gaps(sf_dir: str) -> pd.DataFrame:
    """Repeat-purchase cadence per customer: calendar-day gaps between
    consecutive orders (date order, orderkey tie-break), median
    (quantile_cont interpolation) and mean gap — the replenishment-cycle
    input to demand models. Customers with one order are excluded."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for ck, g in part.groupby("o_custkey", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(["o_orderdate", "o_orderkey"])
            days = (g["o_orderdate"].astype("datetime64[us]")
                    .astype("int64").to_numpy() // DAY_US)
            gaps = np.diff(days).astype(np.float64)
            rows.append((ck, len(g),
                         np.round(np.quantile(gaps, 0.5), 6) + 0.0,
                         np.round(gaps.mean(), 6) + 0.0))
        return pd.DataFrame(rows, columns=["o_custkey", "n_orders",
                                           "median_gap_days",
                                           "mean_gap_days"])

    out = keyed_map_partitions(orders, ["o_custkey"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["o_custkey", "n_orders"]] = out[["o_custkey", "n_orders"]] \
        .astype(np.int64)
    return out.sort_values("o_custkey").reset_index(drop=True)


SQL_CUSTOMER_ORDER_GAPS = """
    WITH g AS (
        SELECT o_custkey,
               datediff('day',
                        CAST(LAG(o_orderdate) OVER w AS DATE),
                        CAST(o_orderdate AS DATE)) AS gap
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           round(quantile_cont(gap, 0.5), 6) + 0.0 AS median_gap_days,
           round(avg(gap), 6) + 0.0 AS mean_gap_days
    FROM g GROUP BY 1 HAVING count(gap) >= 1 ORDER BY 1
"""


def q_hourly_envelope_events(sf_dir: str) -> pd.DataFrame:
    """Typical-day envelope per series: p10/p50/p90 of the hourly-bucket
    values grouped by hour-of-day (the seasonal band an ops dashboard
    draws around 'today'). Exact quantile_cont interpolation on both
    sides."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    hourly = _bucket_series(sf_dir, HOUR_US, "h")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy()
        us = part["h"].astype("datetime64[us]").astype("int64")
        part["hod"] = (us % DAY_US) // HOUR_US
        g = part.groupby(["event_type", "hod"], sort=False)["v"]
        out = pd.DataFrame({
            "n": g.size(),
            "p10": g.quantile(0.1), "p50": g.quantile(0.5),
            "p90": g.quantile(0.9)}).reset_index()
        for c in ("p10", "p50", "p90"):
            out[c] = np.round(out[c].to_numpy(np.float64), 6) + 0.0
        return out

    out = keyed_map_partitions(hourly, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["hod", "n"]] = out[["hod", "n"]].astype(np.int64)
    return out.sort_values(["event_type", "hod"]).reset_index(drop=True)


SQL_HOURLY_ENVELOPE = f"""
    WITH hourly AS ({_HOURLY_SQL}),
    e AS (SELECT event_type,
                 (epoch_us(h) % {DAY_US}) // {HOUR_US} AS hod, v
          FROM hourly)
    SELECT event_type, CAST(hod AS BIGINT) AS hod,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(v, 0.1), 6) + 0.0 AS p10,
           round(quantile_cont(v, 0.5), 6) + 0.0 AS p50,
           round(quantile_cont(v, 0.9), 6) + 0.0 AS p90
    FROM e GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_nb_fit_users_events(sf_dir: str) -> pd.DataFrame:
    """Negative-binomial method-of-moments fit of per-user event counts
    (the overdispersed count model behind user-activity simulation):
    p = m/s², r = m²/(s²−m) from the across-user mean and ddof=1 variance.
    NULLF when s² ≤ m (no overdispersion → NB degenerates to Poisson).
    Per-user counts pre-reduce map-side; one moment row leaves."""
    ev = _read(sf_dir, "events", ["user_id"])
    counts = hash_count(ev, ["user_id"], out_col="n",
                        num_partitions=_NP).to_pandas()
    n = counts["n"].to_numpy(np.float64)
    m, s2 = n.mean(), n.var(ddof=1)
    over = s2 > m
    return pd.DataFrame({
        "n_users": [np.int64(len(n))],
        "mean_events": [np.round(m, 6) + 0.0],
        "var_events": [np.round(s2, 6) + 0.0],
        "nb_r": [np.round(m * m / (s2 - m), 6) + 0.0 if over else NULLF],
        "nb_p": [np.round(m / s2, 6) + 0.0 if over else NULLF],
    })


SQL_NB_FIT_USERS = f"""
    WITH c AS (SELECT user_id, count(*)::DOUBLE AS n
               FROM events GROUP BY 1),
    m AS (SELECT count(*) AS n_users, avg(n) AS m, var_samp(n) AS s2 FROM c)
    SELECT CAST(n_users AS BIGINT) AS n_users,
           round(m, 6) + 0.0 AS mean_events,
           round(s2, 6) + 0.0 AS var_events,
           COALESCE(CASE WHEN s2 > m
                         THEN round(m * m / (s2 - m), 6) + 0.0 END,
                    {NULLF}) AS nb_r,
           COALESCE(CASE WHEN s2 > m
                         THEN round(m / s2, 6) + 0.0 END, {NULLF}) AS nb_p
    FROM m
"""


# ---------------------------------------------------------------------------
# co-purchase degree distribution / horizon error profile / p-chart
# ---------------------------------------------------------------------------

def q_copurchase_degree_lineitem(sf_dir: str) -> pd.DataFrame:
    """Co-purchase graph degree distribution: parts are nodes, an edge is
    'appeared in the same order'; the output is the histogram of distinct-
    partner counts (the degree spectrum recommender blueprints start
    from). Pair emission is per-order co-located, dedup + degree + the
    histogram are three chained integer count-aggregates."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for ok, g in part.groupby("l_orderkey", sort=False):
            p = np.unique(g["l_partkey"].to_numpy(np.int64))
            if len(p) < 2:
                continue
            a, b = np.meshgrid(p, p)
            mask = a != b
            outs.append(pd.DataFrame({"pa": a[mask], "pb": b[mask]}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"pa": pd.Series([], dtype="int64"),
                          "pb": pd.Series([], dtype="int64")})

    edges = keyed_map_partitions(li, ["l_orderkey"], pairs,
                                 num_partitions=_NP)
    dedup = hash_aggregate(
        edges.map_batches(lambda b: b.assign(one=1), batch_format="pandas"),
        ["pa", "pb"], {"c": ("one", "sum")}, num_partitions=_NP)
    deg = hash_count(dedup, ["pa"], out_col="deg", num_partitions=_NP)
    hist = hash_count(deg, ["deg"], out_col="n_parts",
                      num_partitions=4).to_pandas()
    hist = hist.astype({"deg": np.int64, "n_parts": np.int64})
    return hist.sort_values("deg").reset_index(drop=True)


SQL_COPURCHASE_DEGREE = """
    WITH p AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    d AS (SELECT pa, count(*) AS deg FROM p GROUP BY 1)
    SELECT CAST(deg AS BIGINT) AS deg,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM d GROUP BY 1 ORDER BY 1
"""


def q_horizon_error_profile_daily(sf_dir: str) -> pd.DataFrame:
    """Backtest error curve of the naive-h forecast (v̂_t = v_{t−h}) for
    horizons 1..7, pooled across series: MAE and RMSE per horizon — the
    horizon-degradation profile every forecast evaluation plots. Per-
    series error moments pre-reduce in the co-located kernel; 7 rows per
    partition cross."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            for h in range(1, 8):
                if len(v) <= h:
                    continue
                e = v[h:] - v[:-h]
                rows.append((h, len(e), np.abs(e).sum(), (e * e).sum()))
        return pd.DataFrame(rows, columns=["horizon", "n", "sae", "sse"])

    parts = keyed_map_partitions(daily, ["event_type"], kernel,
                                 num_partitions=_NP)
    agg = hash_aggregate(parts, ["horizon"],
                         {"n": ("n", "sum"), "sae": ("sae", "sum"),
                          "sse": ("sse", "sum")},
                         num_partitions=4).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    return pd.DataFrame({
        "horizon": agg["horizon"].astype(np.int64),
        "n": agg["n"].astype(np.int64),
        "mae": np.round(agg["sae"].to_numpy(np.float64) / n, 6) + 0.0,
        "rmse": np.round(np.sqrt(agg["sse"].to_numpy(np.float64) / n),
                         6) + 0.0,
    }).sort_values("horizon").reset_index(drop=True)


SQL_HORIZON_ERROR_PROFILE = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    ks AS (SELECT unnest(range(1, 8)) AS h),
    e AS (
        SELECT ks.h, a.v - b.v AS err
        FROM ks, r a
        JOIN r b ON a.event_type = b.event_type AND a.rn = b.rn + ks.h
    )
    SELECT CAST(h AS BIGINT) AS horizon, CAST(count(*) AS BIGINT) AS n,
           round(avg(abs(err)), 6) + 0.0 AS mae,
           round(sqrt(avg(err * err)), 6) + 0.0 AS rmse
    FROM e GROUP BY 1 ORDER BY 1
"""


def q_p_chart_hourly_events(sf_dir: str) -> pd.DataFrame:
    """Attribute control chart (p-chart, Shewhart): per hourly bucket the
    ERROR-event share p̂ against binomial 3σ limits around the pooled
    p̄ = total errors / total events, with per-bucket limits widening as
    1/√n. Flags compare ROUNDED p̂ to ROUNDED limits so both engines flag
    identically. Two integer sums per hour cross the exchange."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame({
            "h": pd.to_datetime((us // HOUR_US) * HOUR_US, unit="us"),
            "n": 1,
            "err": (b["event_type"] == "error").astype(np.int64)})

    agg = hash_aggregate(ev.map_batches(partial, batch_format="pandas"),
                         ["h"], {"n": ("n", "sum"), "err": ("err", "sum")},
                         num_partitions=_NP).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    err = agg["err"].to_numpy(np.float64)
    pbar = err.sum() / n.sum()
    sig = np.sqrt(pbar * (1.0 - pbar) / n)
    phat = np.round(err / n, 6) + 0.0
    ucl = np.round(np.minimum(pbar + 3.0 * sig, 1.0), 6) + 0.0
    lcl = np.round(np.maximum(pbar - 3.0 * sig, 0.0), 6) + 0.0
    return pd.DataFrame({
        "h": agg["h"], "n": agg["n"].astype(np.int64),
        "n_err": agg["err"].astype(np.int64),
        "phat": phat, "ucl": ucl, "lcl": lcl,
        "out_of_control": (phat > ucl) | (phat < lcl),
    }).sort_values("h").reset_index(drop=True)


SQL_P_CHART_HOURLY = """
    WITH b AS (
        SELECT date_trunc('hour', ts) AS h, count(*)::DOUBLE AS n,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE
                   AS err
        FROM events GROUP BY 1
    ),
    t AS (SELECT sum(err) / sum(n) AS pbar FROM b),
    c AS (
        SELECT b.h, b.n, b.err,
               round(b.err / b.n, 6) + 0.0 AS phat,
               round(least(t.pbar + 3 * sqrt(t.pbar * (1 - t.pbar) / b.n),
                           1.0), 6) + 0.0 AS ucl,
               round(greatest(t.pbar - 3 * sqrt(t.pbar * (1 - t.pbar) / b.n),
                              0.0), 6) + 0.0 AS lcl
        FROM b CROSS JOIN t
    )
    SELECT h, CAST(n AS BIGINT) AS n, CAST(err AS BIGINT) AS n_err,
           phat, ucl, lcl,
           (phat > ucl OR phat < lcl) AS out_of_control
    FROM c ORDER BY h
"""


# ---------------------------------------------------------------------------
# sample-ratio-mismatch check / dup-size vs quality corr / odds ratio
# ---------------------------------------------------------------------------

def q_srm_check_orders(sf_dir: str) -> pd.DataFrame:
    """Sample-ratio-mismatch audit of the 80/10/10 md5 hash split (the
    experiment-platform guardrail): chi-square goodness of fit of observed
    split counts against the declared shares, with the df=2 α=0.05
    critical value 5.991. A deterministic hash split should never trip it
    — the gate pins that the split logic is actually unbiased."""
    from forecastframe_ray.stages.sample import hash_split

    orders = _read(sf_dir, "orders", ["o_orderkey"])
    tagged = hash_split(orders, "o_orderkey",
                        {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = hash_count(tagged, ["split"], out_col="n",
                        num_partitions=4).to_pandas() \
        .set_index("split")["n"]
    total = float(counts.sum())
    shares = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = []
    chi2 = 0.0
    for s in ("test", "train", "val"):
        obs = float(counts.get(s, 0))
        exp = shares[s] * total
        chi2 += (obs - exp) ** 2 / exp
    for s in ("test", "train", "val"):
        rows.append((s, int(counts.get(s, 0)),
                     np.round(shares[s] * total, 6) + 0.0))
    out = pd.DataFrame(rows, columns=["split", "n_obs", "n_exp"])
    out["chi2"] = np.round(chi2, 6) + 0.0
    out["srm_ok"] = np.round(chi2, 6) < 5.991
    return out.astype({"n_obs": np.int64})


SQL_SRM_CHECK = """
    WITH h AS (
        SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                    AS BIGINT) AS b
        FROM orders
    ),
    tagged AS (
        SELECT CASE WHEN b < CAST(floor(0.8 * 4294967296) AS BIGINT)
                        THEN 'train'
                    WHEN b < CAST(floor(0.9 * 4294967296) AS BIGINT)
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM h
    ),
    c AS (SELECT split, count(*)::DOUBLE AS n FROM tagged GROUP BY 1),
    g AS (
        SELECT c.split, c.n,
               CASE c.split WHEN 'train' THEN 0.8
                            WHEN 'val' THEN 0.1 ELSE 0.1 END
               * (SELECT sum(n) FROM c) AS exp
        FROM c
    ),
    chi AS (SELECT sum((n - exp) * (n - exp) / exp) AS chi2 FROM g)
    SELECT g.split, CAST(g.n AS BIGINT) AS n_obs,
           round(g.exp, 6) + 0.0 AS n_exp,
           round(chi.chi2, 6) + 0.0 AS chi2,
           round(chi.chi2, 6) < 5.991 AS srm_ok
    FROM g CROSS JOIN chi ORDER BY g.split
"""


def q_dupsize_quality_corr_documents(sf_dir: str) -> pd.DataFrame:
    """Curation diagnostic joining two pipeline stages: Pearson correlation
    between each doc's EXACT-dup class size (md5-digest groups) and its
    whitespace token count — 'are duplicated docs systematically shorter?'
    The class-size table joins back broadcast; one moment row leaves."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def digest(b: pd.DataFrame) -> pd.DataFrame:
        dg = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in b["text"]]
        return pd.DataFrame({
            "doc_id": b["doc_id"], "dg": dg,
            "ntok": b["text"].str.split().str.len().fillna(0)
            .astype(np.int64)})

    tagged = docs.map_batches(digest, batch_format="pandas").materialize()
    sizes = hash_count(tagged, ["dg"], out_col="csize",
                       num_partitions=_NP).to_pandas()
    smap = dict(zip(sizes["dg"], sizes["csize"]))

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        x = b["dg"].map(smap).to_numpy(np.float64)
        y = b["ntok"].to_numpy(np.float64)
        return pd.DataFrame({"n": [float(len(b))], "sx": [x.sum()],
                             "sy": [y.sum()], "sxx": [(x * x).sum()],
                             "syy": [(y * y).sum()], "sxy": [(x * y).sum()]})

    m = tagged.map_batches(moments, batch_format="pandas").to_pandas().sum()
    n = m["n"]
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    r = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else np.nan
    return pd.DataFrame({
        "n_docs": [np.int64(n)],
        "mean_class_size": [np.round(m["sx"] / n, 6) + 0.0],
        "corr_size_tokens": [np.round(r, 6) + 0.0 if np.isfinite(r)
                             else NULLF],
    })


SQL_DUPSIZE_QUALITY_CORR = rf"""
    WITH t AS (
        SELECT doc_id, md5(text) AS dg,
               len(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '')) AS ntok
        FROM documents
    ),
    s AS (SELECT dg, count(*) AS csize FROM t GROUP BY 1),
    j AS (SELECT t.doc_id, s.csize::DOUBLE AS x, t.ntok::DOUBLE AS y
          FROM t JOIN s USING (dg))
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(x), 6) + 0.0 AS mean_class_size,
           COALESCE(round(corr(y, x), 6) + 0.0, {NULLF})
               AS corr_size_tokens
    FROM j
"""


def q_conversion_odds_users(sf_dir: str) -> pd.DataFrame:
    """2×2 odds-ratio analysis: does having a signup event associate with
    having a purchase event, across users? Cells, odds ratio, log-OR with
    its Woolf standard error and the 95% CI — the classic epidemiological
    contingency summary. Per-user flags pre-reduce map-side; four cell
    counts leave."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("user_id", sort=False)["event_type"]
        return pd.DataFrame({
            "user_id": g.size().index,
            "s": g.apply(lambda x: int((x == "signup").any())),
            "p": g.apply(lambda x: int((x == "purchase").any()))})

    # per-batch flags may double-count a user split across batches —
    # re-reduce by max (idempotent OR)
    per_user = hash_aggregate(
        ev.map_batches(flags, batch_format="pandas"), ["user_id"],
        {"s": ("s", "max"), "p": ("p", "max")},
        num_partitions=_NP).to_pandas()
    s = per_user["s"].to_numpy(np.int64)
    p = per_user["p"].to_numpy(np.int64)
    a = int(((s == 1) & (p == 1)).sum())
    b_ = int(((s == 1) & (p == 0)).sum())
    c = int(((s == 0) & (p == 1)).sum())
    d = int(((s == 0) & (p == 0)).sum())
    if min(a, b_, c, d) > 0:
        orr = (a * d) / (b_ * c)
        se = np.sqrt(1 / a + 1 / b_ + 1 / c + 1 / d)
        lo = np.log(orr)
        vals = [np.round(orr, 6) + 0.0, np.round(lo, 6) + 0.0,
                np.round(se, 6) + 0.0, np.round(lo - 1.96 * se, 6) + 0.0,
                np.round(lo + 1.96 * se, 6) + 0.0]
    else:
        vals = [NULLF] * 5
    return pd.DataFrame({
        "n_both": [a], "n_signup_only": [b_], "n_purchase_only": [c],
        "n_neither": [d], "odds_ratio": [vals[0]], "log_or": [vals[1]],
        "se": [vals[2]], "ci_lo": [vals[3]], "ci_hi": [vals[4]],
    }).astype({"n_both": np.int64, "n_signup_only": np.int64,
               "n_purchase_only": np.int64, "n_neither": np.int64})


SQL_CONVERSION_ODDS = f"""
    WITH u AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        FROM events GROUP BY 1
    ),
    c AS (
        SELECT sum(CASE WHEN s = 1 AND p = 1 THEN 1 ELSE 0 END)::DOUBLE AS a,
               sum(CASE WHEN s = 1 AND p = 0 THEN 1 ELSE 0 END)::DOUBLE AS b,
               sum(CASE WHEN s = 0 AND p = 1 THEN 1 ELSE 0 END)::DOUBLE AS cc,
               sum(CASE WHEN s = 0 AND p = 0 THEN 1 ELSE 0 END)::DOUBLE AS d
        FROM u
    )
    SELECT CAST(a AS BIGINT) AS n_both,
           CAST(b AS BIGINT) AS n_signup_only,
           CAST(cc AS BIGINT) AS n_purchase_only,
           CAST(d AS BIGINT) AS n_neither,
           COALESCE(CASE WHEN least(a, b, cc, d) > 0
                         THEN round(a * d / (b * cc), 6) + 0.0 END, {NULLF})
               AS odds_ratio,
           COALESCE(CASE WHEN least(a, b, cc, d) > 0
                         THEN round(ln(a * d / (b * cc)), 6) + 0.0 END,
                    {NULLF}) AS log_or,
           COALESCE(CASE WHEN least(a, b, cc, d) > 0
                         THEN round(sqrt(1/a + 1/b + 1/cc + 1/d), 6) + 0.0
                    END, {NULLF}) AS se,
           COALESCE(CASE WHEN least(a, b, cc, d) > 0
                         THEN round(ln(a * d / (b * cc))
                              - 1.96 * sqrt(1/a + 1/b + 1/cc + 1/d), 6)
                              + 0.0 END, {NULLF}) AS ci_lo,
           COALESCE(CASE WHEN least(a, b, cc, d) > 0
                         THEN round(ln(a * d / (b * cc))
                              + 1.96 * sqrt(1/a + 1/b + 1/cc + 1/d), 6)
                              + 0.0 END, {NULLF}) AS ci_hi
    FROM c
"""


# ---------------------------------------------------------------------------
# triangle counting / Haar wavelet energies / SAX symbolization
# ---------------------------------------------------------------------------

def q_triangle_count_copurchase(sf_dir: str) -> pd.DataFrame:
    """Global clustering of the co-purchase graph via distributed triangle
    counting (the canonical two-join plan: oriented edges a<b, wedge join
    on the middle vertex, closing-edge semi-join — each side materialized
    between joins per the aggregator-pool rule). Reports nodes, edges,
    wedges, triangles and the global clustering coefficient 3T/W."""
    from forecastframe_ray.stages.agg import keyed_map_partitions
    from forecastframe_ray.stages.join import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("l_orderkey", sort=False):
            p = np.unique(g["l_partkey"].to_numpy(np.int64))
            if len(p) < 2:
                continue
            a, b = np.triu_indices(len(p), k=1)
            outs.append(pd.DataFrame({"a": p[a], "b": p[b]}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64")})

    raw = keyed_map_partitions(li, ["l_orderkey"], pairs,
                               num_partitions=_NP)
    edges = hash_aggregate(
        raw.map_batches(lambda b: b.assign(one=1), batch_format="pandas"),
        ["a", "b"], {"c": ("one", "sum")},
        num_partitions=_NP).select_columns(["a", "b"]) \
        .repartition(8).materialize()
    n_edges = edges.count()
    nodes = hash_count(
        edges.map_batches(
            lambda b: pd.DataFrame({"v": np.concatenate(
                [b["a"].to_numpy(), b["b"].to_numpy()])}),
            batch_format="pandas"),
        ["v"], out_col="deg", num_partitions=_NP)
    n_nodes = nodes.count()
    deg_df = nodes.to_pandas()
    d = deg_df["deg"].to_numpy(np.float64)
    n_wedges = int((d * (d - 1) / 2).sum())
    # wedges (a<b<c) around middle vertex b: edge(a,b) x edge(b,c)
    right = edges.map_batches(
        lambda b: b.rename(columns={"a": "b", "b": "c"}),
        batch_format="pandas").repartition(8).materialize()
    wedges = hash_join(edges, right, on=["b"],
                       num_partitions=_NP).materialize()
    closing = wedges.map_batches(
        lambda w: w[["a", "c"]].rename(columns={"c": "b"}),
        batch_format="pandas")
    tri = hash_join(closing,
                    edges.map_batches(lambda b: b.assign(is_edge=1),
                                      batch_format="pandas")
                    .repartition(8).materialize(),
                    on=["a", "b"], num_partitions=_NP)
    n_tri = tri.count()
    cc = 3.0 * n_tri / n_wedges if n_wedges else np.nan
    return pd.DataFrame({
        "n_nodes": [np.int64(n_nodes)], "n_edges": [np.int64(n_edges)],
        "n_wedges": [np.int64(n_wedges)],
        "n_triangles": [np.int64(n_tri)],
        "clustering_coeff": [np.round(cc, 6) + 0.0 if np.isfinite(cc)
                             else NULLF],
    })


SQL_TRIANGLE_COUNT = f"""
    WITH e AS (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
               greatest(a.l_partkey, b.l_partkey) AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    nodes AS (SELECT v, count(*) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY 1),
    w AS (SELECT sum(deg * (deg - 1) // 2) AS n_wedges FROM nodes),
    tri AS (
        SELECT count(*) AS t
        FROM e e1 JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT count(*) FROM nodes) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           CAST(w.n_wedges AS BIGINT) AS n_wedges,
           CAST(tri.t AS BIGINT) AS n_triangles,
           COALESCE(CASE WHEN w.n_wedges > 0
                         THEN round(3.0 * tri.t / w.n_wedges, 6) + 0.0 END,
                    {NULLF}) AS clustering_coeff
    FROM w CROSS JOIN tri
"""


def q_haar_energy_daily(sf_dir: str) -> pd.DataFrame:
    """Two-level Haar wavelet energy decomposition of each series' first
    16 days: detail energies at scales 1 and 2 plus the level-2 smooth —
    the multiresolution variance split (E_total = E_d1 + E_d2 + E_s2 is
    an exact orthogonality identity both engines must reproduce)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)[:16]
            if len(v) < 16:
                rows.append((et, np.nan, np.nan, np.nan, np.nan))
                continue
            d1 = (v[0::2] - v[1::2]) / np.sqrt(2.0)
            s1 = (v[0::2] + v[1::2]) / np.sqrt(2.0)
            d2 = (s1[0::2] - s1[1::2]) / np.sqrt(2.0)
            s2 = (s1[0::2] + s1[1::2]) / np.sqrt(2.0)
            rows.append((et, np.round((v * v).sum(), 6) + 0.0,
                         np.round((d1 * d1).sum(), 6) + 0.0,
                         np.round((d2 * d2).sum(), 6) + 0.0,
                         np.round((s2 * s2).sum(), 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "e_total",
                                           "e_d1", "e_d2", "e_s2"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = _fill(out, ["e_total", "e_d1", "e_d2", "e_s2"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_HAAR_ENERGY = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily QUALIFY rn <= 16
    ),
    cnt AS (SELECT event_type, count(*) AS n FROM r GROUP BY 1),
    l1 AS (
        SELECT a.event_type, (a.rn + 1) // 2 AS i,
               (a.v - b.v) / sqrt(2) AS d, (a.v + b.v) / sqrt(2) AS s
        FROM r a JOIN r b ON a.event_type = b.event_type
                          AND b.rn = a.rn + 1
        WHERE a.rn % 2 = 1
    ),
    l2 AS (
        SELECT a.event_type, (a.i + 1) // 2 AS j,
               (a.s - b.s) / sqrt(2) AS d, (a.s + b.s) / sqrt(2) AS s
        FROM l1 a JOIN l1 b ON a.event_type = b.event_type
                            AND b.i = a.i + 1
        WHERE a.i % 2 = 1
    ),
    et AS (SELECT event_type, sum(v * v) AS e FROM r GROUP BY 1),
    e1 AS (SELECT event_type, sum(d * d) AS e FROM l1 GROUP BY 1),
    e2 AS (SELECT event_type, sum(d * d) AS ed, sum(s * s) AS es
           FROM l2 GROUP BY 1)
    SELECT cnt.event_type,
           COALESCE(CASE WHEN cnt.n = 16
                         THEN round(et.e, 6) + 0.0 END, {NULLF}) AS e_total,
           COALESCE(CASE WHEN cnt.n = 16
                         THEN round(e1.e, 6) + 0.0 END, {NULLF}) AS e_d1,
           COALESCE(CASE WHEN cnt.n = 16
                         THEN round(e2.ed, 6) + 0.0 END, {NULLF}) AS e_d2,
           COALESCE(CASE WHEN cnt.n = 16
                         THEN round(e2.es, 6) + 0.0 END, {NULLF}) AS e_s2
    FROM cnt
    LEFT JOIN et USING (event_type) LEFT JOIN e1 USING (event_type)
    LEFT JOIN e2 USING (event_type)
    ORDER BY 1
"""


def q_sax_words_daily(sf_dir: str) -> pd.DataFrame:
    """SAX symbolization (Lin, Keogh et al. 2003): z-score each series,
    PAA over the first 28 days in four 7-day segments, map each segment
    mean to {a,b,c,d} at the N(0,1) quartile breakpoints ±0.6745 and 0.
    Segment means are ROUNDED to 6 before classification so both engines
    assign identical letters at boundaries."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    BP = (-0.6745, 0.0, 0.6745)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            if len(v) < 28 or v.std(ddof=1) == 0:
                rows.append((et, ""))
                continue
            z = (v - v.mean()) / v.std(ddof=1)
            word = []
            for i in range(4):
                m = np.round(z[7 * i:7 * (i + 1)].mean(), 6) + 0.0
                word.append("abcd"[int(np.searchsorted(BP, m,
                                                       side="right"))])
            rows.append((et, "".join(word)))
        return pd.DataFrame(rows, columns=["event_type", "sax_word"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


SQL_SAX_WORDS = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, stddev_samp(v) AS sd,
                 count(*) AS n
          FROM daily GROUP BY 1),
    r AS (
        SELECT d.event_type, (d.v - m.mu) / m.sd AS z,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.d) AS rn,
               m.n, m.sd
        FROM daily d JOIN m USING (event_type)
    ),
    seg AS (
        SELECT event_type, (rn - 1) // 7 AS i,
               round(avg(z), 6) + 0.0 AS mz
        FROM r WHERE rn <= 28 AND n >= 28 AND sd > 0
        GROUP BY 1, 2
    ),
    lt AS (
        SELECT event_type, i,
               CASE WHEN mz < -0.6745 THEN 'a'
                    WHEN mz < 0.0 THEN 'b'
                    WHEN mz < 0.6745 THEN 'c' ELSE 'd' END AS letter
        FROM seg
    ),
    w AS (SELECT event_type, string_agg(letter, '' ORDER BY i) AS sax_word
          FROM lt GROUP BY 1)
    SELECT b.event_type, COALESCE(w.sax_word, '') AS sax_word
    FROM (SELECT DISTINCT event_type FROM daily) b
    LEFT JOIN w USING (event_type)
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# banded DTW pair distances / newsvendor policy / POT-GPD tail fit
# ---------------------------------------------------------------------------

def _dtw_band(x: np.ndarray, y: np.ndarray, w: int = 3) -> float:
    """Sakoe-Chiba banded DTW with squared local cost, √ at the end
    (Sakoe & Chiba 1978). Vectorized over the band diagonal per row."""
    n, m = len(x), len(y)
    w = max(w, abs(n - m))
    INF = np.inf
    prev = np.full(m + 1, INF)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF)
        lo, hi = max(1, i - w), min(m, i + w)
        for j in range(lo, hi + 1):
            c = (x[i - 1] - y[j - 1]) ** 2
            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return float(np.sqrt(prev[m]))


def q_dtw_band_pairs_daily(sf_dir: str) -> pd.DataFrame:
    """Banded DTW distance between every series pair, GATED against its
    analytic envelope: DTW with any warping window is ≤ the lock-step
    Euclidean distance (which IS SQL-expressible and value-oracled here)
    and ≥ 0. Series truncate to the common length so both distances align;
    exact DTW values are pytest-pinned against an independent full DP.
    The k-series daily spine is collected for the k² pairing (k is the
    series-key cardinality, tiny by construction — never the row count)."""
    daily = _bucket_series(sf_dir, DAY_US, "d")
    wide = daily.to_pandas().sort_values(["event_type", "d"])
    series = {et: g["v"].to_numpy(np.float64)
              for et, g in wide.groupby("event_type")}
    ets = sorted(series)
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            n = min(len(series[a]), len(series[b]))
            x, y = series[a][:n], series[b][:n]
            eu = np.round(float(np.sqrt(((x - y) ** 2).sum())), 6) + 0.0
            dtw = _dtw_band(x, y, w=3)
            rows.append((a, b, eu, bool(0.0 <= dtw <= eu + 1e-9)))
    return pd.DataFrame(rows, columns=["et_a", "et_b", "euclid",
                                       "dtw_within_envelope"])


SQL_DTW_BAND_PAIRS = """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               round(sum(value), 6) AS v
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    p AS (
        SELECT a.event_type AS et_a, b.event_type AS et_b,
               sum((a.v - b.v) * (a.v - b.v)) AS ss
        FROM r a JOIN r b
          ON a.rn = b.rn AND a.event_type < b.event_type
             AND a.rn <= least(a.n, b.n)
        GROUP BY 1, 2
    )
    SELECT et_a, et_b, round(sqrt(ss), 6) + 0.0 AS euclid,
           true AS dtw_within_envelope
    FROM p ORDER BY 1, 2
"""


def q_newsvendor_daily(sf_dir: str) -> pd.DataFrame:
    """Newsvendor stocking policy per series (underage cost 3, overage 1
    → critical ratio 0.75): q* = the 0.75 demand quantile (quantile_cont),
    plus the empirical expected cost at q* — q* is ROUNDED before costing
    so both engines price the same policy."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["v"].to_numpy(np.float64)
            q = np.round(np.quantile(v, 0.75), 6) + 0.0
            cost = (3.0 * np.maximum(v - q, 0.0)
                    + np.maximum(q - v, 0.0)).mean()
            rows.append((et, len(v), q, np.round(cost, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "q_star", "exp_cost"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_NEWSVENDOR = f"""
    WITH daily AS ({_DAILY_SQL}),
    q AS (SELECT event_type, count(*) AS n,
                 round(quantile_cont(v, 0.75), 6) + 0.0 AS q_star
          FROM daily GROUP BY 1)
    SELECT q.event_type, CAST(q.n AS BIGINT) AS n_days, q.q_star,
           round(avg(3 * greatest(d.v - q.q_star, 0)
                     + greatest(q.q_star - d.v, 0)), 6) + 0.0 AS exp_cost
    FROM daily d JOIN q USING (event_type)
    GROUP BY 1, 2, 3 ORDER BY 1
"""


def q_pot_gpd_events(sf_dir: str) -> pd.DataFrame:
    """Peaks-over-threshold extreme-value fit per type: exceedances over
    the (rounded) p90 of event values, Generalized Pareto by method of
    moments — ξ = ½(1 − m²/s²), σ = ½m(m²/s² + 1) (Hosking & Wallis
    1987). The EVT companion to the Hill estimator. NULLF below 2
    exceedances or zero dispersion."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["value"].to_numpy(np.float64)
            u = np.round(np.quantile(v, 0.9), 6) + 0.0
            y = v[v > u] - u
            if len(y) < 2 or y.var(ddof=1) <= 0:
                rows.append((et, u, len(y), np.nan, np.nan))
                continue
            m, s2 = y.mean(), y.var(ddof=1)
            ratio = m * m / s2
            rows.append((et, u, len(y),
                         np.round(0.5 * (1.0 - ratio), 6) + 0.0,
                         np.round(0.5 * m * (ratio + 1.0), 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "threshold",
                                           "n_exc", "gpd_xi", "gpd_sigma"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_exc"] = out["n_exc"].astype(np.int64)
    out = _fill(out, ["gpd_xi", "gpd_sigma"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_POT_GPD = f"""
    WITH u AS (SELECT event_type,
                      round(quantile_cont(value, 0.9), 6) + 0.0 AS thr
               FROM events GROUP BY 1),
    exc AS (
        SELECT e.event_type, u.thr, e.value - u.thr AS y
        FROM events e JOIN u USING (event_type)
        WHERE e.value > u.thr
    ),
    m AS (SELECT event_type, any_value(thr) AS thr, count(*) AS n,
                 avg(y) AS m, var_samp(y) AS s2
          FROM exc GROUP BY 1)
    SELECT event_type, thr AS threshold, CAST(n AS BIGINT) AS n_exc,
           COALESCE(CASE WHEN n >= 2 AND s2 > 0
                         THEN round(0.5 * (1 - m * m / s2), 6) + 0.0 END,
                    {NULLF}) AS gpd_xi,
           COALESCE(CASE WHEN n >= 2 AND s2 > 0
                         THEN round(0.5 * m * (m * m / s2 + 1), 6) + 0.0
                    END, {NULLF}) AS gpd_sigma
    FROM m ORDER BY 1
"""


# ---------------------------------------------------------------------------
# min-cost supplier arg-min join / KL between source LMs / Markov accuracy
# ---------------------------------------------------------------------------

def q_mincost_supplier_parts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2's core shape — the correlated arg-min: for every part, the
    supplier offering the minimum extended price (price then suppkey
    tie-break). One co-located sort + group-head per partition; no
    all-pairs, no second pass."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        return (part.sort_values(["l_extendedprice", "l_suppkey"])
                    .groupby("l_partkey", sort=False).head(1))

    out = keyed_map_partitions(li, ["l_partkey"], kernel,
                               num_partitions=_NP).to_pandas()
    out = out.astype({"l_partkey": np.int64, "l_suppkey": np.int64})
    out = out.rename(columns={"l_extendedprice": "min_price"})
    return out[["l_partkey", "l_suppkey", "min_price"]] \
        .sort_values("l_partkey").reset_index(drop=True)


SQL_MINCOST_SUPPLIER = """
    SELECT l_partkey, l_suppkey, min_price FROM (
        SELECT l_partkey, l_suppkey, l_extendedprice AS min_price,
               ROW_NUMBER() OVER (PARTITION BY l_partkey
                                  ORDER BY l_extendedprice, l_suppkey)
                   AS rn
        FROM lineitem
    ) WHERE rn = 1 ORDER BY l_partkey
"""


#: the four sources compared pairwise by the KL query
_KL_SOURCES = ("src0", "src1", "src2", "src3")


def q_kl_token_sources(sf_dir: str) -> pd.DataFrame:
    """Add-one-smoothed KL divergence between the unigram LMs of source
    pairs (the corpus-drift measure between crawl slices): with V = the
    WHOLE-corpus vocabulary, Pₓ(t) = (cₓ(t)+1)/(Nₓ+V), and
    KL(Pa‖Pb) = Σ_V Pa·ln(Pa/Pb) — tokens absent from BOTH sources
    contribute the closed-form residual (V−|vocab_a ∪ vocab_b|)·p0a·ln(p0a/p0b)
    instead of an explosion over the full vocabulary. Counts build
    combiner-first; only the 4 compared sources' vocab reaches the driver
    (bounded by design, documented)."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[["source"]].copy()
        ex["tok"] = b["text"].str.split()
        ex = ex.explode("tok").dropna(subset=["tok"])
        vc = ex.groupby(["source", "tok"], sort=False).size()
        out = vc.rename("cnt").reset_index()
        return out.rename(columns={"tok": "token"})

    tc_all = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                            ["source", "token"], {"c": ("cnt", "sum")},
                            num_partitions=_NP).materialize()
    V = float(hash_count(tc_all, ["token"], out_col="x",
                         num_partitions=_NP).count())
    tc = tc_all.filter(
        lambda r: r["source"] in _KL_SOURCES).to_pandas()
    counts = {s: dict(zip(g["token"], g["c"].astype(np.int64)))
              for s, g in tc.groupby("source")}
    totals = {s: float(sum(counts.get(s, {}).values()))
              for s in _KL_SOURCES}
    rows = []
    for i, a in enumerate(_KL_SOURCES):
        for b in _KL_SOURCES[i + 1:]:
            ca, cb = counts.get(a, {}), counts.get(b, {})
            da, db = totals[a] + V, totals[b] + V
            union = set(ca) | set(cb)
            kl = 0.0
            for t in union:
                pa = (ca.get(t, 0) + 1.0) / da
                pb = (cb.get(t, 0) + 1.0) / db
                kl += pa * np.log(pa / pb)
            p0a, p0b = 1.0 / da, 1.0 / db
            kl += (V - len(union)) * p0a * np.log(p0a / p0b)
            rows.append((a, b, np.round(kl, 6) + 0.0))
    return pd.DataFrame(rows, columns=["src_a", "src_b", "kl_ab"])


SQL_KL_TOKEN_SOURCES = rf"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    vv AS (SELECT count(DISTINCT token)::DOUBLE AS V FROM tok),
    tc AS (SELECT source, token, count(*)::DOUBLE AS c FROM tok
           WHERE source IN ('src0', 'src1', 'src2', 'src3') GROUP BY 1, 2),
    n AS (SELECT source, sum(c) AS N FROM tc GROUP BY 1),
    srcs AS (SELECT unnest(['src0', 'src1', 'src2', 'src3']) AS s),
    pairs AS (SELECT a.s AS sa, b.s AS sb
              FROM srcs a, srcs b WHERE a.s < b.s),
    ut AS (
        SELECT p.sa, p.sb, t.token,
               max(CASE WHEN t.source = p.sa THEN t.c END) AS ca,
               max(CASE WHEN t.source = p.sb THEN t.c END) AS cb
        FROM pairs p JOIN tc t ON t.source IN (p.sa, p.sb)
        GROUP BY 1, 2, 3
    ),
    dens AS (
        SELECT p.sa, p.sb, na.N + vv.V AS da, nb.N + vv.V AS db, vv.V AS V
        FROM pairs p
        JOIN n na ON na.source = p.sa
        JOIN n nb ON nb.source = p.sb
        CROSS JOIN vv
    ),
    main AS (
        SELECT u.sa, u.sb,
               sum(((COALESCE(u.ca, 0) + 1) / d.da)
                   * ln(((COALESCE(u.ca, 0) + 1) / d.da)
                        / ((COALESCE(u.cb, 0) + 1) / d.db))) AS kl_main,
               count(*) AS n_union
        FROM ut u JOIN dens d ON d.sa = u.sa AND d.sb = u.sb
        GROUP BY 1, 2
    )
    SELECT m.sa AS src_a, m.sb AS src_b,
           round(m.kl_main + (d.V - m.n_union) * (1 / d.da)
                 * ln((1 / d.da) / (1 / d.db)), 6) + 0.0 AS kl_ab
    FROM main m JOIN dens d ON d.sa = m.sa AND d.sb = m.sb
    ORDER BY 1, 2
"""


def q_markov_top1_accuracy_events(sf_dir: str) -> pd.DataFrame:
    """Backtest of the first-order Markov next-event predictor: per current
    type, the modal next type (count desc, name asc tie-break) and its
    top-1 accuracy over all observed transitions — the eval step on top of
    the transition-count op. Per-user pairs form co-located; the 25-cell
    transition table is the only thing that leaves."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("user_id", sort=False):
            t = g.sort_values(["ts", "event_id"])["event_type"].to_numpy()
            if len(t) < 2:
                continue
            outs.append(pd.DataFrame({"cur": t[:-1], "nxt": t[1:]}))
        if not outs:
            return pd.DataFrame({"cur": pd.Series([], dtype="object"),
                                 "nxt": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.concat(outs, ignore_index=True)
        vc = df.groupby(["cur", "nxt"], sort=False).size()
        return vc.rename("n").reset_index()

    trans = hash_aggregate(
        keyed_map_partitions(ev, ["user_id"], pairs, num_partitions=_NP),
        ["cur", "nxt"], {"n": ("n", "sum")}, num_partitions=4).to_pandas()
    rows = []
    for cur, g in trans.groupby("cur"):
        g = g.sort_values(["n", "nxt"], ascending=[False, True])
        total = int(g["n"].sum())
        rows.append((cur, total, g.iloc[0]["nxt"],
                     np.round(int(g.iloc[0]["n"]) / total, 6) + 0.0))
    return pd.DataFrame(rows, columns=["cur", "n_transitions",
                                       "predicted", "accuracy"]) \
        .astype({"n_transitions": np.int64}) \
        .sort_values("cur").reset_index(drop=True)


SQL_MARKOV_TOP1_ACCURACY = """
    WITH s AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    t AS (SELECT event_type AS cur, nxt, count(*) AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    best AS (
        SELECT cur, nxt, n,
               ROW_NUMBER() OVER (PARTITION BY cur
                                  ORDER BY n DESC, nxt) AS rk,
               sum(n) OVER (PARTITION BY cur) AS total
        FROM t
    )
    SELECT cur, CAST(total AS BIGINT) AS n_transitions,
           nxt AS predicted,
           round(n * 1.0 / total, 6) + 0.0 AS accuracy
    FROM best WHERE rk = 1 ORDER BY cur
"""


# ---------------------------------------------------------------------------
# GEV block-maxima PWM fit / sample entropy / von Neumann ratio
# ---------------------------------------------------------------------------

def q_gev_pwm_daily_max_events(sf_dir: str) -> pd.DataFrame:
    """GEV fit to daily BLOCK MAXIMA of the hourly series via probability-
    weighted moments (Hosking, Wallis & Wood 1985 — the closed-form EVT
    companion to the POT-GPD fit): b₀,b₁,b₂ from the sorted sample,
    c = (2b₁−b₀)/(3b₂−b₀) − ln2/ln3, k = 7.8590c + 2.9554c²,
    σ = (2b₁−b₀)k / (Γ(1+k)(1−2⁻ᵏ)), μ = b₀ + σ(Γ(1+k)−1)/k."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    hourly = _bucket_series(sf_dir, HOUR_US, "h")

    def daymax(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        us = b["h"].astype("datetime64[us]").astype("int64")
        b["d"] = pd.to_datetime((us // DAY_US) * DAY_US, unit="us")
        return b[["event_type", "d", "v"]]

    dm = hash_aggregate(hourly.map_batches(daymax, batch_format="pandas"),
                        ["event_type", "d"], {"mx": ("v", "max")},
                        num_partitions=_NP)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            x = np.sort(g["mx"].to_numpy(np.float64))
            n = len(x)
            if n < 3:
                rows.append((et, n, np.nan, np.nan, np.nan))
                continue
            j = np.arange(1, n + 1, dtype=np.float64)
            b0 = x.mean()
            b1 = ((j - 1) / (n - 1.0) * x).sum() / n
            b2 = ((j - 1) * (j - 2) / ((n - 1.0) * (n - 2.0)) * x).sum() / n
            c = (2 * b1 - b0) / (3 * b2 - b0) - np.log(2) / np.log(3)
            k = 7.8590 * c + 2.9554 * c * c
            if abs(k) < 1e-9:
                rows.append((et, n, np.round(k, 6) + 0.0, np.nan, np.nan))
                continue
            from math import gamma
            sig = (2 * b1 - b0) * k / (gamma(1 + k) * (1 - 2.0 ** -k))
            mu = b0 + sig * (gamma(1 + k) - 1) / k
            rows.append((et, n, np.round(k, 6) + 0.0,
                         np.round(sig, 6) + 0.0, np.round(mu, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_blocks",
                                           "gev_k", "gev_sigma", "gev_mu"])

    out = keyed_map_partitions(dm, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_blocks"] = out["n_blocks"].astype(np.int64)
    out = _fill(out, ["gev_k", "gev_sigma", "gev_mu"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_GEV_PWM = f"""
    WITH hourly AS ({_HOURLY_SQL}),
    dm AS (
        SELECT event_type, date_trunc('day', h) AS d, max(v) AS mx
        FROM hourly GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, mx,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY mx) AS j,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dm
    ),
    b AS (
        SELECT event_type, any_value(n) AS n, avg(mx) AS b0,
               sum((j - 1) / (n - 1.0) * mx) / any_value(n) AS b1,
               sum((j - 1) * (j - 2)
                   / ((n - 1.0) * (n - 2.0)) * mx) / any_value(n) AS b2
        FROM r WHERE n >= 3 GROUP BY 1
    ),
    kfit AS (
        SELECT event_type, n, b0, b1, b2,
               7.8590 * ((2 * b1 - b0) / (3 * b2 - b0) - ln(2) / ln(3))
               + 2.9554 * pow((2 * b1 - b0) / (3 * b2 - b0)
                              - ln(2) / ln(3), 2) AS k
        FROM b
    ),
    fit AS (
        SELECT event_type, n, k,
               CASE WHEN abs(k) >= 1e-9
                    THEN (2 * b1 - b0) * k
                         / (gamma(1 + k) * (1 - pow(2, -k))) END AS sig,
               b0 AS b0
        FROM kfit
    ),
    base AS (SELECT DISTINCT event_type FROM dm)
    SELECT base.event_type,
           CAST(COALESCE(fit.n, (SELECT count(*) FROM dm d2
                                 WHERE d2.event_type = base.event_type))
                AS BIGINT) AS n_blocks,
           COALESCE(round(fit.k, 6) + 0.0, {NULLF}) AS gev_k,
           COALESCE(round(fit.sig, 6) + 0.0, {NULLF}) AS gev_sigma,
           COALESCE(CASE WHEN abs(fit.k) >= 1e-9
                         THEN round(fit.b0 + fit.sig * (gamma(1 + fit.k) - 1)
                                    / fit.k, 6) + 0.0 END, {NULLF})
               AS gev_mu
    FROM base LEFT JOIN fit USING (event_type)
    ORDER BY 1
"""


def q_sample_entropy_daily(sf_dir: str) -> pd.DataFrame:
    """Sample entropy per series (Richman & Moorman 2000; m=2,
    r = 0.2·σ rounded to 6 so both engines use the same tolerance):
    SampEn = −ln(A/B) with B = ordered template pairs (i<j) matching at
    length 2 under Chebyshev ≤ r, A = the same at length 3 — the
    regularity measure separating structured from noisy series."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n = len(v)
            if n < 4 or v.std(ddof=1) == 0:
                rows.append((et, n, np.nan, 0, 0))
                continue
            r = np.round(0.2 * v.std(ddof=1), 6) + 0.0
            W2 = np.lib.stride_tricks.sliding_window_view(v, 2)
            W3 = np.lib.stride_tricks.sliding_window_view(v, 3)

            def count_pairs(W):
                D = np.abs(W[:, None, :] - W[None, :, :]).max(axis=2)
                iu = np.triu_indices(len(W), k=1)
                return int((D[iu] <= r).sum())

            B, A = count_pairs(W2), count_pairs(W3)
            se = (np.round(-np.log(A / B), 6) + 0.0
                  if A > 0 and B > 0 else np.nan)
            rows.append((et, n, se, A, B))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "sampen", "n_a", "n_b"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["n_days", "n_a", "n_b"]] = out[["n_days", "n_a", "n_b"]] \
        .astype(np.int64)
    out = _fill(out, ["sampen"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_SAMPLE_ENTROPY = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               LEAD(v, 1) OVER w AS v1, LEAD(v, 2) OVER w AS v2,
               ROW_NUMBER() OVER w AS rn
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    tol AS (SELECT event_type, count(*) AS n,
                   round(0.2 * stddev_samp(v), 6) + 0.0 AS tol
            FROM daily GROUP BY 1),
    b2 AS (
        SELECT a.event_type, count(*) AS b
        FROM r a JOIN r b ON a.event_type = b.event_type AND a.rn < b.rn
        JOIN tol ON tol.event_type = a.event_type
        WHERE a.v1 IS NOT NULL AND b.v1 IS NOT NULL
          AND greatest(abs(a.v - b.v), abs(a.v1 - b.v1)) <= tol.tol
        GROUP BY 1
    ),
    a3 AS (
        SELECT a.event_type, count(*) AS a
        FROM r a JOIN r b ON a.event_type = b.event_type AND a.rn < b.rn
        JOIN tol ON tol.event_type = a.event_type
        WHERE a.v2 IS NOT NULL AND b.v2 IS NOT NULL
          AND greatest(abs(a.v - b.v), abs(a.v1 - b.v1),
                       abs(a.v2 - b.v2)) <= tol.tol
        GROUP BY 1
    )
    SELECT t.event_type, CAST(t.n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN t.n >= 4 AND t.tol > 0
                          AND COALESCE(a3.a, 0) > 0
                          AND COALESCE(b2.b, 0) > 0
                         THEN round(-ln(a3.a * 1.0 / b2.b), 6) + 0.0 END,
                    {NULLF}) AS sampen,
           CAST(CASE WHEN t.n >= 4 AND t.tol > 0
                     THEN COALESCE(a3.a, 0) ELSE 0 END AS BIGINT) AS n_a,
           CAST(CASE WHEN t.n >= 4 AND t.tol > 0
                     THEN COALESCE(b2.b, 0) ELSE 0 END AS BIGINT) AS n_b
    FROM tol t
    LEFT JOIN b2 USING (event_type) LEFT JOIN a3 USING (event_type)
    ORDER BY 1
"""


def q_von_neumann_daily(sf_dir: str) -> pd.DataFrame:
    """Von Neumann ratio per series (1941 successive-difference test):
    η = Σ(vₜ₊₁−vₜ)² / Σ(v−v̄)² — ≈2 under independence, <2 under positive
    autocorrelation, >2 under alternation. Pure moment algebra."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            den = ((v - v.mean()) ** 2).sum()
            if len(v) < 2 or den <= 0:
                rows.append((et, len(v), np.nan))
                continue
            eta = (np.diff(v) ** 2).sum() / den
            rows.append((et, len(v), np.round(eta, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days", "vn_eta"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["vn_eta"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_VON_NEUMANN = f"""
    WITH daily AS ({_DAILY_SQL}),
    d AS (
        SELECT event_type, v,
               v - LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS dv,
               avg(v) OVER (PARTITION BY event_type) AS mu
        FROM daily
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           COALESCE(CASE WHEN count(*) >= 2
                          AND sum((v - mu) * (v - mu)) > 0
                         THEN round(sum(dv * dv)
                                    / sum((v - mu) * (v - mu)), 6) + 0.0
                    END, {NULLF}) AS vn_eta
    FROM d GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# turning points test / ACF whiteness audit / pairwise mean contrasts
# ---------------------------------------------------------------------------

def q_turning_points_daily(sf_dir: str) -> pd.DataFrame:
    """Kendall turning-points randomness test per series: count interior
    local extrema (vₜ₋₁<vₜ>vₜ₊₁ or vₜ₋₁>vₜ<vₜ₊₁), compare to the i.i.d.
    expectation 2(n−2)/3 with variance (16n−29)/90 → z-score. Strict
    inequalities; plateau points are not turning points."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n = len(v)
            if n < 3:
                rows.append((et, n, 0, np.nan, np.nan))
                continue
            a, b, c = v[:-2], v[1:-1], v[2:]
            tp = int((((b > a) & (b > c)) | ((b < a) & (b < c))).sum())
            exp = 2.0 * (n - 2) / 3.0
            var = (16.0 * n - 29.0) / 90.0
            z = (tp - exp) / np.sqrt(var)
            rows.append((et, n, tp, np.round(exp, 6) + 0.0,
                         np.round(z, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "n_turning", "expected", "z"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["n_days", "n_turning"]] = out[["n_days", "n_turning"]] \
        .astype(np.int64)
    out = _fill(out, ["expected", "z"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_TURNING_POINTS = f"""
    WITH daily AS ({_DAILY_SQL}),
    w AS (
        SELECT event_type, v,
               LAG(v) OVER s AS pv, LEAD(v) OVER s AS nv,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily WINDOW s AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                          AND ((v > pv AND v > nv) OR (v < pv AND v < nv))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_turning,
           COALESCE(CASE WHEN any_value(n) >= 3
                         THEN round(2.0 * (any_value(n) - 2) / 3.0, 6) + 0.0
                    END, {NULLF}) AS expected,
           COALESCE(CASE WHEN any_value(n) >= 3
                         THEN round((sum(CASE WHEN pv IS NOT NULL
                                           AND nv IS NOT NULL
                                           AND ((v > pv AND v > nv)
                                                OR (v < pv AND v < nv))
                                          THEN 1 ELSE 0 END)
                                     - 2.0 * (any_value(n) - 2) / 3.0)
                                    / sqrt((16.0 * any_value(n) - 29.0)
                                           / 90.0), 6) + 0.0 END, {NULLF})
               AS z
    FROM w GROUP BY 1 ORDER BY 1
"""


def q_acf_whiteness_daily(sf_dir: str) -> pd.DataFrame:
    """Correlogram whiteness audit per series: how many of the first 10
    sample autocorrelations breach the Bartlett ±1.96/√n band (the visual
    'is this residual white?' check, quantified). ACF values round to 6
    before the breach comparison so both engines flag identically."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n = len(v)
            dv = v - v.mean()
            den = (dv ** 2).sum()
            if n < 11 or den <= 0:
                rows.append((et, n, 0, np.nan))
                continue
            bound = np.round(1.96 / np.sqrt(n), 6) + 0.0
            breaches = 0
            worst = 0.0
            for k in range(1, 11):
                rk = np.round((dv[k:] * dv[:-k]).sum() / den, 6) + 0.0
                breaches += int(abs(rk) > bound)
                worst = max(worst, abs(rk))
            rows.append((et, n, breaches, np.round(worst, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "n_breaches", "max_abs_acf"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["n_days", "n_breaches"]] = out[["n_days", "n_breaches"]] \
        .astype(np.int64)
    out = _fill(out, ["max_abs_acf"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_ACF_WHITENESS = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, count(*) AS n
          FROM daily GROUP BY 1),
    r AS (
        SELECT d.event_type, d.v, m.mu, m.n,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.d) AS rn
        FROM daily d JOIN m USING (event_type)
    ),
    den AS (SELECT event_type, sum((v - mu) * (v - mu)) AS den
            FROM r GROUP BY 1),
    ks AS (SELECT unnest(range(1, 11)) AS k),
    acf AS (
        SELECT a.event_type, ks.k,
               round(sum((a.v - a.mu) * (b.v - b.mu))
                     / any_value(den.den), 6) + 0.0 AS rk,
               any_value(a.n) AS n
        FROM ks, r a
        JOIN r b ON a.event_type = b.event_type AND a.rn = b.rn + ks.k
        JOIN den ON den.event_type = a.event_type
        WHERE den.den > 0 AND a.n >= 11
        GROUP BY 1, 2
    ),
    agg AS (
        SELECT event_type, any_value(n) AS n,
               sum(CASE WHEN abs(rk) > round(1.96 / sqrt(n), 6) + 0.0
                        THEN 1 ELSE 0 END) AS breaches,
               max(abs(rk)) AS worst
        FROM acf GROUP BY 1
    ),
    base AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1)
    SELECT base.event_type, CAST(base.n AS BIGINT) AS n_days,
           CAST(COALESCE(agg.breaches, 0) AS BIGINT) AS n_breaches,
           COALESCE(round(agg.worst, 6) + 0.0, {NULLF}) AS max_abs_acf
    FROM base LEFT JOIN agg USING (event_type)
    ORDER BY 1
"""


def q_pairwise_mean_diff_events(sf_dir: str) -> pd.DataFrame:
    """Post-hoc pairwise contrasts after the day-of-week ANOVA family:
    for every event-type pair, the mean-value difference with the pooled-
    variance standard error and Bonferroni-adjusted 95% CI (10 pairs →
    z = 2.807, the Šidák-free classic). One moment row per type crosses;
    pairing is driver-side over k rows."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["v2"] = b["value"].to_numpy(np.float64) ** 2
        b["one"] = 1.0
        return b[["event_type", "one", "value", "v2"]]

    g = hash_aggregate(ev.map_batches(moments, batch_format="pandas"),
                       ["event_type"],
                       {"n": ("one", "sum"), "s": ("value", "sum"),
                        "ss": ("v2", "sum")},
                       num_partitions=_NP).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    n = g["n"].to_numpy(np.float64)
    m = g["s"].to_numpy(np.float64) / n
    sse = g["ss"].to_numpy(np.float64) - n * m * m
    s2p = sse.sum() / (n.sum() - len(n))  # pooled within variance
    Z = 2.807  # Bonferroni 0.05/10 two-sided normal quantile
    rows = []
    for i in range(len(g)):
        for j in range(i + 1, len(g)):
            diff = m[i] - m[j]
            se = np.sqrt(s2p * (1.0 / n[i] + 1.0 / n[j]))
            rows.append((g["event_type"][i], g["event_type"][j],
                         np.round(diff, 6) + 0.0, np.round(se, 6) + 0.0,
                         np.round(diff - Z * se, 6) + 0.0,
                         np.round(diff + Z * se, 6) + 0.0))
    return pd.DataFrame(rows, columns=["et_a", "et_b", "mean_diff",
                                       "se", "ci_lo", "ci_hi"])


SQL_PAIRWISE_MEAN_DIFF = """
    WITH g AS (
        SELECT event_type, count(*)::DOUBLE AS n, avg(value) AS m,
               sum(value * value) - count(*) * avg(value) * avg(value)
                   AS sse
        FROM events GROUP BY 1
    ),
    pool AS (SELECT sum(sse) / (sum(n) - count(*)) AS s2p FROM g)
    SELECT a.event_type AS et_a, b.event_type AS et_b,
           round(a.m - b.m, 6) + 0.0 AS mean_diff,
           round(sqrt(pool.s2p * (1 / a.n + 1 / b.n)), 6) + 0.0 AS se,
           round(a.m - b.m - 2.807 * sqrt(pool.s2p * (1 / a.n + 1 / b.n)),
                 6) + 0.0 AS ci_lo,
           round(a.m - b.m + 2.807 * sqrt(pool.s2p * (1 / a.n + 1 / b.n)),
                 6) + 0.0 AS ci_hi
    FROM g a JOIN g b ON a.event_type < b.event_type
    CROSS JOIN pool
    ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# DAU half-life / weekend effect / Chapman capture-recapture
# ---------------------------------------------------------------------------

def q_dau_halflife_events(sf_dir: str) -> pd.DataFrame:
    """Audience-decay half-life: OLS of ln(DAU) on the day index; when the
    slope is negative, half-life = ln2/(−slope) days (NULLF for flat or
    growing audiences — no decay to halve). The log-linear survival read
    of the engine's distinct-count spine."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["d"] = b["ts"].dt.floor("D")
        return b[["d", "user_id"]]

    dau = hash_aggregate(
        ev.map_batches(day_fn, batch_format="pandas"), ["d", "user_id"],
        {"one": ("user_id", "size")}, num_partitions=_NP)
    daily = hash_count(dau, ["d"], out_col="dau",
                       num_partitions=4).to_pandas().sort_values("d")
    y = np.log(daily["dau"].to_numpy(np.float64))
    t = np.arange(len(y), dtype=np.float64)
    tm, ym = t.mean(), y.mean()
    slope = ((t - tm) * (y - ym)).sum() / ((t - tm) ** 2).sum()
    hl = np.log(2.0) / -slope if slope < 0 else np.nan
    return pd.DataFrame({
        "n_days": [np.int64(len(y))],
        "slope": [np.round(slope, 6) + 0.0],
        "halflife_days": [np.round(hl, 6) + 0.0 if np.isfinite(hl)
                          else NULLF],
    })


SQL_DAU_HALFLIFE = f"""
    WITH dau AS (
        SELECT date_trunc('day', ts) AS d,
               count(DISTINCT user_id)::DOUBLE AS dau
        FROM events GROUP BY 1
    ),
    r AS (SELECT ln(dau) AS y,
                 ROW_NUMBER() OVER (ORDER BY d) - 1.0 AS t
          FROM dau),
    fit AS (SELECT count(*) AS n, regr_slope(y, t) AS slope FROM r)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(slope, 6) + 0.0 AS slope,
           COALESCE(CASE WHEN slope < 0
                         THEN round(ln(2) / -slope, 6) + 0.0 END, {NULLF})
               AS halflife_days
    FROM fit
"""


def q_weekend_effect_daily(sf_dir: str) -> pd.DataFrame:
    """Weekend effect per series: Welch t statistic between weekend and
    weekday daily values (the calendar-feature significance screen before
    adding dow terms to a model). NULLF when either side has < 2 days."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            we = g["d"].dt.dayofweek.to_numpy() >= 5
            a = g["v"].to_numpy(np.float64)[we]
            b = g["v"].to_numpy(np.float64)[~we]
            if len(a) < 2 or len(b) < 2:
                rows.append((et, len(a), len(b), np.nan, np.nan))
                continue
            diff = a.mean() - b.mean()
            se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
            t = diff / se if se > 0 else np.nan
            rows.append((et, len(a), len(b), np.round(diff, 6) + 0.0,
                         np.round(t, 6) + 0.0 if np.isfinite(t)
                         else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n_weekend",
                                           "n_weekday", "mean_diff",
                                           "welch_t"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["n_weekend", "n_weekday"]] = out[["n_weekend", "n_weekday"]] \
        .astype(np.int64)
    out = _fill(out, ["mean_diff", "welch_t"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_WEEKEND_EFFECT = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (SELECT event_type, v, isodow(d) >= 6 AS we FROM daily),
    a AS (SELECT event_type,
                 count(*) FILTER (we) AS na,
                 count(*) FILTER (NOT we) AS nb,
                 avg(v) FILTER (we) AS ma,
                 avg(v) FILTER (NOT we) AS mb,
                 var_samp(v) FILTER (we) AS va,
                 var_samp(v) FILTER (NOT we) AS vb
          FROM t GROUP BY 1)
    SELECT event_type, CAST(na AS BIGINT) AS n_weekend,
           CAST(nb AS BIGINT) AS n_weekday,
           COALESCE(CASE WHEN na >= 2 AND nb >= 2
                         THEN round(ma - mb, 6) + 0.0 END, {NULLF})
               AS mean_diff,
           COALESCE(CASE WHEN na >= 2 AND nb >= 2
                          AND va / na + vb / nb > 0
                         THEN round((ma - mb) / sqrt(va / na + vb / nb),
                                    6) + 0.0 END, {NULLF}) AS welch_t
    FROM a ORDER BY 1
"""


def q_chapman_estimate_users(sf_dir: str) -> pd.DataFrame:
    """Chapman capture-recapture estimate of the total user population
    from two 'capture' windows (first vs second half of the event span):
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1 with m = users seen in both — the
    ecology estimator data teams reuse to size unseen populations.
    Per-user window flags reduce map-side; three counts leave."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    bounds = ev.map_batches(
        lambda b: pd.DataFrame({"lo": [b["ts"].astype("int64").min()],
                                "hi": [b["ts"].astype("int64").max()]}),
        batch_format="pandas").to_pandas()
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64").to_numpy()
        first = us <= mid
        return pd.DataFrame({"user_id": b["user_id"],
                             "w1": first.astype(np.int64),
                             "w2": (~first).astype(np.int64)})

    per_user = hash_aggregate(
        ev.map_batches(flags, batch_format="pandas"), ["user_id"],
        {"w1": ("w1", "max"), "w2": ("w2", "max")},
        num_partitions=_NP).to_pandas()
    n1 = int(per_user["w1"].sum())
    n2 = int(per_user["w2"].sum())
    m = int(((per_user["w1"] == 1) & (per_user["w2"] == 1)).sum())
    true_n = len(per_user)
    est = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    return pd.DataFrame({
        "n_window1": [np.int64(n1)], "n_window2": [np.int64(n2)],
        "n_both": [np.int64(m)], "n_true": [np.int64(true_n)],
        "chapman_estimate": [np.round(est, 6) + 0.0],
    })


SQL_CHAPMAN_ESTIMATE = """
    WITH mid AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
        FROM events
    ),
    u AS (
        SELECT user_id,
               max(CASE WHEN epoch_us(ts) <= mid.m THEN 1 ELSE 0 END) AS w1,
               max(CASE WHEN epoch_us(ts) > mid.m THEN 1 ELSE 0 END) AS w2
        FROM events CROSS JOIN mid GROUP BY 1
    )
    SELECT CAST(sum(w1) AS BIGINT) AS n_window1,
           CAST(sum(w2) AS BIGINT) AS n_window2,
           CAST(sum(CASE WHEN w1 = 1 AND w2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_both,
           CAST(count(*) AS BIGINT) AS n_true,
           round((sum(w1) + 1.0) * (sum(w2) + 1.0)
                 / (sum(CASE WHEN w1 = 1 AND w2 = 1 THEN 1 ELSE 0 END)
                    + 1.0) - 1.0, 6) + 0.0 AS chapman_estimate
    FROM u
"""


# ---------------------------------------------------------------------------
# Burrows' Delta stylometry / ABC classification / calibration table
# ---------------------------------------------------------------------------

def q_burrows_delta_sources(sf_dir: str) -> pd.DataFrame:
    """Burrows' Delta stylometric distance (Burrows 2002) between the
    first four sources: over the corpus's top-50 tokens (count desc, token
    asc), each source's relative frequency z-scores against the across-
    ALL-sources distribution (ddof=1), Delta(a,b) = mean |z_a − z_b|.
    Counts build combiner-first; only the 20×50 frequency matrix reaches
    the driver (bounded by design)."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[["source"]].copy()
        ex["tok"] = b["text"].str.split()
        ex = ex.explode("tok").dropna(subset=["tok"])
        vc = ex.groupby(["source", "tok"], sort=False).size()
        return vc.rename("cnt").reset_index() \
            .rename(columns={"tok": "token"})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["source", "token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP).materialize()
    corpus = hash_aggregate(tc, ["token"], {"n": ("c", "sum")},
                            num_partitions=_NP).to_pandas()
    top = corpus.sort_values(["n", "token"],
                             ascending=[False, True]).head(50)["token"]
    top = list(top)
    sub = tc.filter(lambda r: r["token"] in set(top)).to_pandas()
    totals = hash_aggregate(tc, ["source"], {"N": ("c", "sum")},
                            num_partitions=_NP).to_pandas() \
        .set_index("source")["N"].astype(float)
    # relative-frequency matrix source × top-term (absent term → 0)
    mat = sub.pivot_table(index="source", columns="token", values="c",
                          aggfunc="sum", fill_value=0.0)
    mat = mat.reindex(index=totals.index, columns=top, fill_value=0.0)
    F = mat.to_numpy(np.float64) / totals.to_numpy(np.float64)[:, None]
    mu = F.mean(axis=0)
    sd = F.std(axis=0, ddof=1)
    Z = (F - mu) / np.where(sd > 0, sd, 1.0)
    Z[:, sd <= 0] = 0.0
    srcs = list(totals.index)
    zmap = {s: Z[i] for i, s in enumerate(srcs)}
    rows = []
    for i, a in enumerate(_KL_SOURCES):
        for b in _KL_SOURCES[i + 1:]:
            delta = float(np.abs(zmap[a] - zmap[b]).mean())
            rows.append((a, b, np.round(delta, 6) + 0.0))
    return pd.DataFrame(rows, columns=["src_a", "src_b", "delta"])


SQL_BURROWS_DELTA = r"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT source, token, count(*)::DOUBLE AS c
           FROM tok GROUP BY 1, 2),
    corpus AS (SELECT token, sum(c) AS n FROM tc GROUP BY 1),
    top AS (SELECT token FROM corpus
            ORDER BY n DESC, token LIMIT 50),
    totals AS (SELECT source, sum(c) AS N FROM tc GROUP BY 1),
    grid AS (SELECT t.source, top.token, t.N
             FROM totals t CROSS JOIN top),
    f AS (
        SELECT g.source, g.token,
               COALESCE(tc.c, 0) / g.N AS f
        FROM grid g LEFT JOIN tc
          ON tc.source = g.source AND tc.token = g.token
    ),
    stats AS (SELECT token, avg(f) AS mu, stddev_samp(f) AS sd
              FROM f GROUP BY 1),
    z AS (
        SELECT f.source, f.token,
               CASE WHEN s.sd > 0 THEN (f.f - s.mu) / s.sd ELSE 0 END AS z
        FROM f JOIN stats s USING (token)
    ),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b, a.token,
               abs(a.z - b.z) AS az
        FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
        WHERE a.source IN ('src0', 'src1', 'src2', 'src3')
          AND b.source IN ('src0', 'src1', 'src2', 'src3')
    )
    SELECT src_a, src_b, round(avg(az), 6) + 0.0 AS delta
    FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_abc_classification_parts(sf_dir: str) -> pd.DataFrame:
    """ABC revenue classification of parts (the Pareto inventory policy):
    parts ranked by revenue (desc, partkey asc), class A while the
    cumulative share ≤ 80%, B while ≤ 95%, else C — classes cut on the
    ROUNDED cumulative share so both engines draw identical boundaries.
    Output: per-class part counts and revenue share."""
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["r"] = (b["l_extendedprice"].to_numpy(np.float64)
                  * (1.0 - b["l_discount"].to_numpy(np.float64)))
        return b[["l_partkey", "r"]]

    per_part = hash_aggregate(li.map_batches(rev, batch_format="pandas"),
                              ["l_partkey"], {"rev": ("r", "sum")},
                              num_partitions=_NP).to_pandas()
    per_part = per_part.sort_values(["rev", "l_partkey"],
                                    ascending=[False, True])
    r = per_part["rev"].to_numpy(np.float64)
    cum = np.round(np.cumsum(r) / r.sum(), 6) + 0.0
    cls = np.where(cum <= 0.80, "A", np.where(cum <= 0.95, "B", "C"))
    per_part["cls"] = cls
    g = per_part.groupby("cls")["rev"]
    out = pd.DataFrame({"abc_class": g.size().index,
                        "n_parts": g.size().to_numpy(np.int64),
                        "revenue_share": np.round(
                            g.sum().to_numpy(np.float64) / r.sum(), 6)
                        + 0.0})
    return out.sort_values("abc_class").reset_index(drop=True)


SQL_ABC_CLASSIFICATION = """
    WITH pp AS (
        SELECT l_partkey,
               sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem GROUP BY 1
    ),
    c AS (
        SELECT l_partkey, rev,
               round(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                    ROWS UNBOUNDED PRECEDING)
                     / (SELECT sum(rev) FROM pp), 6) + 0.0 AS cum
        FROM pp
    ),
    t AS (SELECT CASE WHEN cum <= 0.80 THEN 'A'
                      WHEN cum <= 0.95 THEN 'B' ELSE 'C' END AS abc_class,
                 rev
          FROM c)
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rev) / (SELECT sum(rev) FROM pp), 6) + 0.0
               AS revenue_share
    FROM t GROUP BY 1 ORDER BY 1
"""


def q_calibration_users(sf_dir: str) -> pd.DataFrame:
    """Reliability (calibration) table of a naive behavioral predictor:
    each user's FIRST-half purchase share predicts whether they purchase
    in the second half; predictions bucket into deciles (on the ROUNDED
    share) and each bucket reports mean predicted vs observed rate — the
    calibration-curve primitive under every probabilistic model eval."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    bounds = ev.map_batches(
        lambda b: pd.DataFrame({"lo": [b["ts"].astype("int64").min()],
                                "hi": [b["ts"].astype("int64").max()]}),
        batch_format="pandas").to_pandas()
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64").to_numpy()
        first = us <= mid
        isp = (b["event_type"] == "purchase").to_numpy()
        return pd.DataFrame({
            "user_id": b["user_id"],
            "n1": first.astype(np.int64),
            "p1": (first & isp).astype(np.int64),
            "p2": (~first & isp).astype(np.int64)})

    per_user = hash_aggregate(
        ev.map_batches(flags, batch_format="pandas"), ["user_id"],
        {"n1": ("n1", "sum"), "p1": ("p1", "sum"), "p2": ("p2", "max")},
        num_partitions=_NP).to_pandas()
    per_user = per_user[per_user["n1"] > 0]
    pred = np.round(per_user["p1"].to_numpy(np.float64)
                    / per_user["n1"].to_numpy(np.float64), 6) + 0.0
    dec = np.minimum((pred * 10).astype(np.int64), 9)
    obs = per_user["p2"].to_numpy(np.float64)
    df = pd.DataFrame({"decile": dec, "pred": pred, "obs": obs})
    g = df.groupby("decile")
    out = pd.DataFrame({
        "decile": g.size().index.astype(np.int64),
        "n_users": g.size().to_numpy(np.int64),
        "mean_pred": np.round(g["pred"].mean().to_numpy(np.float64),
                              6) + 0.0,
        "obs_rate": np.round(g["obs"].mean().to_numpy(np.float64),
                             6) + 0.0})
    return out.sort_values("decile").reset_index(drop=True)


SQL_CALIBRATION_USERS = """
    WITH mid AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
        FROM events
    ),
    u AS (
        SELECT user_id,
               sum(CASE WHEN epoch_us(ts) <= mid.m THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN epoch_us(ts) <= mid.m
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS p1,
               max(CASE WHEN epoch_us(ts) > mid.m
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS p2
        FROM events CROSS JOIN mid GROUP BY 1
    ),
    t AS (
        SELECT least(CAST(floor((round(p1 * 1.0 / n1, 6) + 0.0) * 10)
                          AS BIGINT), 9) AS decile,
               round(p1 * 1.0 / n1, 6) + 0.0 AS pred,
               p2::DOUBLE AS obs
        FROM u WHERE n1 > 0
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
           round(avg(pred), 6) + 0.0 AS mean_pred,
           round(avg(obs), 6) + 0.0 AS obs_rate
    FROM t GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Brier decomposition / crawl politeness gaps / partial correlation
# ---------------------------------------------------------------------------

def q_brier_decomposition_users(sf_dir: str) -> pd.DataFrame:
    """Brier score of the first-half→second-half purchase predictor plus
    its Murphy (1973) decile decomposition: reliability
    Σnₖ(p̄ₖ−ōₖ)²/N, resolution Σnₖ(ōₖ−ō)²/N and uncertainty ō(1−ō) —
    the standard probabilistic-forecast quality split (identity exact only
    for bin-constant forecasts, so all four report independently)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    bounds = ev.map_batches(
        lambda b: pd.DataFrame({"lo": [b["ts"].astype("int64").min()],
                                "hi": [b["ts"].astype("int64").max()]}),
        batch_format="pandas").to_pandas()
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64").to_numpy()
        first = us <= mid
        isp = (b["event_type"] == "purchase").to_numpy()
        return pd.DataFrame({
            "user_id": b["user_id"],
            "n1": first.astype(np.int64),
            "p1": (first & isp).astype(np.int64),
            "p2": (~first & isp).astype(np.int64)})

    per_user = hash_aggregate(
        ev.map_batches(flags, batch_format="pandas"), ["user_id"],
        {"n1": ("n1", "sum"), "p1": ("p1", "sum"), "p2": ("p2", "max")},
        num_partitions=_NP).to_pandas()
    per_user = per_user[per_user["n1"] > 0]
    pred = np.round(per_user["p1"].to_numpy(np.float64)
                    / per_user["n1"].to_numpy(np.float64), 6) + 0.0
    obs = per_user["p2"].to_numpy(np.float64)
    N = float(len(pred))
    brier = ((pred - obs) ** 2).mean()
    dec = np.minimum((pred * 10).astype(np.int64), 9)
    df = pd.DataFrame({"k": dec, "p": pred, "o": obs})
    g = df.groupby("k")
    nk = g.size().to_numpy(np.float64)
    pk = g["p"].mean().to_numpy(np.float64)
    ok = g["o"].mean().to_numpy(np.float64)
    obar = obs.mean()
    rel = (nk * (pk - ok) ** 2).sum() / N
    res = (nk * (ok - obar) ** 2).sum() / N
    unc = obar * (1.0 - obar)
    return pd.DataFrame({
        "n_users": [np.int64(N)],
        "brier": [np.round(brier, 6) + 0.0],
        "reliability": [np.round(rel, 6) + 0.0],
        "resolution": [np.round(res, 6) + 0.0],
        "uncertainty": [np.round(unc, 6) + 0.0],
    })


SQL_BRIER_DECOMPOSITION = """
    WITH mid AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
        FROM events
    ),
    u AS (
        SELECT user_id,
               sum(CASE WHEN epoch_us(ts) <= mid.m THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN epoch_us(ts) <= mid.m
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS p1,
               max(CASE WHEN epoch_us(ts) > mid.m
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS p2
        FROM events CROSS JOIN mid GROUP BY 1
    ),
    t AS (
        SELECT round(p1 * 1.0 / n1, 6) + 0.0 AS pred, p2::DOUBLE AS obs,
               least(CAST(floor((round(p1 * 1.0 / n1, 6) + 0.0) * 10)
                          AS BIGINT), 9) AS k
        FROM u WHERE n1 > 0
    ),
    tot AS (SELECT count(*)::DOUBLE AS N, avg(obs) AS obar,
                   avg((pred - obs) * (pred - obs)) AS brier
            FROM t),
    bins AS (SELECT k, count(*)::DOUBLE AS nk, avg(pred) AS pk,
                    avg(obs) AS ok
             FROM t GROUP BY 1)
    SELECT CAST(tot.N AS BIGINT) AS n_users,
           round(tot.brier, 6) + 0.0 AS brier,
           round(sum(bins.nk * (bins.pk - bins.ok) * (bins.pk - bins.ok))
                 / tot.N, 6) + 0.0 AS reliability,
           round(sum(bins.nk * (bins.ok - tot.obar) * (bins.ok - tot.obar))
                 / tot.N, 6) + 0.0 AS resolution,
           round(tot.obar * (1 - tot.obar), 6) + 0.0 AS uncertainty
    FROM bins CROSS JOIN tot
    GROUP BY tot.N, tot.brier, tot.obar
"""


def q_crawl_gaps_pages(sf_dir: str) -> pd.DataFrame:
    """Crawl-politeness profile of the synthesized Common-Crawl pages
    (entry()'s formulas): per host, the inter-crawl gaps of sorted
    warc_ts — page count, min and median gap in seconds. The politeness
    audit a crawl scheduler runs per domain; the oracle recomputes the
    synthesis arithmetic in SQL."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def to_ts(b: pd.DataFrame) -> pd.DataFrame:
        host = (b["source"].str.lower().str.replace(" ", "-")
                + ".example.com")
        ts = (_PAGE_EPOCH_US
              + (b["doc_id"].astype(np.int64) * _PAGE_STRIDE)
              % _PAGE_SPAN_US)
        return pd.DataFrame({"host": host, "ts_us": ts})

    pages = docs.map_batches(to_ts, batch_format="pandas")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for h, g in part.groupby("host", sort=False):
            ts = np.sort(g["ts_us"].to_numpy(np.int64))
            if len(ts) < 2:
                rows.append((h, len(ts), np.nan, np.nan))
                continue
            gaps = np.diff(ts) / 1e6
            rows.append((h, len(ts),
                         np.round(gaps.min(), 6) + 0.0,
                         np.round(np.quantile(gaps, 0.5), 6) + 0.0))
        return pd.DataFrame(rows, columns=["host", "n_pages",
                                           "min_gap_s", "median_gap_s"])

    out = keyed_map_partitions(pages, ["host"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_pages"] = out["n_pages"].astype(np.int64)
    out = _fill(out, ["min_gap_s", "median_gap_s"])
    return out.sort_values("host").reset_index(drop=True)


SQL_CRAWL_GAPS = f"""
    WITH pages AS (
        SELECT lower(replace(source, ' ', '-')) || '.example.com' AS host,
               ({_PAGE_EPOCH_US} + (doc_id * {_PAGE_STRIDE})
                % {_PAGE_SPAN_US}) AS ts_us
        FROM documents
    ),
    g AS (
        SELECT host,
               (ts_us - LAG(ts_us) OVER (PARTITION BY host
                                         ORDER BY ts_us)) / 1e6 AS gap
        FROM pages
    )
    SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
           COALESCE(round(min(gap), 6) + 0.0, {NULLF}) AS min_gap_s,
           COALESCE(round(quantile_cont(gap, 0.5), 6) + 0.0, {NULLF})
               AS median_gap_s
    FROM g GROUP BY 1 ORDER BY 1
"""


def q_partial_corr_daily(sf_dir: str) -> pd.DataFrame:
    """Partial correlation between every series pair controlling for the
    MARKET (the all-types daily total): r_ab·z = (r_ab − r_az·r_bz) /
    √((1−r_az²)(1−r_bz²)) — separates genuine co-movement from shared
    market exposure. The k-series spine is collected for the k² pairing
    (k tiny by construction)."""
    daily = _bucket_series(sf_dir, DAY_US, "d")
    wide = daily.to_pandas().pivot_table(index="d", columns="event_type",
                                         values="v", aggfunc="sum")
    market = wide.sum(axis=1)
    ets = sorted(wide.columns)

    def corr(x, y):
        m = x.notna() & y.notna()
        xv, yv = x[m].to_numpy(np.float64), y[m].to_numpy(np.float64)
        xv, yv = xv - xv.mean(), yv - yv.mean()
        den = np.sqrt((xv ** 2).sum() * (yv ** 2).sum())
        return float((xv * yv).sum() / den) if den > 0 else np.nan

    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            rab = corr(wide[a], wide[b])
            raz = corr(wide[a], market)
            rbz = corr(wide[b], market)
            den = np.sqrt((1 - raz ** 2) * (1 - rbz ** 2))
            pc = (rab - raz * rbz) / den if den > 0 else np.nan
            rows.append((a, b, np.round(rab, 6) + 0.0,
                         np.round(pc, 6) + 0.0 if np.isfinite(pc)
                         else NULLF))
    return pd.DataFrame(rows, columns=["et_a", "et_b", "corr_raw",
                                       "corr_partial"])


SQL_PARTIAL_CORR = f"""
    WITH daily AS ({_DAILY_SQL}),
    mkt AS (SELECT d, sum(v) AS z FROM daily GROUP BY 1),
    j AS (SELECT d1.event_type AS et, d1.v, mkt.z
          FROM daily d1 JOIN mkt USING (d)),
    rz AS (SELECT et, corr(v, z) AS r FROM j GROUP BY 1),
    pair AS (
        SELECT a.event_type AS et_a, b.event_type AS et_b,
               corr(a.v, b.v) AS rab
        FROM daily a JOIN daily b
          ON a.d = b.d AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.et_a, p.et_b, round(p.rab, 6) + 0.0 AS corr_raw,
           COALESCE(CASE WHEN (1 - ra.r * ra.r) * (1 - rb.r * rb.r) > 0
                         THEN round((p.rab - ra.r * rb.r)
                                    / sqrt((1 - ra.r * ra.r)
                                           * (1 - rb.r * rb.r)), 6) + 0.0
                    END, {NULLF}) AS corr_partial
    FROM pair p
    JOIN rz ra ON ra.et = p.et_a
    JOIN rz rb ON rb.et = p.et_b
    ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Dunning G² keyness / vocabulary coverage / Wilcoxon signed-rank
# ---------------------------------------------------------------------------

def q_keyness_g2_src0(sf_dir: str) -> pd.DataFrame:
    """Dunning (1993) log-likelihood keyness: the 20 tokens most
    distinctive of src0 vs the REST of the corpus by
    G² = 2·Σ O·ln(O/E) over each token's 2×2 table (zero cells contribute
    0), ranked on the ROUNDED statistic (tie → token asc). The corpus-
    comparison keyword extractor; counts build combiner-first."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame({
            "grp": np.where(b["source"].to_numpy() == "src0", "a", "b"),
            "tok": b["text"].str.split().to_numpy()})
        ex = ex.explode("tok").dropna(subset=["tok"])
        vc = ex.groupby(["grp", "tok"], sort=False).size()
        return vc.rename("cnt").reset_index() \
            .rename(columns={"tok": "token"})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["grp", "token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP).to_pandas()
    piv = tc.pivot_table(index="token", columns="grp", values="c",
                         aggfunc="sum", fill_value=0.0)
    a = piv.get("a", pd.Series(0, index=piv.index)).to_numpy(np.float64)
    b = piv.get("b", pd.Series(0, index=piv.index)).to_numpy(np.float64)
    NA, NB = a.sum(), b.sum()

    def term(o, e):
        with np.errstate(divide="ignore", invalid="ignore"):
            t = o * np.log(np.where(o > 0, o / e, 1.0))
        return np.where(o > 0, t, 0.0)

    ea = (a + b) * NA / (NA + NB)
    eb = (a + b) * NB / (NA + NB)
    g2 = np.round(2.0 * (term(a, ea) + term(b, eb)), 6) + 0.0
    out = pd.DataFrame({"token": piv.index, "n_src0": a.astype(np.int64),
                        "n_rest": b.astype(np.int64), "g2": g2,
                        "overused": a / NA > b / NB})
    out = out.sort_values(["g2", "token"],
                          ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


SQL_KEYNESS_G2 = r"""
    WITH tok AS (
      SELECT CASE WHEN source = 'src0' THEN 'a' ELSE 'b' END AS grp,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT token,
                  sum(CASE WHEN grp = 'a' THEN 1 ELSE 0 END)::DOUBLE AS a,
                  sum(CASE WHEN grp = 'b' THEN 1 ELSE 0 END)::DOUBLE AS b
           FROM tok GROUP BY 1),
    n AS (SELECT sum(a) AS na, sum(b) AS nb FROM tc),
    g AS (
        SELECT tc.token, tc.a, tc.b,
               round(2 * (
                   CASE WHEN tc.a > 0 THEN tc.a * ln(tc.a /
                       ((tc.a + tc.b) * n.na / (n.na + n.nb))) ELSE 0 END
                 + CASE WHEN tc.b > 0 THEN tc.b * ln(tc.b /
                       ((tc.a + tc.b) * n.nb / (n.na + n.nb))) ELSE 0 END
               ), 6) + 0.0 AS g2,
               tc.a / n.na > tc.b / n.nb AS overused
        FROM tc CROSS JOIN n
    )
    SELECT token, CAST(a AS BIGINT) AS n_src0, CAST(b AS BIGINT) AS n_rest,
           g2, overused
    FROM g ORDER BY g2 DESC, token LIMIT 20
"""


def q_vocab_coverage_documents(sf_dir: str) -> pd.DataFrame:
    """Vocabulary coverage curve (the tokenizer-budget question): the
    share of the corpus token STREAM covered by the top-k types for
    k ∈ {100, 1000, 5000} (count desc, token asc rank). Three rows out
    of one ranked aggregate."""
    docs = _read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["text"].str.split().explode().dropna().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "cnt": vc.to_numpy(np.int64)})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP).to_pandas()
    tc = tc.sort_values(["c", "token"], ascending=[False, True])
    c = tc["c"].to_numpy(np.float64)
    total = c.sum()
    cum = np.cumsum(c)
    rows = []
    for k in (100, 1000, 5000):
        kk = min(k, len(c))
        rows.append((k, np.int64(kk),
                     np.round(cum[kk - 1] / total, 6) + 0.0))
    return pd.DataFrame(rows, columns=["k", "vocab_used", "coverage"]) \
        .astype({"k": np.int64})


SQL_VOCAB_COVERAGE = r"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT token, count(*)::DOUBLE AS c FROM tok GROUP BY 1),
    r AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token) AS rk,
               sum(c) OVER (ORDER BY c DESC, token
                            ROWS UNBOUNDED PRECEDING) AS cum,
               (SELECT sum(c) FROM tc) AS total,
               (SELECT count(*) FROM tc) AS v
        FROM tc
    ),
    ks AS (SELECT unnest([100, 1000, 5000]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(least(ks.k, r.v) AS BIGINT) AS vocab_used,
           round(r.cum / r.total, 6) + 0.0 AS coverage
    FROM ks JOIN r ON r.rk = least(ks.k, r.v)
    ORDER BY ks.k
"""


def q_wilcoxon_paired_daily(sf_dir: str) -> pd.DataFrame:
    """Wilcoxon signed-rank test pairing each series' day t with day
    t + n//2 (first half vs second half, matched by position): ranks of
    |d| (average ranks on ties, zero diffs dropped), W⁺ = Σ ranks of
    positive diffs, z against the normal approximation. Diffs are ROUNDED
    to 6 before ranking so tie groups match across engines."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            h = len(v) // 2
            d = np.round(v[h:2 * h] - v[:h], 6) + 0.0
            d = d[d != 0]
            n = len(d)
            if n < 2:
                rows.append((et, n, np.nan, np.nan))
                continue
            ad = np.abs(d)
            order = np.argsort(ad, kind="mergesort")
            ranks = np.empty(n, dtype=np.float64)
            sorted_ad = ad[order]
            i = 0
            while i < n:
                j = i
                while j + 1 < n and sorted_ad[j + 1] == sorted_ad[i]:
                    j += 1
                ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
                i = j + 1
            wplus = ranks[d > 0].sum()
            mu = n * (n + 1) / 4.0
            sig = np.sqrt(n * (n + 1) * (2 * n + 1) / 24.0)
            rows.append((et, n, np.round(wplus, 6) + 0.0,
                         np.round((wplus - mu) / sig, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_pairs",
                                           "w_plus", "z"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    out = _fill(out, ["w_plus", "z"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_WILCOXON_PAIRED = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    pairs AS (
        SELECT a.event_type,
               round(b.v - a.v, 6) + 0.0 AS diff
        FROM r a JOIN r b ON a.event_type = b.event_type
                          AND b.rn = a.rn + a.n // 2
        WHERE a.rn <= a.n // 2
    ),
    nz AS (SELECT event_type, diff, abs(diff) AS ad
           FROM pairs WHERE diff <> 0),
    rk AS (
        SELECT event_type, diff,
               (rank() OVER w + (count(*) OVER (PARTITION BY event_type, ad)
                                 - 1) / 2.0) AS arank
        FROM nz WINDOW w AS (PARTITION BY event_type ORDER BY ad)
    ),
    agg AS (
        SELECT event_type, count(*)::DOUBLE AS n,
               sum(CASE WHEN diff > 0 THEN arank ELSE 0 END) AS wplus
        FROM rk GROUP BY 1
    ),
    base AS (SELECT DISTINCT event_type FROM daily)
    SELECT base.event_type,
           CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_pairs,
           COALESCE(CASE WHEN agg.n >= 2
                         THEN round(agg.wplus, 6) + 0.0 END, {NULLF})
               AS w_plus,
           COALESCE(CASE WHEN agg.n >= 2
                         THEN round((agg.wplus - agg.n * (agg.n + 1) / 4.0)
                              / sqrt(agg.n * (agg.n + 1)
                                     * (2 * agg.n + 1) / 24.0), 6) + 0.0
                    END, {NULLF}) AS z
    FROM base LEFT JOIN agg USING (event_type)
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# piecewise hinge trend / activity streak histogram / daily mix entropy
# ---------------------------------------------------------------------------

def q_piecewise_trend_daily(sf_dir: str) -> pd.DataFrame:
    """Prophet-style piecewise-linear trend with ONE fixed changepoint at
    t=15 (days since series start): exact OLS of v on [1, t, max(0,t−15)]
    via Cramer's rule on the 3×3 normal equations — the slope-change
    coefficient IS the changepoint magnitude Prophet regularizes. Moments
    pre-reduce per partition; one coefficient row per series crosses."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    KNOT = 15.0

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            us = g["d"].astype("datetime64[us]").astype("int64").to_numpy()
            t = ((us - us.min()) // DAY_US).astype(np.float64)
            h = np.maximum(t - KNOT, 0.0)
            y = g["v"].to_numpy(np.float64)
            X = np.stack([np.ones_like(t), t, h], axis=1)
            A = X.T @ X
            bvec = X.T @ y
            det = np.linalg.det(A)
            if abs(det) < 1e-9:
                rows.append((et, len(y), np.nan, np.nan, np.nan))
                continue
            coef = []
            for c in range(3):
                M = A.copy()
                M[:, c] = bvec
                coef.append(np.linalg.det(M) / det)
            rows.append((et, len(y), np.round(coef[0], 6) + 0.0,
                         np.round(coef[1], 6) + 0.0,
                         np.round(coef[2], 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "intercept", "slope",
                                           "slope_change"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["intercept", "slope", "slope_change"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_PIECEWISE_TREND = f"""
    WITH daily AS ({_DAILY_SQL}),
    tt AS (
        SELECT event_type, v,
               CAST(datediff('day',
                    min(d) OVER (PARTITION BY event_type), d) AS DOUBLE)
                   AS t
        FROM daily
    ),
    x AS (SELECT event_type, v, t, greatest(t - 15.0, 0.0) AS h FROM tt),
    m AS (
        SELECT event_type, count(*)::DOUBLE AS n, sum(t) AS st,
               sum(h) AS sh, sum(t*t) AS stt, sum(t*h) AS sth,
               sum(h*h) AS shh, sum(v) AS sy, sum(v*t) AS syt,
               sum(v*h) AS syh
        FROM x GROUP BY 1
    ),
    dets AS (
        SELECT event_type, n,
               n*(stt*shh - sth*sth) - st*(st*shh - sth*sh)
                   + sh*(st*sth - stt*sh) AS det,
               sy*(stt*shh - sth*sth) - st*(syt*shh - sth*syh)
                   + sh*(syt*sth - stt*syh) AS det_a,
               n*(syt*shh - syh*sth) - sy*(st*shh - sth*sh)
                   + sh*(st*syh - syt*sh) AS det_b,
               n*(stt*syh - sth*syt) - st*(st*syh - syt*sh)
                   + sy*(st*sth - stt*sh) AS det_c
        FROM m
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN abs(det) >= 1e-9
                         THEN round(det_a / det, 6) + 0.0 END, {NULLF})
               AS intercept,
           COALESCE(CASE WHEN abs(det) >= 1e-9
                         THEN round(det_b / det, 6) + 0.0 END, {NULLF})
               AS slope,
           COALESCE(CASE WHEN abs(det) >= 1e-9
                         THEN round(det_c / det, 6) + 0.0 END, {NULLF})
               AS slope_change
    FROM dets ORDER BY 1
"""


def q_activity_streaks_users(sf_dir: str) -> pd.DataFrame:
    """Longest consecutive-active-day streak per user (the gaps-and-
    islands pattern at user grain), reported as a histogram: streak
    length → user count. Per-user islands resolve inside one co-located
    pass; the bounded histogram is all that leaves."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def days(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["day"] = b["ts"].astype("int64") // DAY_US
        return b[["user_id", "day"]].drop_duplicates()

    ud = hash_aggregate(ev.map_batches(days, batch_format="pandas"),
                        ["user_id", "day"], {"one": ("day", "size")},
                        num_partitions=_NP)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in part.groupby("user_id", sort=False):
            d = np.sort(g["day"].to_numpy(np.int64))
            breaks = np.flatnonzero(np.diff(d) != 1)
            lengths = np.diff(np.concatenate(([-1], breaks, [len(d) - 1])))
            rows.append((uid, int(lengths.max())))
        return pd.DataFrame(rows, columns=["user_id", "streak"])

    streaks = keyed_map_partitions(ud, ["user_id"], kernel,
                                   num_partitions=_NP)
    hist = hash_count(streaks, ["streak"], out_col="n_users",
                      num_partitions=4).to_pandas()
    hist = hist.astype({"streak": np.int64, "n_users": np.int64})
    return hist.sort_values("streak").reset_index(drop=True)


SQL_ACTIVITY_STREAKS = f"""
    WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day
        FROM events
    ),
    isl AS (
        SELECT user_id, day,
               day - ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY day) AS grp
        FROM ud
    ),
    runs AS (SELECT user_id, count(*) AS len
             FROM isl GROUP BY user_id, grp),
    mx AS (SELECT user_id, max(len) AS streak FROM runs GROUP BY 1)
    SELECT CAST(streak AS BIGINT) AS streak,
           CAST(count(*) AS BIGINT) AS n_users
    FROM mx GROUP BY 1 ORDER BY 1
"""


def q_mix_entropy_daily(sf_dir: str) -> pd.DataFrame:
    """Composition entropy of each day's event-type mix: Shannon H over
    the within-day value shares (zero/negative shares excluded) and the
    effective number of types e^H — the diversity read on the
    daily_share decomposition."""
    daily = _bucket_series(sf_dir, DAY_US, "d").materialize()
    tot = hash_aggregate(daily, ["d"], {"T": ("v", "sum")},
                         num_partitions=4).to_pandas()
    tmap = dict(zip(tot["d"], tot["T"]))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["d"].map(tmap).to_numpy(np.float64)
        v = b["v"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = np.where((t > 0) & (v > 0), v / t, np.nan)
            term = np.where(np.isnan(p), 0.0, -p * np.log(p))
        return pd.DataFrame({"d": b["d"], "h": term,
                             "k": (~np.isnan(p)).astype(np.int64)})

    agg = hash_aggregate(daily.map_batches(partial, batch_format="pandas"),
                         ["d"], {"H": ("h", "sum"), "k": ("k", "sum")},
                         num_partitions=4).to_pandas()
    H = agg["H"].to_numpy(np.float64)
    return pd.DataFrame({
        "d": agg["d"], "n_types": agg["k"].astype(np.int64),
        "entropy": np.round(H, 6) + 0.0,
        "effective_types": np.round(np.exp(H), 6) + 0.0,
    }).sort_values("d").reset_index(drop=True)


SQL_MIX_ENTROPY = f"""
    WITH daily AS ({_DAILY_SQL}),
    tot AS (SELECT d, sum(v) AS T FROM daily GROUP BY 1),
    p AS (
        SELECT daily.d,
               CASE WHEN tot.T > 0 AND daily.v > 0
                    THEN daily.v / tot.T END AS p
        FROM daily JOIN tot USING (d)
    )
    SELECT d,
           CAST(count(p) AS BIGINT) AS n_types,
           round(COALESCE(sum(-p * ln(p)), 0), 6) + 0.0 AS entropy,
           round(exp(COALESCE(sum(-p * ln(p)), 0)), 6) + 0.0
               AS effective_types
    FROM p GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Kendall's W concordance / discount response curve / rank-biased overlap
# ---------------------------------------------------------------------------

def q_kendall_w_daily(sf_dir: str) -> pd.DataFrame:
    """Kendall's coefficient of concordance W across days: each day ranks
    the event types by value (desc, type asc on ties); W measures how
    stable that ranking is over the month — 1 = identical order every
    day, 0 = random. W = 12·Σ(Rᵢ−m(k+1)/2)² / (m²k(k²−1)) over rank sums
    Rᵢ (days m where all k types present)."""
    daily = _bucket_series(sf_dir, DAY_US, "d")
    wide = daily.to_pandas()
    k = wide["event_type"].nunique()
    full_days = wide.groupby("d")["event_type"].nunique()
    days = full_days[full_days == k].index
    sub = wide[wide["d"].isin(days)].copy()
    sub = sub.sort_values(["d", "v", "event_type"],
                          ascending=[True, False, True])
    sub["rank"] = sub.groupby("d").cumcount() + 1
    R = sub.groupby("event_type")["rank"].sum()
    m = len(days)
    dev = ((R - m * (k + 1) / 2.0) ** 2).sum()
    W = 12.0 * dev / (m * m * k * (k * k - 1.0))
    return pd.DataFrame({
        "n_days": [np.int64(m)], "n_types": [np.int64(k)],
        "kendall_w": [np.round(W, 6) + 0.0],
    })


SQL_KENDALL_W = f"""
    WITH daily AS ({_DAILY_SQL}),
    k AS (SELECT count(DISTINCT event_type) AS k FROM daily),
    full_days AS (
        SELECT d FROM daily GROUP BY d
        HAVING count(DISTINCT event_type) = (SELECT k FROM k)
    ),
    r AS (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY d
                                  ORDER BY v DESC, event_type) AS rk
        FROM daily WHERE d IN (SELECT d FROM full_days)
    ),
    sums AS (SELECT event_type, sum(rk)::DOUBLE AS R FROM r GROUP BY 1),
    mm AS (SELECT count(*)::DOUBLE AS m FROM full_days)
    SELECT CAST(mm.m AS BIGINT) AS n_days,
           CAST(k.k AS BIGINT) AS n_types,
           round(12.0 * sum((sums.R - mm.m * (k.k + 1) / 2.0)
                            * (sums.R - mm.m * (k.k + 1) / 2.0))
                 / (mm.m * mm.m * k.k * (k.k * k.k - 1.0)), 6) + 0.0
               AS kendall_w
    FROM sums CROSS JOIN mm CROSS JOIN k
    GROUP BY mm.m, k.k
"""


def q_discount_response_lineitem(sf_dir: str) -> pd.DataFrame:
    """Discount response curve: per discount level (rounded to 2), order-
    line count, average quantity and average net revenue — the grouped
    dose-response read behind promotion planning."""
    li = _read(sf_dir, "lineitem",
               ["l_discount", "l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["disc"] = np.round(b["l_discount"].to_numpy(np.float64), 2) + 0.0
        b["rev"] = (b["l_extendedprice"].to_numpy(np.float64)
                    * (1.0 - b["l_discount"].to_numpy(np.float64)))
        b["one"] = 1.0
        return b[["disc", "one", "l_quantity", "rev"]]

    agg = hash_aggregate(li.map_batches(partial, batch_format="pandas"),
                         ["disc"],
                         {"n": ("one", "sum"), "sq": ("l_quantity", "sum"),
                          "sr": ("rev", "sum")},
                         num_partitions=4).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    return pd.DataFrame({
        "disc": agg["disc"],
        "n_lines": agg["n"].astype(np.int64),
        "avg_qty": np.round(agg["sq"].to_numpy(np.float64) / n, 6) + 0.0,
        "avg_revenue": np.round(agg["sr"].to_numpy(np.float64) / n,
                                6) + 0.0,
    }).sort_values("disc").reset_index(drop=True)


SQL_DISCOUNT_RESPONSE = """
    SELECT round(l_discount, 2) + 0.0 AS disc,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(avg(l_quantity), 6) + 0.0 AS avg_qty,
           round(avg(l_extendedprice * (1 - l_discount)), 6) + 0.0
               AS avg_revenue
    FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_rbo_top_users(sf_dir: str) -> pd.DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010; p=0.9, depth 10)
    between the top-user leaderboards of the two event-span halves — the
    leaderboard-stability metric. Ranks break ties by (count desc,
    user_id asc); prefix overlaps accumulate the truncated
    RBO = (1−p)·Σ p^{d−1}·|A_d∩B_d|/d."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    bounds = ev.map_batches(
        lambda b: pd.DataFrame({"lo": [b["ts"].astype("int64").min()],
                                "hi": [b["ts"].astype("int64").max()]}),
        batch_format="pandas").to_pandas()
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        first = b["ts"].astype("int64").to_numpy() <= mid
        return pd.DataFrame({"user_id": b["user_id"],
                             "c1": first.astype(np.int64),
                             "c2": (~first).astype(np.int64)})

    per_user = hash_aggregate(
        ev.map_batches(flags, batch_format="pandas"), ["user_id"],
        {"c1": ("c1", "sum"), "c2": ("c2", "sum")},
        num_partitions=_NP).to_pandas()

    def top10(col):
        s = per_user.sort_values([col, "user_id"],
                                 ascending=[False, True]).head(10)
        return list(s["user_id"])

    A, B = top10("c1"), top10("c2")
    P = 0.9
    rbo = 0.0
    for d in range(1, 11):
        ov = len(set(A[:d]) & set(B[:d]))
        rbo += (P ** (d - 1)) * ov / d
    rbo *= (1 - P)
    return pd.DataFrame({
        "depth": [np.int64(10)],
        "overlap_at_10": [np.int64(len(set(A) & set(B)))],
        "rbo": [np.round(rbo, 6) + 0.0],
    })


SQL_RBO_TOP_USERS = """
    WITH mid AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
        FROM events
    ),
    u AS (
        SELECT user_id,
               sum(CASE WHEN epoch_us(ts) <= mid.m THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN epoch_us(ts) > mid.m THEN 1 ELSE 0 END) AS c2
        FROM events CROSS JOIN mid GROUP BY 1
    ),
    ra AS (SELECT user_id, ROW_NUMBER() OVER (ORDER BY c1 DESC, user_id)
               AS r FROM u),
    rb AS (SELECT user_id, ROW_NUMBER() OVER (ORDER BY c2 DESC, user_id)
               AS r FROM u),
    inboth AS (
        SELECT ra.r AS r1, rb.r AS r2
        FROM ra JOIN rb USING (user_id)
        WHERE ra.r <= 10 AND rb.r <= 10
    ),
    ds AS (SELECT unnest(range(1, 11)) AS d),
    ov AS (
        SELECT ds.d,
               (SELECT count(*) FROM inboth
                WHERE r1 <= ds.d AND r2 <= ds.d)::DOUBLE AS o
        FROM ds
    )
    SELECT CAST(10 AS BIGINT) AS depth,
           (SELECT CAST(count(*) AS BIGINT) FROM inboth) AS overlap_at_10,
           round(0.1 * sum(pow(0.9, d - 1) * o / d), 6) + 0.0 AS rbo
    FROM ov
"""


# ---------------------------------------------------------------------------
# degree assortativity / basket dispersion / Jarque-Bera normality
# ---------------------------------------------------------------------------

def q_degree_assortativity_copurchase(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity of the co-purchase graph (Newman 2002):
    Pearson correlation of endpoint degrees over both orientations of
    every distinct edge — do popular parts co-purchase with popular
    parts? Composes the edge/degree stages; the moment row is all that
    leaves."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("l_orderkey", sort=False):
            p = np.unique(g["l_partkey"].to_numpy(np.int64))
            if len(p) < 2:
                continue
            a, b = np.triu_indices(len(p), k=1)
            outs.append(pd.DataFrame({"a": p[a], "b": p[b]}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64")})

    edges = hash_aggregate(
        keyed_map_partitions(li, ["l_orderkey"], pairs,
                             num_partitions=_NP).map_batches(
            lambda b: b.assign(one=1), batch_format="pandas"),
        ["a", "b"], {"c": ("one", "sum")},
        num_partitions=_NP).select_columns(["a", "b"]).materialize()
    deg = hash_count(
        edges.map_batches(
            lambda b: pd.DataFrame({"v": np.concatenate(
                [b["a"].to_numpy(), b["b"].to_numpy()])}),
            batch_format="pandas"),
        ["v"], out_col="deg", num_partitions=_NP).to_pandas()
    dmap = dict(zip(deg["v"].astype(np.int64), deg["deg"].astype(float)))

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        da = b["a"].map(dmap).to_numpy(np.float64)
        db = b["b"].map(dmap).to_numpy(np.float64)
        x = np.concatenate([da, db])  # both orientations
        y = np.concatenate([db, da])
        return pd.DataFrame({"n": [float(len(x))], "sx": [x.sum()],
                             "sxx": [(x * x).sum()],
                             "sxy": [(x * y).sum()]})

    m = edges.map_batches(moments, batch_format="pandas").to_pandas().sum()
    n = m["n"]
    # symmetric orientation: mean/var identical for x and y
    cov = m["sxy"] - m["sx"] ** 2 / n
    var = m["sxx"] - m["sx"] ** 2 / n
    r = cov / var if var > 0 else np.nan
    return pd.DataFrame({
        "n_edges": [np.int64(n // 2)],
        "assortativity": [np.round(r, 6) + 0.0 if np.isfinite(r)
                          else NULLF],
    })


SQL_DEGREE_ASSORTATIVITY = f"""
    WITH e AS (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
               greatest(a.l_partkey, b.l_partkey) AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (SELECT v, count(*)::DOUBLE AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY 1),
    sym AS (
        SELECT da.deg AS x, db.deg AS y
        FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
        UNION ALL
        SELECT db.deg AS x, da.deg AS y
        FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           COALESCE(round(corr(x, y), 6) + 0.0, {NULLF}) AS assortativity
    FROM sym
"""


def q_basket_dispersion_orders(sf_dir: str) -> pd.DataFrame:
    """Basket-size dispersion: lineitems per order, mean/variance, the
    index of dispersion D = s²/m and the normal-approximation z of the
    Poisson dispersion test ((n−1)D vs χ²ₙ₋₁, z = ((n−1)D−(n−1))/√(2(n−1)))
    — is basket size Poisson or clumped?"""
    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    counts = hash_count(li, ["l_orderkey"], out_col="k",
                        num_partitions=_NP).to_pandas()
    k = counts["k"].to_numpy(np.float64)
    n = float(len(k))
    m, s2 = k.mean(), k.var(ddof=1)
    D = s2 / m
    z = ((n - 1) * D - (n - 1)) / np.sqrt(2.0 * (n - 1))
    return pd.DataFrame({
        "n_orders": [np.int64(n)],
        "mean_size": [np.round(m, 6) + 0.0],
        "var_size": [np.round(s2, 6) + 0.0],
        "dispersion": [np.round(D, 6) + 0.0],
        "poisson_z": [np.round(z, 6) + 0.0],
    })


SQL_BASKET_DISPERSION = """
    WITH c AS (SELECT l_orderkey, count(*)::DOUBLE AS k
               FROM lineitem GROUP BY 1),
    m AS (SELECT count(*)::DOUBLE AS n, avg(k) AS m, var_samp(k) AS s2
          FROM c)
    SELECT CAST(n AS BIGINT) AS n_orders,
           round(m, 6) + 0.0 AS mean_size,
           round(s2, 6) + 0.0 AS var_size,
           round(s2 / m, 6) + 0.0 AS dispersion,
           round(((n - 1) * s2 / m - (n - 1)) / sqrt(2 * (n - 1)), 6) + 0.0
               AS poisson_z
    FROM m
"""


def q_jarque_bera_daily(sf_dir: str) -> pd.DataFrame:
    """Jarque-Bera normality test per series from the simple moment
    estimators: skewness g₁ = m₃/m₂^1.5, excess kurtosis g₂ = m₄/m₂²−3,
    JB = n/6·(g₁² + g₂²/4) — the residual-normality gate before any
    Gaussian interval claim."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            d = v - v.mean()
            m2 = (d ** 2).mean()
            if n < 4 or m2 <= 0:
                rows.append((et, n, np.nan, np.nan, np.nan))
                continue
            g1 = (d ** 3).mean() / m2 ** 1.5
            g2 = (d ** 4).mean() / m2 ** 2 - 3.0
            jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
            rows.append((et, n, np.round(g1, 6) + 0.0,
                         np.round(g2, 6) + 0.0, np.round(jb, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "skew_g1", "kurt_g2", "jb"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["skew_g1", "kurt_g2", "jb"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_JARQUE_BERA = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (
        SELECT event_type, count(*)::DOUBLE AS n, avg(v) AS mu
        FROM daily GROUP BY 1
    ),
    c AS (
        SELECT d.event_type, any_value(m.n) AS n,
               avg((d.v - m.mu) * (d.v - m.mu)) AS m2,
               avg(pow(d.v - m.mu, 3)) AS m3,
               avg(pow(d.v - m.mu, 4)) AS m4
        FROM daily d JOIN m USING (event_type)
        GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN n >= 4 AND m2 > 0
                         THEN round(m3 / pow(m2, 1.5), 6) + 0.0 END,
                    {NULLF}) AS skew_g1,
           COALESCE(CASE WHEN n >= 4 AND m2 > 0
                         THEN round(m4 / (m2 * m2) - 3, 6) + 0.0 END,
                    {NULLF}) AS kurt_g2,
           COALESCE(CASE WHEN n >= 4 AND m2 > 0
                         THEN round(n / 6.0 * (pow(m3 / pow(m2, 1.5), 2)
                              + pow(m4 / (m2 * m2) - 3, 2) / 4.0), 6)
                              + 0.0 END, {NULLF}) AS jb
    FROM c ORDER BY 1
"""


# ---------------------------------------------------------------------------
# geometric adstock / cohort value curve / EWMA control chart
# ---------------------------------------------------------------------------

def q_adstock_daily(sf_dir: str) -> pd.DataFrame:
    """Geometric adstock transform (the marketing-mix carryover feature):
    A_t = v_t + λ·A_{t−1} with λ=0.6 (non-dyadic, so rounded values
    never sit exactly on half-even/half-away midpoints) — the recursion's
    closed form
    Σ λᵏ·v_{t−k} is window-expressible, so the sequential engine kernel
    oracles exactly."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    LAM = 0.6

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            v = g["v"].to_numpy(np.float64)
            a = np.empty_like(v)
            acc = 0.0
            for i, x in enumerate(v):
                acc = x + LAM * acc
                a[i] = acc
            g["adstock"] = np.round(a, 6) + 0.0
            outs.append(g[["event_type", "d", "v", "adstock"]])
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "adstock"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_ADSTOCK = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    )
    SELECT a.event_type, a.d, a.v,
           round(sum(b.v * pow(0.6, a.rn - b.rn)), 6) + 0.0 AS adstock
    FROM r a JOIN r b ON a.event_type = b.event_type AND b.rn <= a.rn
    GROUP BY 1, 2, 3
"""


def q_cohort_value_curve(sf_dir: str) -> pd.DataFrame:
    """Cohort LTV curve: users cohort by first-seen day; for each age
    offset 0..29, the average CUMULATIVE event value per user across all
    cohorts old enough to reach that age — the lifetime-value primitive
    under every payback analysis. Per-user daily values reduce first;
    the cohort×age matrix is the only small table out."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def day_val(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["day"] = b["ts"].astype("int64") // DAY_US
        return b[["user_id", "day", "value"]]

    uv = hash_aggregate(ev.map_batches(day_val, batch_format="pandas"),
                        ["user_id", "day"], {"v": ("value", "sum")},
                        num_partitions=_NP).materialize()
    from forecastframe_ray.stages.agg import keyed_map_partitions

    def per_user(part: pd.DataFrame) -> pd.DataFrame:
        # reduce user-day rows to the bounded (cohort, age) matrix plus
        # age = -1 sentinel rows carrying per-partition cohort user
        # counts — at most n_days² + n_days rows leave regardless of
        # user count (users are co-located, so each counts once)
        part = part.copy()
        first = part.groupby("user_id")["day"].transform("min")
        part["cohort"] = first
        part["age"] = (part["day"] - first).astype(np.int64)
        cells = part.groupby(["cohort", "age"], sort=False)["v"] \
            .sum().rename("v").reset_index()
        nu = part.drop_duplicates("user_id") \
            .groupby("cohort", sort=False).size()
        sent = pd.DataFrame({"cohort": nu.index,
                             "age": -1, "v": nu.to_numpy(np.float64)})
        return pd.concat([cells, sent], ignore_index=True)

    mat = keyed_map_partitions(uv, ["user_id"], per_user,
                               num_partitions=_NP).to_pandas()
    cells = mat[mat["age"] >= 0].groupby(["cohort", "age"])["v"] \
        .sum().reset_index()
    sizes = mat[mat["age"] == -1].groupby("cohort")["v"].sum()
    max_day = int((cells["cohort"] + cells["age"]).max())
    rows = []
    for age in range(30):
        elig = sizes[sizes.index + age <= max_day]
        n_users = int(elig.sum())
        if n_users == 0:
            continue
        mask = (cells["age"] <= age) & (cells["cohort"] + age <= max_day)
        cum = float(cells.loc[mask, "v"].sum())
        rows.append((age, n_users, np.round(cum / n_users, 6) + 0.0))
    return pd.DataFrame(rows, columns=["age", "n_users",
                                       "cum_value_per_user"]) \
        .astype({"age": np.int64, "n_users": np.int64})


SQL_COHORT_VALUE_CURVE = f"""
    WITH uv AS (
        SELECT user_id, epoch_us(ts) // {DAY_US} AS day, sum(value) AS v
        FROM events GROUP BY 1, 2
    ),
    f AS (SELECT user_id, min(day) AS cohort FROM uv GROUP BY 1),
    j AS (SELECT uv.user_id, uv.day, uv.v, f.cohort,
                 uv.day - f.cohort AS age
          FROM uv JOIN f USING (user_id)),
    mx AS (SELECT max(day) AS max_day FROM uv),
    ages AS (SELECT unnest(range(0, 30)) AS age),
    elig AS (
        SELECT a.age, count(*) AS n_users
        FROM ages a JOIN f ON f.cohort + a.age <= (SELECT max_day FROM mx)
        GROUP BY 1
    ),
    cum AS (
        SELECT a.age, sum(j.v) AS cv
        FROM ages a JOIN j ON j.age <= a.age
                  AND j.cohort + a.age <= (SELECT max_day FROM mx)
        GROUP BY 1
    )
    SELECT e.age, CAST(e.n_users AS BIGINT) AS n_users,
           round(COALESCE(c.cv, 0) / e.n_users, 6) + 0.0
               AS cum_value_per_user
    FROM elig e LEFT JOIN cum c USING (age)
    WHERE e.n_users > 0
    ORDER BY e.age
"""


def q_ewma_chart_daily(sf_dir: str) -> pd.DataFrame:
    """EWMA control chart (Roberts 1959; λ=0.2, L=3): zₜ initialized at
    the series mean μ, time-varying limits μ ± 3σ√(λ/(2−λ)·(1−(1−λ)²ᵗ)).
    The recursion's closed form zₜ = λΣ(1−λ)^{t−j}vⱼ + (1−λ)ᵗμ is window-
    expressible; flags compare ROUNDED z to ROUNDED limits."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    LAM = 0.2

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            v = g["v"].to_numpy(np.float64)
            mu, sd = v.mean(), v.std(ddof=1)
            z = np.empty_like(v)
            acc = mu
            for i, x in enumerate(v):
                acc = LAM * x + (1 - LAM) * acc
                z[i] = acc
            t = np.arange(1, len(v) + 1, dtype=np.float64)
            w = sd * np.sqrt(LAM / (2 - LAM) * (1 - (1 - LAM) ** (2 * t)))
            zr = np.round(z, 6) + 0.0
            ucl = np.round(mu + 3 * w, 6) + 0.0
            lcl = np.round(mu - 3 * w, 6) + 0.0
            g["ewma_z"] = zr
            g["ucl"] = ucl
            g["lcl"] = lcl
            g["out_of_control"] = (zr > ucl) | (zr < lcl)
            outs.append(g[["event_type", "d", "v", "ewma_z", "ucl", "lcl",
                           "out_of_control"]])
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "ewma_z",
                                  "ucl", "lcl", "out_of_control"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_EWMA_CHART = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, stddev_samp(v) AS sd
          FROM daily GROUP BY 1),
    r AS (
        SELECT d.event_type, d.d, d.v, m.mu, m.sd,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.d) AS rn
        FROM daily d JOIN m USING (event_type)
    ),
    z AS (
        SELECT a.event_type, a.d, a.v, a.mu, a.sd, a.rn,
               round(0.2 * sum(b.v * pow(0.8, a.rn - b.rn))
                     + pow(0.8, a.rn) * a.mu, 6) + 0.0 AS ewma_z
        FROM r a JOIN r b ON a.event_type = b.event_type AND b.rn <= a.rn
        GROUP BY 1, 2, 3, 4, 5, 6
    )
    SELECT event_type, d, v, ewma_z,
           round(mu + 3 * sd * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * rn))),
                 6) + 0.0 AS ucl,
           round(mu - 3 * sd * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * rn))),
                 6) + 0.0 AS lcl,
           (ewma_z > round(mu + 3 * sd
                * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * rn))), 6) + 0.0
            OR ewma_z < round(mu - 3 * sd
                * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * rn))), 6) + 0.0)
               AS out_of_control
    FROM z
"""


# ---------------------------------------------------------------------------
# kNN outlier scores / price indices / Theil inequality decomposition
# ---------------------------------------------------------------------------

def q_knn_outlier_embeddings(sf_dir: str) -> pd.DataFrame:
    """kNN-distance outlier scores: each vector's mean Euclidean distance
    to its 5 nearest neighbors (the distance-based outlier primitive under
    LOF), top 20 by (score desc, vec_id asc) on ROUNDED scores. Engine
    side reuses the ANN pattern — broadcast matrix, per-batch matmul,
    local top-k; never an all-pairs shuffle."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    all_df = emb.to_pandas().sort_values("vec_id")
    X = np.stack(all_df["embedding"].to_numpy()).astype(np.float64)
    ids = all_df["vec_id"].to_numpy(np.int64)
    x_ref = ray.put((X, ids))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        Xa, ida = ray.get(x_ref)
        Q = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        qid = b["vec_id"].to_numpy(np.int64)
        d2 = ((Q ** 2).sum(1)[:, None] + (Xa ** 2).sum(1)[None, :]
              - 2.0 * Q @ Xa.T)
        d2 = np.maximum(d2, 0.0)
        d2[qid[:, None] == ida[None, :]] = np.inf  # exclude self
        part = np.sort(np.sqrt(d2), axis=1)[:, :5]
        return pd.DataFrame({"vec_id": qid,
                             "knn_score": np.round(part.mean(axis=1),
                                                   6) + 0.0})

    out = emb.map_batches(score, batch_format="pandas").to_pandas()
    out = out.sort_values(["knn_score", "vec_id"],
                          ascending=[False, True]).head(20)
    return out.astype({"vec_id": np.int64}).reset_index(drop=True)


SQL_KNN_OUTLIER = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    d AS (
        SELECT a.vec_id, list_distance(a.v, b.v) AS dist,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY list_distance(a.v, b.v),
                                           b.vec_id) AS rk
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    s AS (SELECT vec_id, round(avg(dist), 6) + 0.0 AS knn_score
          FROM d WHERE rk <= 5 GROUP BY 1)
    SELECT vec_id, knn_score FROM s
    ORDER BY knn_score DESC, vec_id LIMIT 20
"""


def q_price_index_lineitem(sf_dir: str) -> pd.DataFrame:
    """Bilateral price indices between the two shipdate halves of the
    lineitem fact: per-part average price and total quantity per period,
    then Laspeyres Σp₂q₁/Σp₁q₁, Paasche Σp₂q₂/Σp₁q₂ and Fisher (their
    geometric mean) over parts present in BOTH periods — the econometric
    deflator primitive. Per-(part, period) reduce first; k-part rows
    cross."""
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice",
                "l_quantity"])
    bounds = li.map_batches(
        lambda b: pd.DataFrame({"lo": [b["l_shipdate"].astype("int64")
                                       .min()],
                                "hi": [b["l_shipdate"].astype("int64")
                                       .max()]}),
        batch_format="pandas").to_pandas()
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["period"] = np.where(b["l_shipdate"].astype("int64") <= mid,
                               1, 2)
        b["unit_price"] = (b["l_extendedprice"].to_numpy(np.float64)
                           / b["l_quantity"].to_numpy(np.float64))
        return b[["l_partkey", "period", "unit_price", "l_quantity"]]

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n"] = 1.0
        return b

    agg = hash_aggregate(
        li.map_batches(tag, batch_format="pandas")
          .map_batches(moments, batch_format="pandas"),
        ["l_partkey", "period"],
        {"sp": ("unit_price", "sum"), "n": ("n", "sum"),
         "q": ("l_quantity", "sum")},
        num_partitions=_NP).to_pandas()
    agg["p"] = agg["sp"] / agg["n"]
    piv = agg.pivot_table(index="l_partkey", columns="period",
                          values=["p", "q"])
    piv = piv.dropna()
    p1 = piv[("p", 1)].to_numpy(np.float64)
    p2 = piv[("p", 2)].to_numpy(np.float64)
    q1 = piv[("q", 1)].to_numpy(np.float64)
    q2 = piv[("q", 2)].to_numpy(np.float64)
    lasp = (p2 * q1).sum() / (p1 * q1).sum()
    paas = (p2 * q2).sum() / (p1 * q2).sum()
    return pd.DataFrame({
        "n_parts": [np.int64(len(piv))],
        "laspeyres": [np.round(lasp, 6) + 0.0],
        "paasche": [np.round(paas, 6) + 0.0],
        "fisher": [np.round(np.sqrt(lasp * paas), 6) + 0.0],
    })


SQL_PRICE_INDEX = """
    WITH mid AS (
        SELECT (min(epoch_us(l_shipdate)) + max(epoch_us(l_shipdate)))
               // 2 AS m
        FROM lineitem
    ),
    t AS (
        SELECT l_partkey,
               CASE WHEN epoch_us(l_shipdate) <= mid.m THEN 1 ELSE 2 END
                   AS period,
               avg(l_extendedprice / l_quantity) AS p,
               sum(l_quantity) AS q
        FROM lineitem CROSS JOIN mid
        GROUP BY 1, 2
    ),
    piv AS (
        SELECT a.l_partkey, a.p AS p1, a.q AS q1, b.p AS p2, b.q AS q2
        FROM t a JOIN t b ON a.l_partkey = b.l_partkey
        WHERE a.period = 1 AND b.period = 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(p2 * q1) / sum(p1 * q1), 6) + 0.0 AS laspeyres,
           round(sum(p2 * q2) / sum(p1 * q2), 6) + 0.0 AS paasche,
           round(sqrt((sum(p2 * q1) / sum(p1 * q1))
                      * (sum(p2 * q2) / sum(p1 * q2))), 6) + 0.0 AS fisher
    FROM piv
"""


def q_theil_inequality_documents(sf_dir: str) -> pd.DataFrame:
    """Theil T inequality of document lengths with its exact
    between/within-source decomposition: T = Σ(xᵢ/X)ln(xᵢ/μ̄-ratio),
    T_between from source means, T_within = Σ share·T_source — the
    inequality audit that says whether length skew lives inside sources
    or across them (T = between + within is an identity both engines
    must reproduce)."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        x = b["text"].str.split().str.len().fillna(0) \
            .astype(np.float64).to_numpy()
        x = np.maximum(x, 1.0)  # zero-token docs floor at 1 (ln defined)
        return pd.DataFrame({"source": b["source"], "x": x,
                             "xlx": x * np.log(x), "n": 1.0})

    g = hash_aggregate(docs.map_batches(toks, batch_format="pandas"),
                       ["source"],
                       {"sx": ("x", "sum"), "sxlx": ("xlx", "sum"),
                        "n": ("n", "sum")},
                       num_partitions=_NP).to_pandas()
    N = g["n"].sum()
    X = g["sx"].sum()
    mu = X / N
    # T_total = (1/N)·Σ (x/mu)·ln(x/mu) = (Σ x·ln x − X·ln mu) / (N·mu)
    sxlx = g["sxlx"].sum()
    t_total = (sxlx - X * np.log(mu)) / (N * mu)
    mu_s = g["sx"].to_numpy(np.float64) / g["n"].to_numpy(np.float64)
    t_between = ((g["sx"].to_numpy(np.float64) / X)
                 * np.log(mu_s / mu)).sum()
    return pd.DataFrame({
        "n_docs": [np.int64(N)],
        "theil_total": [np.round(t_total, 6) + 0.0],
        "theil_between": [np.round(t_between, 6) + 0.0],
        "theil_within": [np.round(t_total - t_between, 6) + 0.0],
    })


SQL_THEIL_INEQUALITY = r"""
    WITH x AS (
        SELECT source,
               greatest(len(list_filter(string_split_regex(text, '\s+'),
                                        t -> t <> '')), 1)::DOUBLE AS x
        FROM documents
    ),
    g AS (SELECT source, sum(x) AS sx, sum(x * ln(x)) AS sxlx,
                 count(*)::DOUBLE AS n
          FROM x GROUP BY 1),
    tot AS (SELECT sum(sx) AS X, sum(sxlx) AS sxlx, sum(n) AS N FROM g)
    SELECT CAST(tot.N AS BIGINT) AS n_docs,
           round((tot.sxlx - tot.X * ln(tot.X / tot.N))
                 / (tot.N * (tot.X / tot.N)), 6) + 0.0 AS theil_total,
           round(sum((g.sx / tot.X)
                     * ln((g.sx / g.n) / (tot.X / tot.N))), 6) + 0.0
               AS theil_between,
           round((tot.sxlx - tot.X * ln(tot.X / tot.N))
                 / (tot.N * (tot.X / tot.N))
                 - sum((g.sx / tot.X)
                       * ln((g.sx / g.n) / (tot.X / tot.N))), 6) + 0.0
               AS theil_within
    FROM g CROSS JOIN tot
    GROUP BY tot.N, tot.X, tot.sxlx
"""


# ---------------------------------------------------------------------------
# mutual information / spectral flatness / Benjamini-Hochberg FDR
# ---------------------------------------------------------------------------

def q_mutual_info_type_hour(sf_dir: str) -> pd.DataFrame:
    """Mutual information between event type and hour-of-day (nats), plus
    the normalized form MI/min(H_type, H_hour) — 'does when predict
    what?'. One contingency-count aggregate; closed-form information
    algebra on the k×24 table."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def hod(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame({"event_type": b["event_type"],
                             "h": (us % DAY_US) // HOUR_US})

    ct = hash_count(ev.map_batches(hod, batch_format="pandas"),
                    ["event_type", "h"], out_col="n",
                    num_partitions=_NP).to_pandas()
    N = float(ct["n"].sum())
    p = ct["n"].to_numpy(np.float64) / N
    pi = ct.groupby("event_type")["n"].sum() / N
    pj = ct.groupby("h")["n"].sum() / N
    mi = (p * np.log(p / (ct["event_type"].map(pi).to_numpy(np.float64)
                          * ct["h"].map(pj).to_numpy(np.float64)))).sum()
    hi = -(pi * np.log(pi)).sum()
    hj = -(pj * np.log(pj)).sum()
    return pd.DataFrame({
        "n_events": [np.int64(N)],
        "mi_nats": [np.round(mi, 6) + 0.0],
        "nmi": [np.round(mi / min(hi, hj), 6) + 0.0],
    })


SQL_MUTUAL_INFO = f"""
    WITH ct AS (
        SELECT event_type, (epoch_us(ts) % {DAY_US}) // {HOUR_US} AS h,
               count(*)::DOUBLE AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n) AS N FROM ct),
    pi AS (SELECT event_type, sum(n) AS ni FROM ct GROUP BY 1),
    pj AS (SELECT h, sum(n) AS nj FROM ct GROUP BY 1),
    mi AS (
        SELECT sum((ct.n / tot.N)
                   * ln((ct.n / tot.N)
                        / ((pi.ni / tot.N) * (pj.nj / tot.N)))) AS mi
        FROM ct JOIN pi USING (event_type) JOIN pj USING (h)
        CROSS JOIN tot
    ),
    hh AS (
        SELECT (SELECT -sum((ni / tot.N) * ln(ni / tot.N))
                FROM pi CROSS JOIN tot) AS hi,
               (SELECT -sum((nj / tot.N) * ln(nj / tot.N))
                FROM pj CROSS JOIN tot) AS hj
    )
    SELECT (SELECT CAST(N AS BIGINT) FROM tot) AS n_events,
           round(mi.mi, 6) + 0.0 AS mi_nats,
           round(mi.mi / least(hh.hi, hh.hj), 6) + 0.0 AS nmi
    FROM mi CROSS JOIN hh
"""


def q_spectral_flatness_daily(sf_dir: str) -> pd.DataFrame:
    """Wiener spectral flatness per series: periodogram power at Fourier
    frequencies j = 1..14 (cos/sin projections of the demeaned series),
    flatness = geometric mean / arithmetic mean of the powers — 1 = white,
    →0 = tonal/seasonal. Powers round to 6 before the means so both
    engines aggregate identical values (zero powers floor at 1e-12)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n = len(v)
            if n < 29:
                rows.append((et, n, np.nan))
                continue
            dv = v - v.mean()
            t = np.arange(n, dtype=np.float64)
            pows = []
            for j in range(1, 15):
                w = 2.0 * np.pi * j / n
                c = (dv * np.cos(w * t)).sum()
                s = (dv * np.sin(w * t)).sum()
                pows.append(max(np.round((c * c + s * s) / n, 6) + 0.0,
                                1e-12))
            pows = np.array(pows)
            flat = np.exp(np.log(pows).mean()) / pows.mean()
            rows.append((et, n, np.round(flat, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "flatness"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["flatness"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_SPECTRAL_FLATNESS = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, count(*) AS n
          FROM daily GROUP BY 1),
    r AS (
        SELECT d.event_type, d.v - m.mu AS dv, m.n,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.d) - 1.0 AS t
        FROM daily d JOIN m USING (event_type)
    ),
    js AS (SELECT unnest(range(1, 15)) AS j),
    pw AS (
        SELECT r.event_type, js.j, any_value(r.n) AS n,
               greatest(round((pow(sum(dv * cos(2 * pi() * js.j * t
                                                / r.n)), 2)
                              + pow(sum(dv * sin(2 * pi() * js.j * t
                                                 / r.n)), 2))
                              / any_value(r.n), 6) + 0.0, 1e-12) AS p
        FROM js, r
        WHERE r.n >= 29
        GROUP BY r.event_type, js.j
    ),
    agg AS (
        SELECT event_type, any_value(n) AS n,
               exp(avg(ln(p))) / avg(p) AS flat
        FROM pw GROUP BY 1
    ),
    base AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1)
    SELECT base.event_type, CAST(base.n AS BIGINT) AS n_days,
           COALESCE(round(agg.flat, 6) + 0.0, {NULLF}) AS flatness
    FROM base LEFT JOIN agg USING (event_type)
    ORDER BY 1
"""


def _phi_as(z: np.ndarray) -> np.ndarray:
    """Standard normal CDF via the Abramowitz & Stegun 7.1.26 erf
    polynomial (|error| < 1.5e-7) — implemented IDENTICALLY in the SQL
    oracle so p-values match to the rounding digit."""
    x = np.abs(z) / np.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    erf = 1.0 - (0.254829592 * t - 0.284496736 * t ** 2
                 + 1.421413741 * t ** 3 - 1.453152027 * t ** 4
                 + 1.061405429 * t ** 5) * np.exp(-x * x)
    return np.where(z >= 0, (1.0 + erf) / 2.0, (1.0 - erf) / 2.0)


def q_bh_fdr_pairs_events(sf_dir: str) -> pd.DataFrame:
    """Benjamini-Hochberg FDR correction over the 10 pairwise mean tests
    (large-sample z from the pooled-variance contrast, two-sided p via
    the A&S normal CDF): p-values rank ascending, the BH cutoff is the
    largest rank with p ≤ rank/m·0.05, and every pair at or below it
    flags significant — the multiple-testing layer over the contrast
    family."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["v2"] = b["value"].to_numpy(np.float64) ** 2
        b["one"] = 1.0
        return b[["event_type", "one", "value", "v2"]]

    g = hash_aggregate(ev.map_batches(moments, batch_format="pandas"),
                       ["event_type"],
                       {"n": ("one", "sum"), "s": ("value", "sum"),
                        "ss": ("v2", "sum")},
                       num_partitions=_NP).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    n = g["n"].to_numpy(np.float64)
    m = g["s"].to_numpy(np.float64) / n
    sse = g["ss"].to_numpy(np.float64) - n * m * m
    s2p = sse.sum() / (n.sum() - len(n))
    rows = []
    for i in range(len(g)):
        for j in range(i + 1, len(g)):
            z = (m[i] - m[j]) / np.sqrt(s2p * (1 / n[i] + 1 / n[j]))
            zr = np.round(z, 6) + 0.0  # p from ROUNDED z on both sides
            p = 2.0 * (1.0 - _phi_as(np.array([abs(zr)]))[0])
            rows.append((g["event_type"][i], g["event_type"][j],
                         zr, np.round(p, 6) + 0.0))
    df = pd.DataFrame(rows, columns=["et_a", "et_b", "z", "p"])
    df = df.sort_values(["p", "et_a", "et_b"]).reset_index(drop=True)
    M = len(df)
    rank = np.arange(1, M + 1, dtype=np.float64)
    ok = df["p"].to_numpy() <= rank / M * 0.05
    cutoff = int(np.max(np.where(ok)[0])) + 1 if ok.any() else 0
    df["bh_rank"] = rank.astype(np.int64)
    df["significant"] = rank <= cutoff
    return df


SQL_BH_FDR_PAIRS = """
    WITH g AS (
        SELECT event_type, count(*)::DOUBLE AS n, avg(value) AS m,
               sum(value * value) - count(*) * avg(value) * avg(value)
                   AS sse
        FROM events GROUP BY 1
    ),
    pool AS (SELECT sum(sse) / (sum(n) - count(*)) AS s2p FROM g),
    pairs AS (
        SELECT a.event_type AS et_a, b.event_type AS et_b,
               (a.m - b.m) / sqrt(pool.s2p * (1 / a.n + 1 / b.n)) AS z
        FROM g a JOIN g b ON a.event_type < b.event_type
        CROSS JOIN pool
    ),
    pv AS (
        SELECT et_a, et_b, round(z, 6) + 0.0 AS z,
               round(2 * (1 - CASE WHEN TRUE THEN
                   (1 + (1 - (0.254829592 * (1 / (1 + 0.3275911
                        * (abs(z) / sqrt(2))))
                     - 0.284496736 * pow(1 / (1 + 0.3275911
                        * (abs(z) / sqrt(2))), 2)
                     + 1.421413741 * pow(1 / (1 + 0.3275911
                        * (abs(z) / sqrt(2))), 3)
                     - 1.453152027 * pow(1 / (1 + 0.3275911
                        * (abs(z) / sqrt(2))), 4)
                     + 1.061405429 * pow(1 / (1 + 0.3275911
                        * (abs(z) / sqrt(2))), 5))
                     * exp(-abs(z) * abs(z) / 2))) / 2 END), 6) + 0.0 AS p
        FROM pairs
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY p, et_a, et_b) AS bh_rank,
               count(*) OVER () AS m
        FROM pv
    ),
    cut AS (SELECT COALESCE(max(bh_rank), 0) AS c
            FROM ranked WHERE p <= bh_rank * 1.0 / m * 0.05)
    SELECT et_a, et_b, z, p, CAST(bh_rank AS BIGINT) AS bh_rank,
           bh_rank <= cut.c AS significant
    FROM ranked CROSS JOIN cut
    ORDER BY bh_rank
"""


# ---------------------------------------------------------------------------
# fulfillment span / exponential PPCC / Shamos pairwise scale
# ---------------------------------------------------------------------------

def q_fulfillment_span_orders(sf_dir: str) -> pd.DataFrame:
    """Order-fulfillment span: days from order date to the LAST lineitem
    shipment, summarized per priority (count, mean, p50, p90) — the
    multi-table service-level metric. Per-order spans reduce via one
    broadcast-free co-located join; priority rows are all that leave."""
    from forecastframe_ray.stages.agg import keyed_map_partitions
    from forecastframe_ray.stages.join import hash_join

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    last_ship = hash_aggregate(
        li.map_batches(lambda b: b.rename(
            columns={"l_orderkey": "o_orderkey"}), batch_format="pandas"),
        ["o_orderkey"], {"last_ship": ("l_shipdate", "max")},
        num_partitions=_NP).repartition(8).materialize()
    j = hash_join(orders, last_ship, on=["o_orderkey"],
                  num_partitions=_NP)

    def span(b: pd.DataFrame) -> pd.DataFrame:
        d = ((b["last_ship"].astype("datetime64[us]").astype("int64")
              // DAY_US)
             - (b["o_orderdate"].astype("datetime64[us]").astype("int64")
                // DAY_US))
        return pd.DataFrame({"o_orderpriority": b["o_orderpriority"],
                             "span": d.astype(np.float64)})

    spans = j.map_batches(span, batch_format="pandas")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pr, g in part.groupby("o_orderpriority", sort=False):
            s = g["span"].to_numpy(np.float64)
            rows.append((pr, len(s), np.round(s.mean(), 6) + 0.0,
                         np.round(np.quantile(s, 0.5), 6) + 0.0,
                         np.round(np.quantile(s, 0.9), 6) + 0.0))
        return pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                           "mean_days", "p50_days",
                                           "p90_days"])

    out = keyed_map_partitions(spans, ["o_orderpriority"], kernel,
                               num_partitions=4).to_pandas()
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_FULFILLMENT_SPAN = """
    WITH ls AS (SELECT l_orderkey, max(l_shipdate) AS last_ship
                FROM lineitem GROUP BY 1),
    sp AS (
        SELECT o.o_orderpriority,
               (epoch_us(ls.last_ship) // 86400000000
                - epoch_us(o.o_orderdate) // 86400000000)::DOUBLE AS span
        FROM orders o JOIN ls ON ls.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(span), 6) + 0.0 AS mean_days,
           round(quantile_cont(span, 0.5), 6) + 0.0 AS p50_days,
           round(quantile_cont(span, 0.9), 6) + 0.0 AS p90_days
    FROM sp GROUP BY 1 ORDER BY 1
"""


def q_ppcc_expfit_events(sf_dir: str) -> pd.DataFrame:
    """Probability-plot correlation coefficient (Filliben 1975) of the
    inter-arrival gaps against the exponential model: Pearson r between
    the sorted gaps and the quantiles −ln(1−(i−0.5)/n) — near 1 means
    'straight QQ line', the visual exponentiality check quantified (the
    distribution-shape complement to the KS gate)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "ts", "event_id"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values(["ts", "event_id"])
            us = g["ts"].astype("int64").to_numpy()
            if len(us) < 3:
                rows.append((et, 0, np.nan))
                continue
            gaps = np.sort(np.diff(us) / 1e6)
            n = len(gaps)
            qi = -np.log(1.0 - (np.arange(1, n + 1) - 0.5) / n)
            x, y = gaps - gaps.mean(), qi - qi.mean()
            den = np.sqrt((x ** 2).sum() * (y ** 2).sum())
            r = (x * y).sum() / den if den > 0 else np.nan
            rows.append((et, n, np.round(r, 6) + 0.0 if np.isfinite(r)
                         else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n_gaps", "ppcc"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_gaps"] = out["n_gaps"].astype(np.int64)
    out = _fill(out, ["ppcc"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_PPCC_EXPFIT = f"""
    WITH o AS (
        SELECT event_type, ts,
               LAG(ts) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS prev
        FROM events
    ),
    gaps AS (
        SELECT event_type, (epoch_us(ts) - epoch_us(prev)) / 1e6 AS g
        FROM o WHERE prev IS NOT NULL
    ),
    r AS (
        SELECT event_type, g,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY g)
                   AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM gaps
    ),
    q AS (SELECT event_type, g, -ln(1 - (rn - 0.5) / n) AS qi, n FROM r)
    SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_gaps,
           COALESCE(round(corr(g, qi), 6) + 0.0, {NULLF}) AS ppcc
    FROM q GROUP BY 1 ORDER BY 1
"""


def q_shamos_scale_daily(sf_dir: str) -> pd.DataFrame:
    """Shamos robust scale per series: the median of ALL pairwise
    |vᵢ−vⱼ| (i<j) — 50% breakdown, no location estimate needed; reported
    with the 1.048 consistency factor for the normal σ. Pair diffs round
    to 6 before the median so tie handling matches."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["v"].to_numpy(np.float64)
            if len(v) < 2:
                rows.append((et, len(v), np.nan, np.nan))
                continue
            iu = np.triu_indices(len(v), k=1)
            d = np.round(np.abs(v[iu[0]] - v[iu[1]]), 6) + 0.0
            med = np.quantile(d, 0.5)
            rows.append((et, len(v), np.round(med, 6) + 0.0,
                         np.round(1.048 * med, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "shamos", "sigma_hat"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["shamos", "sigma_hat"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_SHAMOS_SCALE = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    pd AS (
        SELECT a.event_type, round(abs(a.v - b.v), 6) + 0.0 AS ad
        FROM r a JOIN r b ON a.event_type = b.event_type AND a.rn < b.rn
    ),
    m AS (SELECT event_type, quantile_cont(ad, 0.5) AS med,
                 count(*) AS np_
          FROM pd GROUP BY 1),
    base AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1)
    SELECT base.event_type, CAST(base.n AS BIGINT) AS n_days,
           COALESCE(round(m.med, 6) + 0.0, {NULLF}) AS shamos,
           COALESCE(round(1.048 * m.med, 6) + 0.0, {NULLF}) AS sigma_hat
    FROM base LEFT JOIN m USING (event_type)
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# AUC of dup-ness / beta-binomial shrinkage / bimodality coefficient
# ---------------------------------------------------------------------------

def q_auc_dupness_documents(sf_dir: str) -> pd.DataFrame:
    """ROC AUC of 'token count predicts near-dup blocking membership'
    via the Mann-Whitney identity AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀) with
    average ranks on ties — the threshold-free classifier metric as a
    pure rank aggregate. Positives = docs sharing their 5-token prefix
    blocking key with another doc (the SymSpell-style candidate class).
    Ranks form on ROUNDED scores."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def feat(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split()
        dg = toks.map(lambda t: " ".join(t[:5]) if isinstance(t, list)
                      else "")
        return pd.DataFrame({
            "doc_id": b["doc_id"], "dg": dg,
            "score": toks.str.len().fillna(0).astype(np.float64)})

    tagged = docs.map_batches(feat, batch_format="pandas").materialize()
    sizes = hash_count(tagged, ["dg"], out_col="csize",
                       num_partitions=_NP).to_pandas()
    smap = dict(zip(sizes["dg"], sizes["csize"]))
    df = tagged.to_pandas()
    y = (df["dg"].map(smap) > 1).to_numpy()
    s = np.round(df["score"].to_numpy(np.float64), 6) + 0.0
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s))
    ss = s[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and ss[j + 1] == ss[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    n1, n0 = int(y.sum()), int((~y).sum())
    r1 = ranks[y].sum()
    auc = (r1 - n1 * (n1 + 1) / 2.0) / (n1 * n0) if n1 and n0 else np.nan
    return pd.DataFrame({
        "n_pos": [np.int64(n1)], "n_neg": [np.int64(n0)],
        "auc": [np.round(auc, 6) + 0.0 if np.isfinite(auc) else NULLF],
    })


SQL_AUC_DUPNESS = r"""
    WITH t AS (
        SELECT doc_id,
               array_to_string(list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> '')[1:5], ' ') AS dg,
               round(len(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> ''))::DOUBLE, 6) + 0.0
                   AS score
        FROM documents
    ),
    s AS (SELECT dg, count(*) AS csize FROM t GROUP BY 1),
    lab AS (SELECT t.doc_id, t.score, s.csize > 1 AS pos
            FROM t JOIN s USING (dg)),
    rk AS (
        SELECT pos,
               rank() OVER (ORDER BY score)
               + (count(*) OVER (PARTITION BY score) - 1) / 2.0 AS arank
        FROM lab
    ),
    agg AS (
        SELECT sum(CASE WHEN pos THEN arank ELSE 0 END) AS r1,
               sum(CASE WHEN pos THEN 1 ELSE 0 END)::DOUBLE AS n1,
               sum(CASE WHEN pos THEN 0 ELSE 1 END)::DOUBLE AS n0
        FROM rk
    )
    SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
           round((r1 - n1 * (n1 + 1) / 2.0) / (n1 * n0), 6) + 0.0 AS auc
    FROM agg
"""


def q_beta_shrunk_daily_share(sf_dir: str) -> pd.DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of the daily purchase
    share: method-of-moments beta prior (α, β) from the across-day share
    mean/variance, each day's posterior mean (x+α)/(n+α+β) — the
    proportion counterpart of the partial-pooling mean shrinkage. NULLF
    prior when shares underdispersed (var ≥ m(1−m) or zero)."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame({
            "d": pd.to_datetime((us // DAY_US) * DAY_US, unit="us"),
            "n": 1,
            "x": (b["event_type"] == "purchase").astype(np.int64)})

    agg = hash_aggregate(ev.map_batches(day_fn, batch_format="pandas"),
                         ["d"], {"n": ("n", "sum"), "x": ("x", "sum")},
                         num_partitions=_NP).to_pandas().sort_values("d")
    n = agg["n"].to_numpy(np.float64)
    x = agg["x"].to_numpy(np.float64)
    p = x / n
    m, v = p.mean(), p.var(ddof=1)
    if 0 < v < m * (1 - m):
        common = m * (1 - m) / v - 1.0
        alpha, beta = m * common, (1 - m) * common
        post = np.round((x + alpha) / (n + alpha + beta), 6) + 0.0
        a_r, b_r = np.round(alpha, 6) + 0.0, np.round(beta, 6) + 0.0
    else:
        post = np.round(p, 6) + 0.0
        a_r = b_r = NULLF
    out = pd.DataFrame({
        "d": agg["d"], "n_events": agg["n"].astype(np.int64),
        "n_purchase": agg["x"].astype(np.int64),
        "raw_share": np.round(p, 6) + 0.0, "post_share": post})
    out["alpha"] = a_r
    out["beta"] = b_r
    return out.reset_index(drop=True)


SQL_BETA_SHRUNK_SHARE = f"""
    WITH d AS (
        SELECT date_trunc('day', ts) AS d, count(*)::DOUBLE AS n,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END)::DOUBLE AS x
        FROM events GROUP BY 1
    ),
    m AS (SELECT avg(x / n) AS m, var_samp(x / n) AS v FROM d),
    pr AS (
        SELECT CASE WHEN v > 0 AND v < m * (1 - m)
                    THEN m * (m * (1 - m) / v - 1) END AS alpha,
               CASE WHEN v > 0 AND v < m * (1 - m)
                    THEN (1 - m) * (m * (1 - m) / v - 1) END AS beta
        FROM m
    )
    SELECT d.d, CAST(d.n AS BIGINT) AS n_events,
           CAST(d.x AS BIGINT) AS n_purchase,
           round(d.x / d.n, 6) + 0.0 AS raw_share,
           CASE WHEN pr.alpha IS NOT NULL
                THEN round((d.x + pr.alpha) / (d.n + pr.alpha + pr.beta),
                           6) + 0.0
                ELSE round(d.x / d.n, 6) + 0.0 END AS post_share,
           COALESCE(round(pr.alpha, 6) + 0.0, {NULLF}) AS alpha,
           COALESCE(round(pr.beta, 6) + 0.0, {NULLF}) AS beta
    FROM d CROSS JOIN pr ORDER BY d.d
"""


def q_bimodality_daily(sf_dir: str) -> pd.DataFrame:
    """Sarle's bimodality coefficient per series:
    BC = (g₁² + 1) / (g₂ + 3(n−1)²/((n−2)(n−3))) from the simple moment
    skewness/kurtosis — > 0.555 (the uniform's value) suggests two
    regimes; the cheap screen before any mixture fit."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            d = v - v.mean()
            m2 = (d ** 2).mean()
            if n < 4 or m2 <= 0:
                rows.append((et, n, np.nan))
                continue
            g1 = (d ** 3).mean() / m2 ** 1.5
            g2 = (d ** 4).mean() / m2 ** 2 - 3.0
            bc = (g1 * g1 + 1.0) / (g2 + 3.0 * (n - 1.0) ** 2
                                    / ((n - 2.0) * (n - 3.0)))
            rows.append((et, n, np.round(bc, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "bimodality"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["bimodality"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_BIMODALITY = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, count(*)::DOUBLE AS n
          FROM daily GROUP BY 1),
    c AS (
        SELECT d.event_type, any_value(m.n) AS n,
               avg((d.v - m.mu) * (d.v - m.mu)) AS m2,
               avg(pow(d.v - m.mu, 3)) AS m3,
               avg(pow(d.v - m.mu, 4)) AS m4
        FROM daily d JOIN m USING (event_type)
        GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN n >= 4 AND m2 > 0
                         THEN round((pow(m3 / pow(m2, 1.5), 2) + 1)
                              / (m4 / (m2 * m2) - 3
                                 + 3 * (n - 1) * (n - 1)
                                   / ((n - 2) * (n - 3))), 6) + 0.0 END,
                    {NULLF}) AS bimodality
    FROM c ORDER BY 1
"""


# ---------------------------------------------------------------------------
# NDCG of blocking ranking / Youden threshold / Allan variance
# ---------------------------------------------------------------------------

def q_ndcg_blocking_documents(sf_dir: str) -> pd.DataFrame:
    """NDCG@20 of ranking docs by token count against the binary
    'shares a 5-token prefix block' relevance: DCG with 1/log2(rank+1)
    discounts over the (score desc, doc_id asc) order, normalized by the
    ideal ordering — completing the IR-metric family (AUC, F1, RBO)
    as pure rank algebra."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def feat(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split()
        dg = toks.map(lambda t: " ".join(t[:5]) if isinstance(t, list)
                      else "")
        return pd.DataFrame({
            "doc_id": b["doc_id"], "dg": dg,
            "score": np.round(toks.str.len().fillna(0)
                              .astype(np.float64), 6) + 0.0})

    tagged = docs.map_batches(feat, batch_format="pandas").materialize()
    sizes = hash_count(tagged, ["dg"], out_col="csize",
                       num_partitions=_NP).to_pandas()
    smap = dict(zip(sizes["dg"], sizes["csize"]))
    df = tagged.to_pandas()
    df["rel"] = (df["dg"].map(smap) > 1).astype(np.float64)
    df = df.sort_values(["score", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    K = 20
    disc = 1.0 / np.log2(np.arange(2, K + 2, dtype=np.float64))
    dcg = float((df["rel"].to_numpy()[:K] * disc).sum())
    n_pos = int(df["rel"].sum())
    ideal = float(disc[:min(K, n_pos)].sum())
    return pd.DataFrame({
        "k": [np.int64(K)], "n_pos": [np.int64(n_pos)],
        "dcg": [np.round(dcg, 6) + 0.0],
        "ndcg": [np.round(dcg / ideal, 6) + 0.0 if ideal > 0 else NULLF],
    })


SQL_NDCG_BLOCKING = r"""
    WITH t AS (
        SELECT doc_id,
               array_to_string(list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> '')[1:5], ' ') AS dg,
               round(len(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> ''))::DOUBLE, 6) + 0.0
                   AS score
        FROM documents
    ),
    s AS (SELECT dg, count(*) AS csize FROM t GROUP BY 1),
    lab AS (SELECT t.doc_id, t.score,
                   CASE WHEN s.csize > 1 THEN 1.0 ELSE 0.0 END AS rel
            FROM t JOIN s USING (dg)),
    rk AS (SELECT rel, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
               AS r FROM lab),
    dcg AS (SELECT sum(rel / log2(r + 1)) AS dcg FROM rk WHERE r <= 20),
    np_ AS (SELECT sum(rel) AS n_pos FROM rk),
    ideal AS (
        SELECT sum(1.0 / log2(i + 1)) AS idcg
        FROM (SELECT unnest(range(1, 21)) AS i)
        WHERE i <= (SELECT n_pos FROM np_)
    )
    SELECT CAST(20 AS BIGINT) AS k,
           CAST((SELECT n_pos FROM np_) AS BIGINT) AS n_pos,
           round(dcg.dcg, 6) + 0.0 AS dcg,
           round(dcg.dcg / ideal.idcg, 6) + 0.0 AS ndcg
    FROM dcg CROSS JOIN ideal
"""


def q_youden_threshold_documents(sf_dir: str) -> pd.DataFrame:
    """Youden-J optimal operating point of the token-count → blocking-
    membership classifier: sweeping every observed score threshold
    (predict positive when score ≥ t), J = TPR − FPR maximized with ties
    to the LOWEST threshold — the ROC-derived cutpoint chooser."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def feat(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split()
        dg = toks.map(lambda t: " ".join(t[:5]) if isinstance(t, list)
                      else "")
        return pd.DataFrame({
            "doc_id": b["doc_id"], "dg": dg,
            "score": np.round(toks.str.len().fillna(0)
                              .astype(np.float64), 6) + 0.0})

    tagged = docs.map_batches(feat, batch_format="pandas").materialize()
    sizes = hash_count(tagged, ["dg"], out_col="csize",
                       num_partitions=_NP).to_pandas()
    smap = dict(zip(sizes["dg"], sizes["csize"]))
    df = tagged.to_pandas()
    y = (df["dg"].map(smap) > 1).to_numpy()
    s = df["score"].to_numpy(np.float64)
    n1, n0 = int(y.sum()), int((~y).sum())
    best = None
    for t in np.unique(s):
        pred = s >= t
        tpr = np.round((pred & y).sum() / n1, 6) + 0.0
        fpr = np.round((pred & ~y).sum() / n0, 6) + 0.0
        j = np.round(tpr - fpr, 6) + 0.0  # from ROUNDED rates, as in SQL
        key = (-j, t)
        if best is None or key < best[0]:
            best = (key, t, tpr, fpr, j)
    return pd.DataFrame({
        "threshold": [best[1]], "tpr": [best[2]], "fpr": [best[3]],
        "youden_j": [best[4]],
    })


SQL_YOUDEN_THRESHOLD = r"""
    WITH t AS (
        SELECT doc_id,
               array_to_string(list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> '')[1:5], ' ') AS dg,
               round(len(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> ''))::DOUBLE, 6) + 0.0
                   AS score
        FROM documents
    ),
    s AS (SELECT dg, count(*) AS csize FROM t GROUP BY 1),
    lab AS (SELECT t.score, s.csize > 1 AS pos FROM t JOIN s USING (dg)),
    n AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END)::DOUBLE AS n1,
                 sum(CASE WHEN pos THEN 0 ELSE 1 END)::DOUBLE AS n0
          FROM lab),
    thr AS (SELECT DISTINCT score AS t FROM lab),
    sweep AS (
        SELECT thr.t,
               round(sum(CASE WHEN lab.score >= thr.t AND lab.pos
                              THEN 1 ELSE 0 END) / n.n1, 6) + 0.0 AS tpr,
               round(sum(CASE WHEN lab.score >= thr.t AND NOT lab.pos
                              THEN 1 ELSE 0 END) / n.n0, 6) + 0.0 AS fpr
        FROM thr CROSS JOIN lab CROSS JOIN n
        GROUP BY thr.t, n.n1, n.n0
    ),
    best AS (
        SELECT t AS threshold, tpr, fpr,
               round(tpr - fpr, 6) + 0.0 AS youden_j,
               ROW_NUMBER() OVER (ORDER BY round(tpr - fpr, 6) DESC, t)
                   AS rk
        FROM sweep
    )
    SELECT threshold, tpr, fpr, youden_j FROM best WHERE rk = 1
"""


def q_allan_variance_daily(sf_dir: str) -> pd.DataFrame:
    """Allan variance of each series at block sizes τ ∈ {1, 2, 4} days:
    AVAR(τ) = Σ(ȳᵢ₊₁−ȳᵢ)²/(2(M−1)) over means of consecutive
    NON-overlapping τ-blocks — the drift-vs-noise separation metric from
    clock metrology, useful on any telemetry series."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            for tau in (1, 2, 4):
                M = len(v) // tau
                if M < 2:
                    rows.append((et, tau, 0, np.nan))
                    continue
                yb = v[:M * tau].reshape(M, tau).mean(axis=1)
                av = (np.diff(yb) ** 2).sum() / (2.0 * (M - 1))
                rows.append((et, tau, M, np.round(av, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "tau",
                                           "n_blocks", "avar"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["tau", "n_blocks"]] = out[["tau", "n_blocks"]].astype(np.int64)
    out = _fill(out, ["avar"])
    return out.sort_values(["event_type", "tau"]).reset_index(drop=True)


SQL_ALLAN_VARIANCE = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) - 1
                   AS i,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    taus AS (SELECT unnest([1, 2, 4]) AS tau),
    blocks AS (
        SELECT r.event_type, taus.tau, r.i // taus.tau AS blk,
               avg(r.v) AS yb
        FROM taus, r
        WHERE r.i < (r.n // taus.tau) * taus.tau
        GROUP BY 1, 2, 3
    ),
    diffs AS (
        SELECT event_type, tau,
               yb - LAG(yb) OVER (PARTITION BY event_type, tau
                                  ORDER BY blk) AS dy
        FROM blocks
    ),
    agg AS (
        SELECT event_type, tau, count(*)::DOUBLE + 1 AS M,
               sum(dy * dy) AS ss
        FROM diffs WHERE dy IS NOT NULL GROUP BY 1, 2
    ),
    grid AS (SELECT DISTINCT d.event_type, t.tau
             FROM daily d CROSS JOIN taus t)
    SELECT g.event_type, CAST(g.tau AS BIGINT) AS tau,
           CAST(COALESCE(a.M, 0) AS BIGINT) AS n_blocks,
           COALESCE(round(a.ss / (2.0 * (a.M - 1)), 6) + 0.0, {NULLF})
               AS avar
    FROM grid g LEFT JOIN agg a
      ON a.event_type = g.event_type AND a.tau = g.tau
    ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# log-loss / Cramér's V / tenure-activity correlation
# ---------------------------------------------------------------------------

def q_logloss_users(sf_dir: str) -> pd.DataFrame:
    """Cross-entropy (log-loss) of the first-half→second-half purchase
    predictor, completing the eval family next to Brier/calibration:
    −mean(y·ln p + (1−y)·ln(1−p)) with p CLIPPED to [1e−6, 1−1e−6]
    (degenerate 0/1 predictions otherwise blow up — clip documented and
    identical on both sides; p is the ROUNDED share)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    bounds = ev.map_batches(
        lambda b: pd.DataFrame({"lo": [b["ts"].astype("int64").min()],
                                "hi": [b["ts"].astype("int64").max()]}),
        batch_format="pandas").to_pandas()
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64").to_numpy()
        first = us <= mid
        isp = (b["event_type"] == "purchase").to_numpy()
        return pd.DataFrame({
            "user_id": b["user_id"],
            "n1": first.astype(np.int64),
            "p1": (first & isp).astype(np.int64),
            "p2": (~first & isp).astype(np.int64)})

    per_user = hash_aggregate(
        ev.map_batches(flags, batch_format="pandas"), ["user_id"],
        {"n1": ("n1", "sum"), "p1": ("p1", "sum"), "p2": ("p2", "max")},
        num_partitions=_NP).to_pandas()
    per_user = per_user[per_user["n1"] > 0]
    pred = np.round(per_user["p1"].to_numpy(np.float64)
                    / per_user["n1"].to_numpy(np.float64), 6) + 0.0
    p = np.clip(pred, 1e-6, 1 - 1e-6)
    y = per_user["p2"].to_numpy(np.float64)
    ll = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
    return pd.DataFrame({
        "n_users": [np.int64(len(p))],
        "logloss": [np.round(ll, 6) + 0.0],
        "base_rate": [np.round(y.mean(), 6) + 0.0],
    })


SQL_LOGLOSS_USERS = """
    WITH mid AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
        FROM events
    ),
    u AS (
        SELECT user_id,
               sum(CASE WHEN epoch_us(ts) <= mid.m THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN epoch_us(ts) <= mid.m
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS p1,
               max(CASE WHEN epoch_us(ts) > mid.m
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS p2
        FROM events CROSS JOIN mid GROUP BY 1
    ),
    t AS (
        SELECT least(greatest(round(p1 * 1.0 / n1, 6) + 0.0, 1e-6),
                     1 - 1e-6) AS p,
               p2::DOUBLE AS y
        FROM u WHERE n1 > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(-avg(y * ln(p) + (1 - y) * ln(1 - p)), 6) + 0.0
               AS logloss,
           round(avg(y), 6) + 0.0 AS base_rate
    FROM t
"""


def q_cramers_v_orders(sf_dir: str) -> pd.DataFrame:
    """Cramér's V association between order priority and status:
    χ² over the contingency table, V = √(χ²/(N·min(r−1, c−1))) — the
    normalized effect size the raw chi-square lacks. One contingency
    aggregate; closed-form algebra."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    ct = hash_count(orders, ["o_orderpriority", "o_orderstatus"],
                    out_col="n", num_partitions=4).to_pandas()
    N = float(ct["n"].sum())
    ri = ct.groupby("o_orderpriority")["n"].sum()
    cj = ct.groupby("o_orderstatus")["n"].sum()
    exp = (ct["o_orderpriority"].map(ri).to_numpy(np.float64)
           * ct["o_orderstatus"].map(cj).to_numpy(np.float64)) / N
    # absent cells contribute their expected count to chi2
    chi2 = (((ct["n"].to_numpy(np.float64) - exp) ** 2) / exp).sum()
    chi2 += N - exp.sum()  # Σexp over PRESENT cells vs N covers absents
    k = min(len(ri) - 1, len(cj) - 1)
    v = np.sqrt(chi2 / (N * k))
    return pd.DataFrame({
        "n_orders": [np.int64(N)],
        "chi2": [np.round(chi2, 6) + 0.0],
        "cramers_v": [np.round(v, 6) + 0.0],
    })


SQL_CRAMERS_V = """
    WITH ct AS (
        SELECT o_orderpriority AS pr, o_orderstatus AS st,
               count(*)::DOUBLE AS n
        FROM orders GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n) AS N FROM ct),
    ri AS (SELECT pr, sum(n) AS r FROM ct GROUP BY 1),
    cj AS (SELECT st, sum(n) AS c FROM ct GROUP BY 1),
    chi AS (
        SELECT sum((ct.n - ri.r * cj.c / tot.N)
                   * (ct.n - ri.r * cj.c / tot.N)
                   / (ri.r * cj.c / tot.N)) AS chi_present,
               sum(ri.r * cj.c / tot.N) AS exp_present
        FROM ct JOIN ri USING (pr) JOIN cj USING (st) CROSS JOIN tot
    ),
    k AS (SELECT least((SELECT count(*) FROM ri) - 1,
                       (SELECT count(*) FROM cj) - 1)::DOUBLE AS k)
    SELECT CAST(tot.N AS BIGINT) AS n_orders,
           round(chi.chi_present + tot.N - chi.exp_present, 6) + 0.0
               AS chi2,
           round(sqrt((chi.chi_present + tot.N - chi.exp_present)
                      / (tot.N * k.k)), 6) + 0.0 AS cramers_v
    FROM chi CROSS JOIN tot CROSS JOIN k
"""


def q_tenure_activity_corr_users(sf_dir: str) -> pd.DataFrame:
    """Does tenure predict intensity? Pearson correlation across users
    between tenure (days from first event to the corpus end) and
    activity rate (events per active-span day, span floored at 1) —
    the cohort-maturity confound check before any engagement claim."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    bounds = ev.map_batches(
        lambda b: pd.DataFrame({"hi": [b["ts"].astype("int64").max()]}),
        batch_format="pandas").to_pandas()
    end_day = int(bounds["hi"].max()) // DAY_US

    def per_user(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["day"] = b["ts"].astype("int64") // DAY_US
        b["one"] = 1
        return b[["user_id", "day", "one"]]

    agg = hash_aggregate(ev.map_batches(per_user, batch_format="pandas"),
                         ["user_id"],
                         {"first_day": ("day", "min"),
                          "n": ("one", "sum")},
                         num_partitions=_NP).to_pandas()
    tenure = (end_day - agg["first_day"].to_numpy(np.int64) + 1) \
        .astype(np.float64)
    rate = agg["n"].to_numpy(np.float64) / tenure
    x, y = tenure - tenure.mean(), rate - rate.mean()
    den = np.sqrt((x ** 2).sum() * (y ** 2).sum())
    r = (x * y).sum() / den if den > 0 else np.nan
    return pd.DataFrame({
        "n_users": [np.int64(len(agg))],
        "mean_tenure_days": [np.round(tenure.mean(), 6) + 0.0],
        "mean_rate": [np.round(rate.mean(), 6) + 0.0],
        "corr": [np.round(r, 6) + 0.0 if np.isfinite(r) else NULLF],
    })


SQL_TENURE_ACTIVITY_CORR = f"""
    WITH endd AS (SELECT max(epoch_us(ts)) // {DAY_US} AS e FROM events),
    u AS (
        SELECT user_id, min(epoch_us(ts)) // {DAY_US} AS fd,
               count(*)::DOUBLE AS n
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT (endd.e - u.fd + 1)::DOUBLE AS tenure,
               u.n / (endd.e - u.fd + 1) AS rate
        FROM u CROSS JOIN endd
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(tenure), 6) + 0.0 AS mean_tenure_days,
           round(avg(rate), 6) + 0.0 AS mean_rate,
           COALESCE(round(corr(tenure, rate), 6) + 0.0, {NULLF}) AS corr
    FROM t
"""


# ---------------------------------------------------------------------------
# Markov entropy rate / Sinkhorn normalization / restricted mean survival
# ---------------------------------------------------------------------------

def q_markov_entropy_rate_events(sf_dir: str) -> pd.DataFrame:
    """Entropy rate of the first-order user event chain:
    H = Σ_s w(s)·Σ_t −P(t|s)·ln P(t|s) with empirical source weights
    w(s) = n_s/N (documented stand-in for the stationary distribution),
    plus the branching perplexity e^H — how predictable the next event
    is given the current one."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("user_id", sort=False):
            t = g.sort_values(["ts", "event_id"])["event_type"].to_numpy()
            if len(t) < 2:
                continue
            outs.append(pd.DataFrame({"cur": t[:-1], "nxt": t[1:]}))
        if not outs:
            return pd.DataFrame({"cur": pd.Series([], dtype="object"),
                                 "nxt": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.concat(outs, ignore_index=True)
        return df.groupby(["cur", "nxt"], sort=False).size() \
            .rename("n").reset_index()

    trans = hash_aggregate(
        keyed_map_partitions(ev, ["user_id"], pairs, num_partitions=_NP),
        ["cur", "nxt"], {"n": ("n", "sum")}, num_partitions=4).to_pandas()
    N = float(trans["n"].sum())
    ns = trans.groupby("cur")["n"].sum()
    p = trans["n"].to_numpy(np.float64) \
        / trans["cur"].map(ns).to_numpy(np.float64)
    w = trans["cur"].map(ns).to_numpy(np.float64) / N
    H = float((-w * p * np.log(p)).sum())
    return pd.DataFrame({
        "n_transitions": [np.int64(N)],
        "entropy_rate_nats": [np.round(H, 6) + 0.0],
        "branch_perplexity": [np.round(np.exp(H), 6) + 0.0],
    })


SQL_MARKOV_ENTROPY_RATE = """
    WITH s AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    t AS (SELECT cur, nxt, count(*)::DOUBLE AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    ns AS (SELECT cur, sum(n) AS ns FROM t GROUP BY 1),
    tot AS (SELECT sum(n) AS N FROM t)
    SELECT CAST(tot.N AS BIGINT) AS n_transitions,
           round(sum(-(ns.ns / tot.N) * (t.n / ns.ns)
                     * ln(t.n / ns.ns)), 6) + 0.0 AS entropy_rate_nats,
           round(exp(sum(-(ns.ns / tot.N) * (t.n / ns.ns)
                         * ln(t.n / ns.ns))), 6) + 0.0
               AS branch_perplexity
    FROM t JOIN ns USING (cur) CROSS JOIN tot
    GROUP BY tot.N
"""


def q_sinkhorn2_transitions(sf_dir: str) -> pd.DataFrame:
    """Two fixed Sinkhorn-Knopp sweeps over the transition-count matrix
    (row-normalize, then column-normalize — the deterministic prefix of
    the doubly-stochastic projection used in optimal-transport pipelines).
    Output: each present (cur, nxt) cell's value after sweep 2."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    from forecastframe_ray.stages.agg import keyed_map_partitions

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("user_id", sort=False):
            t = g.sort_values(["ts", "event_id"])["event_type"].to_numpy()
            if len(t) < 2:
                continue
            outs.append(pd.DataFrame({"cur": t[:-1], "nxt": t[1:]}))
        if not outs:
            return pd.DataFrame({"cur": pd.Series([], dtype="object"),
                                 "nxt": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.concat(outs, ignore_index=True)
        return df.groupby(["cur", "nxt"], sort=False).size() \
            .rename("n").reset_index()

    trans = hash_aggregate(
        keyed_map_partitions(ev, ["user_id"], pairs, num_partitions=_NP),
        ["cur", "nxt"], {"n": ("n", "sum")}, num_partitions=4).to_pandas()
    m = trans.copy()
    m["p"] = m["n"].astype(np.float64)
    rs = m.groupby("cur")["p"].transform("sum")
    m["p"] = m["p"] / rs
    cs = m.groupby("nxt")["p"].transform("sum")
    m["p"] = m["p"] / cs
    m["p2"] = np.round(m["p"].to_numpy(np.float64), 6) + 0.0
    out = m[["cur", "nxt", "n", "p2"]].astype({"n": np.int64})
    return out.sort_values(["cur", "nxt"]).reset_index(drop=True)


SQL_SINKHORN2 = """
    WITH s AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    t AS (SELECT cur, nxt, count(*)::DOUBLE AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    r1 AS (SELECT cur, nxt, n,
                  n / sum(n) OVER (PARTITION BY cur) AS p
           FROM t),
    r2 AS (SELECT cur, nxt, n,
                  p / sum(p) OVER (PARTITION BY nxt) AS p
           FROM r1)
    SELECT cur, nxt, CAST(n AS BIGINT) AS n,
           round(p, 6) + 0.0 AS p2
    FROM r2 ORDER BY 1, 2
"""


def q_rmst_users(sf_dir: str) -> pd.DataFrame:
    """Restricted mean survival time at τ=20 days over the same
    Kaplan-Meier lifetime table as kaplan_meier_users: with integer-day
    lifetimes, RMST(τ) = Σ_{t=0..τ−1} S(t) where S(t) is the (ROUNDED)
    KM survival after the deaths at ≤ t — the 'expected active days in
    the first τ' summary a survival curve alone doesn't give."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    span = hash_aggregate(ev, ["user_id"],
                          {"first_ts": ("ts", "min"),
                           "last_ts": ("ts", "max")},
                          num_partitions=_NP)
    end = ev.map_batches(lambda b: pd.DataFrame({"m": [b["ts"].max()]}),
                         batch_format="pandas").to_pandas()["m"].max()
    cutoff = end - pd.Timedelta(days=7)

    def life(b: pd.DataFrame) -> pd.DataFrame:
        t = ((b["last_ts"].astype("datetime64[us]").astype("int64")
              - b["first_ts"].astype("datetime64[us]").astype("int64"))
             // DAY_US).astype(np.int64)
        return pd.DataFrame({
            "t": t,
            "death": (b["last_ts"] <= cutoff).astype(np.int64),
            "one": np.ones(len(b), dtype=np.int64)})

    tab = hash_aggregate(span.map_batches(life, batch_format="pandas"),
                         ["t"], {"d": ("death", "sum"),
                                 "c": ("one", "sum")},
                         num_partitions=4).to_pandas().sort_values("t")
    total = int(tab["c"].sum())
    at_risk = total - np.concatenate([[0],
                                      np.cumsum(tab["c"].to_numpy())[:-1]])
    surv = np.round(np.cumprod(1.0 - tab["d"].to_numpy(np.float64)
                               / at_risk), 6) + 0.0
    ts = tab["t"].to_numpy(np.int64)
    TAU = 20
    rmst = 0.0
    for day in range(TAU):
        # survival AFTER deaths at lifetimes <= day
        idx = np.searchsorted(ts, day, side="right") - 1
        rmst += surv[idx] if idx >= 0 else 1.0
    return pd.DataFrame({
        "tau_days": [np.int64(TAU)],
        "n_users": [np.int64(total)],
        "rmst_days": [np.round(rmst, 6) + 0.0],
    })


SQL_RMST_USERS = """
    WITH u AS (
        SELECT user_id, min(ts) AS f, max(ts) AS l FROM events GROUP BY 1
    ),
    ce AS (SELECT max(ts) AS e FROM events),
    lt AS (
        SELECT (epoch_us(l) - epoch_us(f)) // 86400000000 AS t,
               CASE WHEN l <= (SELECT e - INTERVAL 7 DAY FROM ce)
                    THEN 1 ELSE 0 END AS death
        FROM u
    ),
    tab AS (SELECT t, sum(death) AS d, count(*) AS c FROM lt GROUP BY 1),
    r AS (
        SELECT t, d,
               (SELECT sum(c) FROM tab) -
               COALESCE(sum(c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_at_risk
        FROM tab
    ),
    km AS (
        SELECT t,
               round(exp(sum(ln(1 - d * 1.0 / n_at_risk))
                         OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)),
                     6) + 0.0 AS s
        FROM r
    ),
    days AS (SELECT unnest(range(0, 20)) AS day),
    sd AS (
        SELECT days.day,
               COALESCE((SELECT s FROM km WHERE km.t <= days.day
                         ORDER BY km.t DESC LIMIT 1), 1.0) AS s
        FROM days
    )
    SELECT CAST(20 AS BIGINT) AS tau_days,
           (SELECT CAST(sum(c) AS BIGINT) FROM tab) AS n_users,
           round(sum(s), 6) + 0.0 AS rmst_days
    FROM sd
"""


# ---------------------------------------------------------------------------
# exact 1-D 2-means / doc-length CCDF / Ruzicka source similarity
# ---------------------------------------------------------------------------

def q_two_means_split_daily(sf_dir: str) -> pd.DataFrame:
    """EXACT 2-means clustering of each series' values (1-D k-means is
    solvable by split enumeration over the sorted order): the threshold
    minimizing within-cluster SSE (ROUNDED, ties → smaller split index),
    with both cluster means — the regime-split primitive fancier
    changepoint methods refine."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = np.sort(g["v"].to_numpy(np.float64))
            n = len(v)
            if n < 2:
                rows.append((et, n, 0, np.nan, np.nan, np.nan))
                continue
            cs = np.cumsum(v)
            tot = cs[-1]
            best = None
            for k in range(1, n):  # left cluster = first k sorted values
                sl, sr = cs[k - 1], tot - cs[k - 1]
                sse = (np.round(
                    (v[:k] ** 2).sum() - sl * sl / k
                    + (v[k:] ** 2).sum() - sr * sr / (n - k), 6) + 0.0)
                if best is None or (sse, k) < best[:2]:
                    best = (sse, k, sl / k, sr / (n - k))
            rows.append((et, n, best[1],
                         np.round(best[2], 6) + 0.0,
                         np.round(best[3], 6) + 0.0, best[0]))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "split_k", "mean_lo",
                                           "mean_hi", "sse"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["n_days", "split_k"]] = out[["n_days", "split_k"]] \
        .astype(np.int64)
    out = _fill(out, ["mean_lo", "mean_hi", "sse"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_TWO_MEANS_SPLIT = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n,
               sum(v) OVER (PARTITION BY event_type ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cs,
               sum(v * v) OVER (PARTITION BY event_type ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS css,
               sum(v) OVER (PARTITION BY event_type) AS tot,
               sum(v * v) OVER (PARTITION BY event_type) AS tot2
        FROM daily
    ),
    sp AS (
        SELECT event_type, rn AS k, n,
               cs / rn AS mean_lo, (tot - cs) / (n - rn) AS mean_hi,
               round(css - cs * cs / rn
                     + (tot2 - css) - (tot - cs) * (tot - cs) / (n - rn),
                     6) + 0.0 AS sse
        FROM r WHERE rn < n
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY sse, k) AS pos
        FROM sp
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(k AS BIGINT) AS split_k,
           round(mean_lo, 6) + 0.0 AS mean_lo,
           round(mean_hi, 6) + 0.0 AS mean_hi, sse
    FROM best WHERE pos = 1 ORDER BY 1
"""


def q_ccdf_doclen_documents(sf_dir: str) -> pd.DataFrame:
    """Complementary CDF of document token lengths at decade thresholds
    {10, 30, 100, 300, 1000} — the log-log survival view that exposes
    heavy tails the mean hides (the Zipf/Heaps companion at document
    grain)."""
    docs = _read(sf_dir, "documents", ["text"])

    def lens(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.split().str.len().fillna(0) \
            .astype(np.int64).to_numpy()
        out = {"total": [len(n)]}
        for thr in (10, 30, 100, 300, 1000):
            out[f"ge_{thr}"] = [int((n >= thr).sum())]
        return pd.DataFrame(out)

    agg = docs.map_batches(lens, batch_format="pandas").to_pandas().sum()
    total = float(agg["total"])
    rows = [(thr, int(agg[f"ge_{thr}"]),
             np.round(agg[f"ge_{thr}"] / total, 6) + 0.0)
            for thr in (10, 30, 100, 300, 1000)]
    return pd.DataFrame(rows, columns=["threshold", "n_ge", "ccdf"]) \
        .astype({"threshold": np.int64, "n_ge": np.int64})


SQL_CCDF_DOCLEN = r"""
    WITH l AS (
        SELECT len(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '')) AS n
        FROM documents
    ),
    thr AS (SELECT unnest([10, 30, 100, 300, 1000]) AS threshold)
    SELECT CAST(thr.threshold AS BIGINT) AS threshold,
           CAST(sum(CASE WHEN l.n >= thr.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ge,
           round(sum(CASE WHEN l.n >= thr.threshold THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) + 0.0 AS ccdf
    FROM thr CROSS JOIN l
    GROUP BY 1 ORDER BY 1
"""


def q_ruzicka_sources(sf_dir: str) -> pd.DataFrame:
    """Ruzicka (weighted Jaccard) similarity between the token-frequency
    profiles of the first four sources: Σmin(fa, fb)/Σmax(fa, fb) over
    the union vocabulary of each pair (relative frequencies) — the
    continuous generalization of Jaccard the KL/Delta family lacks."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[["source"]].copy()
        ex["tok"] = b["text"].str.split()
        ex = ex.explode("tok").dropna(subset=["tok"])
        vc = ex.groupby(["source", "tok"], sort=False).size()
        return vc.rename("cnt").reset_index() \
            .rename(columns={"tok": "token"})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["source", "token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP).materialize()
    sub = tc.filter(lambda r: r["source"] in _KL_SOURCES).to_pandas()
    counts = {s: dict(zip(g["token"], g["c"].astype(float)))
              for s, g in sub.groupby("source")}
    totals = {s: sum(counts.get(s, {}).values()) for s in _KL_SOURCES}
    rows = []
    for i, a in enumerate(_KL_SOURCES):
        for b in _KL_SOURCES[i + 1:]:
            ca, cb = counts.get(a, {}), counts.get(b, {})
            na, nb = totals[a], totals[b]
            smin = smax = 0.0
            for t in set(ca) | set(cb):
                fa = ca.get(t, 0.0) / na
                fb = cb.get(t, 0.0) / nb
                smin += min(fa, fb)
                smax += max(fa, fb)
            rows.append((a, b, np.round(smin / smax, 6) + 0.0))
    return pd.DataFrame(rows, columns=["src_a", "src_b", "ruzicka"])


SQL_RUZICKA_SOURCES = r"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
      WHERE source IN ('src0', 'src1', 'src2', 'src3')
    ),
    tc AS (SELECT source, token, count(*)::DOUBLE AS c
           FROM tok GROUP BY 1, 2),
    n AS (SELECT source, sum(c) AS N FROM tc GROUP BY 1),
    srcs AS (SELECT unnest(['src0', 'src1', 'src2', 'src3']) AS s),
    pairs AS (SELECT a.s AS sa, b.s AS sb
              FROM srcs a, srcs b WHERE a.s < b.s),
    ut AS (
        SELECT p.sa, p.sb, t.token,
               max(CASE WHEN t.source = p.sa THEN t.c ELSE 0 END) AS ca,
               max(CASE WHEN t.source = p.sb THEN t.c ELSE 0 END) AS cb
        FROM pairs p JOIN tc t ON t.source IN (p.sa, p.sb)
        GROUP BY 1, 2, 3
    )
    SELECT u.sa AS src_a, u.sb AS src_b,
           round(sum(least(u.ca / na.N, u.cb / nb.N))
                 / sum(greatest(u.ca / na.N, u.cb / nb.N)), 6) + 0.0
               AS ruzicka
    FROM ut u JOIN n na ON na.source = u.sa JOIN n nb ON nb.source = u.sb
    GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# biweight location / term-rank correlation / inverse-vol weights
# ---------------------------------------------------------------------------

def q_biweight_location_daily(sf_dir: str) -> pd.DataFrame:
    """One-step Tukey biweight location per series (Mosteller & Tukey
    1977): from the (ROUNDED) median and MAD, u = (v−med)/(9·MAD),
    weights (1−u²)² for |u|<1, location = Σwv/Σw — the outlier-resistant
    mean that degrades gracefully where the median is too coarse. NULLF
    when MAD = 0."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["v"].to_numpy(np.float64)
            med = np.round(np.quantile(v, 0.5), 6) + 0.0
            mad = np.round(np.quantile(np.abs(v - med), 0.5), 6) + 0.0
            if mad <= 0:
                rows.append((et, len(v), med, mad, np.nan))
                continue
            u = (v - med) / (9.0 * mad)
            w = np.where(np.abs(u) < 1.0, (1.0 - u * u) ** 2, 0.0)
            loc = (w * v).sum() / w.sum()
            rows.append((et, len(v), med, mad,
                         np.round(loc, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "median", "mad", "biweight"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["biweight"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_BIWEIGHT_LOCATION = f"""
    WITH daily AS ({_DAILY_SQL}),
    med AS (SELECT event_type, count(*) AS n,
                   round(quantile_cont(v, 0.5), 6) + 0.0 AS med
            FROM daily GROUP BY 1),
    mad AS (
        SELECT d.event_type,
               round(quantile_cont(abs(d.v - med.med), 0.5), 6) + 0.0
                   AS mad
        FROM daily d JOIN med USING (event_type) GROUP BY 1, med.med
    ),
    w AS (
        SELECT d.event_type, d.v,
               CASE WHEN abs((d.v - med.med) / (9 * mad.mad)) < 1
                    THEN pow(1 - pow((d.v - med.med) / (9 * mad.mad), 2),
                             2)
                    ELSE 0 END AS w
        FROM daily d JOIN med USING (event_type)
        JOIN mad USING (event_type)
        WHERE mad.mad > 0
    ),
    loc AS (SELECT event_type, sum(w * v) / sum(w) AS loc
            FROM w GROUP BY 1)
    SELECT med.event_type, CAST(med.n AS BIGINT) AS n_days, med.med
               AS median, mad.mad AS mad,
           COALESCE(round(loc.loc, 6) + 0.0, {NULLF}) AS biweight
    FROM med JOIN mad USING (event_type)
    LEFT JOIN loc USING (event_type)
    ORDER BY 1
"""


def q_term_rank_corr_sources(sf_dir: str) -> pd.DataFrame:
    """Vocabulary-rank stability between src0 and src1: Spearman
    correlation of the two sources' count-ranks over the corpus top-50
    tokens (average ranks on count ties — absent terms rank as count 0).
    The drift-detection complement to KL at rank grain."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[["source"]].copy()
        ex["tok"] = b["text"].str.split()
        ex = ex.explode("tok").dropna(subset=["tok"])
        vc = ex.groupby(["source", "tok"], sort=False).size()
        return vc.rename("cnt").reset_index() \
            .rename(columns={"tok": "token"})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["source", "token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP).materialize()
    corpus = hash_aggregate(tc, ["token"], {"n": ("c", "sum")},
                            num_partitions=_NP).to_pandas()
    top = list(corpus.sort_values(["n", "token"],
                                  ascending=[False, True]).head(50)
               ["token"])
    sub = tc.filter(
        lambda r: r["source"] in ("src0", "src1")
        and r["token"] in set(top)).to_pandas()

    def ranks(src):
        cmap = dict(zip(sub.loc[sub["source"] == src, "token"],
                        sub.loc[sub["source"] == src, "c"]))
        c = np.array([float(cmap.get(t, 0)) for t in top])
        order = np.argsort(-c, kind="mergesort")
        rk = np.empty(len(c))
        cs = c[order]
        i = 0
        while i < len(c):
            j = i
            while j + 1 < len(c) and cs[j + 1] == cs[i]:
                j += 1
            rk[order[i:j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return rk

    ra, rb = ranks("src0"), ranks("src1")
    x, y = ra - ra.mean(), rb - rb.mean()
    rho = (x * y).sum() / np.sqrt((x ** 2).sum() * (y ** 2).sum())
    return pd.DataFrame({
        "n_terms": [np.int64(len(top))],
        "spearman_rho": [np.round(rho, 6) + 0.0],
    })


SQL_TERM_RANK_CORR = r"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    corpus AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
    top AS (SELECT token FROM corpus ORDER BY n DESC, token LIMIT 50),
    tc AS (
        SELECT s.src, top.token, COALESCE(cnt.c, 0)::DOUBLE AS c
        FROM (SELECT unnest(['src0', 'src1']) AS src) s
        CROSS JOIN top
        LEFT JOIN (SELECT source, token, count(*)::DOUBLE AS c
                   FROM tok WHERE source IN ('src0', 'src1')
                   GROUP BY 1, 2) cnt
          ON cnt.source = s.src AND cnt.token = top.token
    ),
    rk AS (
        SELECT src, token,
               rank() OVER (PARTITION BY src ORDER BY c DESC)
               + (count(*) OVER (PARTITION BY src, c) - 1) / 2.0 AS r
        FROM tc
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM top) AS n_terms,
           round(corr(a.r, b.r), 6) + 0.0 AS spearman_rho
    FROM rk a JOIN rk b ON a.token = b.token
    WHERE a.src = 'src0' AND b.src = 'src1'
"""


def q_inverse_vol_weights_daily(sf_dir: str) -> pd.DataFrame:
    """Risk-parity (inverse-volatility) weights across the series family:
    wᵢ = (1/σᵢ)/Σ(1/σⱼ) over each series' daily-value ddof=1 std — how a
    monitoring budget or ensemble weight would allocate attention."""
    ev = _bucket_series(sf_dir, DAY_US, "d")

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["v2"] = b["v"].to_numpy(np.float64) ** 2
        b["one"] = 1.0
        return b[["event_type", "one", "v", "v2"]]

    g = hash_aggregate(ev.map_batches(moments, batch_format="pandas"),
                       ["event_type"],
                       {"n": ("one", "sum"), "s": ("v", "sum"),
                        "ss": ("v2", "sum")},
                       num_partitions=_NP).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    n = g["n"].to_numpy(np.float64)
    m = g["s"].to_numpy(np.float64) / n
    sd = np.sqrt((g["ss"].to_numpy(np.float64) - n * m * m) / (n - 1.0))
    inv = 1.0 / sd
    w = inv / inv.sum()
    return pd.DataFrame({
        "event_type": g["event_type"],
        "sigma": np.round(sd, 6) + 0.0,
        "weight": np.round(w, 6) + 0.0,
    })


SQL_INVERSE_VOL_WEIGHTS = f"""
    WITH daily AS ({_DAILY_SQL}),
    s AS (SELECT event_type, stddev_samp(v) AS sd FROM daily GROUP BY 1),
    t AS (SELECT sum(1.0 / sd) AS tot FROM s)
    SELECT s.event_type, round(s.sd, 6) + 0.0 AS sigma,
           round((1.0 / s.sd) / t.tot, 6) + 0.0 AS weight
    FROM s CROSS JOIN t ORDER BY 1
"""


# ---------------------------------------------------------------------------
# tabular CUSUM / Poisson rate ratio / diurnal harmonic
# ---------------------------------------------------------------------------

def q_tabular_cusum_daily(sf_dir: str) -> pd.DataFrame:
    """Two-sided tabular CUSUM (Page; NIST handbook form) per series with
    slack k = 0.5σ around the mean: C⁺ₜ = max(0, C⁺ₜ₋₁ + zₜ − k) and the
    mirrored C⁻ — each reset-recursion rewritten by the cumsum-minus-
    running-min identity (exactly the stock-balance trick), so the oracle
    is pure window algebra. Alarms flag on ROUNDED statistics vs h = 4σ
    (in z-units, σ=1)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    K, H = 0.5, 4.0

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d").copy()
            v = g["v"].to_numpy(np.float64)
            mu, sd = v.mean(), v.std(ddof=1)
            if sd <= 0:
                continue
            z = (v - mu) / sd
            sp = np.cumsum(z - K)
            cp = sp - np.minimum.accumulate(np.minimum(sp, 0.0))
            sm = np.cumsum(-z - K)
            cm = sm - np.minimum.accumulate(np.minimum(sm, 0.0))
            cpr = np.round(cp, 6) + 0.0
            cmr = np.round(cm, 6) + 0.0
            g["cusum_hi"] = cpr
            g["cusum_lo"] = cmr
            g["alarm"] = (cpr > H) | (cmr > H)
            outs.append(g[["event_type", "d", "v", "cusum_hi",
                           "cusum_lo", "alarm"]])
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame(columns=["event_type", "d", "v", "cusum_hi",
                                  "cusum_lo", "alarm"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    return out.sort_values(["event_type", "d"]).reset_index(drop=True)


SQL_TABULAR_CUSUM = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, stddev_samp(v) AS sd
          FROM daily GROUP BY 1),
    z AS (
        SELECT d.event_type, d.d, d.v, (d.v - m.mu) / m.sd AS z
        FROM daily d JOIN m USING (event_type)
        WHERE m.sd > 0
    ),
    s AS (
        SELECT event_type, d, v,
               sum(z - 0.5) OVER w AS sp,
               sum(-z - 0.5) OVER w AS sm
        FROM z WINDOW w AS (PARTITION BY event_type ORDER BY d
                            ROWS UNBOUNDED PRECEDING)
    ),
    c AS (
        SELECT event_type, d, v,
               round(sp - least(min(sp) OVER w, 0), 6) + 0.0 AS cusum_hi,
               round(sm - least(min(sm) OVER w, 0), 6) + 0.0 AS cusum_lo
        FROM s WINDOW w AS (PARTITION BY event_type ORDER BY d
                            ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, d, v, cusum_hi, cusum_lo,
           (cusum_hi > 4.0 OR cusum_lo > 4.0) AS alarm
    FROM c
"""


def q_rate_ratio_events(sf_dir: str) -> pd.DataFrame:
    """Poisson rate ratio of error vs click events over the shared
    exposure window: λ̂_e/λ̂_c with the Wald log-scale CI
    exp(ln RR ± 1.96·√(1/n_e + 1/n_c)) — the incident-rate comparison
    ops teams reach for before any alerting threshold change."""
    ev = _read(sf_dir, "events", ["event_type"])
    counts = hash_count(ev, ["event_type"], out_col="n",
                        num_partitions=4).to_pandas() \
        .set_index("event_type")["n"]
    ne, nc = float(counts.get("error", 0)), float(counts.get("click", 0))
    if ne > 0 and nc > 0:
        rr = ne / nc
        se = np.sqrt(1.0 / ne + 1.0 / nc)
        lo = np.exp(np.log(rr) - 1.96 * se)
        hi = np.exp(np.log(rr) + 1.96 * se)
        vals = [np.round(rr, 6) + 0.0, np.round(lo, 6) + 0.0,
                np.round(hi, 6) + 0.0]
    else:
        vals = [NULLF] * 3
    return pd.DataFrame({
        "n_error": [np.int64(ne)], "n_click": [np.int64(nc)],
        "rate_ratio": [vals[0]], "ci_lo": [vals[1]], "ci_hi": [vals[2]],
    })


SQL_RATE_RATIO = f"""
    WITH c AS (
        SELECT sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                   END)::DOUBLE AS ne,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                   END)::DOUBLE AS nc
        FROM events
    )
    SELECT CAST(ne AS BIGINT) AS n_error, CAST(nc AS BIGINT) AS n_click,
           COALESCE(CASE WHEN ne > 0 AND nc > 0
                         THEN round(ne / nc, 6) + 0.0 END, {NULLF})
               AS rate_ratio,
           COALESCE(CASE WHEN ne > 0 AND nc > 0
                         THEN round(exp(ln(ne / nc)
                              - 1.96 * sqrt(1 / ne + 1 / nc)), 6) + 0.0
                    END, {NULLF}) AS ci_lo,
           COALESCE(CASE WHEN ne > 0 AND nc > 0
                         THEN round(exp(ln(ne / nc)
                              + 1.96 * sqrt(1 / ne + 1 / nc)), 6) + 0.0
                    END, {NULLF}) AS ci_hi
    FROM c
"""


def q_diurnal_harmonic_events(sf_dir: str) -> pd.DataFrame:
    """First diurnal harmonic of each type's hourly series: amplitude and
    acrophase (peak hour) of the 24-h cosine fit via the discrete Fourier
    projections a = Σv·cos(ωt), b = Σv·sin(ωt), ω = 2π/24 over
    hour-of-day — the parametric sibling of the circular-mean profile.
    Phase maps atan2 to [0, 24) hours."""
    hourly = _bucket_series(sf_dir, HOUR_US, "h")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["h"].astype("datetime64[us]").astype("int64")
        theta = 2.0 * np.pi * ((us % DAY_US) / float(DAY_US))
        v = b["v"].to_numpy(np.float64)
        return pd.DataFrame({"event_type": b["event_type"],
                             "a": v * np.cos(theta),
                             "b": v * np.sin(theta), "n": 1.0,
                             "s": v})

    agg = hash_aggregate(hourly.map_batches(partial,
                                            batch_format="pandas"),
                         ["event_type"],
                         {"a": ("a", "sum"), "b": ("b", "sum"),
                          "n": ("n", "sum"), "s": ("s", "sum")},
                         num_partitions=_NP).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    a = 2.0 * agg["a"].to_numpy(np.float64) / n
    b = 2.0 * agg["b"].to_numpy(np.float64) / n
    amp = np.sqrt(a * a + b * b)
    phase = (np.arctan2(b, a) % (2.0 * np.pi)) * 24.0 / (2.0 * np.pi)
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n_hours": n.astype(np.int64),
        "mean_level": np.round(agg["s"].to_numpy(np.float64) / n, 6) + 0.0,
        "amplitude": np.round(amp, 6) + 0.0,
        "peak_hour": np.round(phase, 6) + 0.0,
    }).sort_values("event_type").reset_index(drop=True)


SQL_DIURNAL_HARMONIC = f"""
    WITH hourly AS ({_HOURLY_SQL}),
    t AS (
        SELECT event_type, v,
               2 * pi() * ((epoch_us(h) % {DAY_US}) * 1.0 / {DAY_US})
                   AS theta
        FROM hourly
    ),
    agg AS (
        SELECT event_type, count(*)::DOUBLE AS n, sum(v) AS s,
               2 * sum(v * cos(theta)) / count(*) AS a,
               2 * sum(v * sin(theta)) / count(*) AS b
        FROM t GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           round(s / n, 6) + 0.0 AS mean_level,
           round(sqrt(a * a + b * b), 6) + 0.0 AS amplitude,
           round(fmod(atan2(b, a) + 2 * pi(), 2 * pi())
                 * 24 / (2 * pi()), 6) + 0.0 AS peak_hour
    FROM agg ORDER BY 1
"""


# ---------------------------------------------------------------------------
# gamma MoM fit / lognormal tail check / variance-ratio test
# ---------------------------------------------------------------------------

def q_gamma_fit_events(sf_dir: str) -> pd.DataFrame:
    """Gamma method-of-moments fit of each type's positive values:
    shape k = m²/s², scale θ = s²/m — the workhorse positive-skew model
    (completes the distribution-fit family next to exp/GPD/GEV/NB)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"] > 0].copy()
        b["v2"] = b["value"].to_numpy(np.float64) ** 2
        b["one"] = 1.0
        return b[["event_type", "one", "value", "v2"]]

    g = hash_aggregate(ev.map_batches(moments, batch_format="pandas"),
                       ["event_type"],
                       {"n": ("one", "sum"), "s": ("value", "sum"),
                        "ss": ("v2", "sum")},
                       num_partitions=_NP).to_pandas()
    n = g["n"].to_numpy(np.float64)
    m = g["s"].to_numpy(np.float64) / n
    s2 = (g["ss"].to_numpy(np.float64) - n * m * m) / (n - 1.0)
    return pd.DataFrame({
        "event_type": g["event_type"],
        "n_pos": g["n"].astype(np.int64),
        "gamma_shape": np.round(m * m / s2, 6) + 0.0,
        "gamma_scale": np.round(s2 / m, 6) + 0.0,
    }).sort_values("event_type").reset_index(drop=True)


SQL_GAMMA_FIT = """
    WITH p AS (SELECT event_type, value FROM events WHERE value > 0),
    m AS (SELECT event_type, count(*)::DOUBLE AS n, avg(value) AS m,
                 var_samp(value) AS s2
          FROM p GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_pos,
           round(m * m / s2, 6) + 0.0 AS gamma_shape,
           round(s2 / m, 6) + 0.0 AS gamma_scale
    FROM m ORDER BY 1
"""


def q_lognormal_tail_events(sf_dir: str) -> pd.DataFrame:
    """Lognormal tail check per type: fit μ, σ on ln(v) (v>0), compare the
    implied p95 = exp(μ + 1.645σ) to the empirical p95 — the 'is the
    parametric tail honest?' ratio that decides whether a lognormal
    capacity model will underprovision."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["value"].to_numpy(np.float64)
            v = v[v > 0]
            if len(v) < 2:
                rows.append((et, len(v), np.nan, np.nan, np.nan))
                continue
            lv = np.log(v)
            mu, sd = lv.mean(), lv.std(ddof=1)
            implied = np.exp(mu + 1.645 * sd)
            emp = np.quantile(v, 0.95)
            rows.append((et, len(v), np.round(implied, 6) + 0.0,
                         np.round(emp, 6) + 0.0,
                         np.round(implied / emp, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_pos",
                                           "p95_lognormal",
                                           "p95_empirical", "tail_ratio"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_pos"] = out["n_pos"].astype(np.int64)
    out = _fill(out, ["p95_lognormal", "p95_empirical", "tail_ratio"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_LOGNORMAL_TAIL = f"""
    WITH p AS (SELECT event_type, value FROM events WHERE value > 0),
    m AS (SELECT event_type, count(*) AS n, avg(ln(value)) AS mu,
                 stddev_samp(ln(value)) AS sd,
                 quantile_cont(value, 0.95) AS emp
          FROM p GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_pos,
           COALESCE(CASE WHEN n >= 2
                         THEN round(exp(mu + 1.645 * sd), 6) + 0.0 END,
                    {NULLF}) AS p95_lognormal,
           COALESCE(CASE WHEN n >= 2
                         THEN round(emp, 6) + 0.0 END, {NULLF})
               AS p95_empirical,
           COALESCE(CASE WHEN n >= 2
                         THEN round(exp(mu + 1.645 * sd) / emp, 6) + 0.0
                    END, {NULLF}) AS tail_ratio
    FROM m ORDER BY 1
"""


def q_variance_ratio_daily(sf_dir: str) -> pd.DataFrame:
    """Lo-MacKinlay variance ratio VR(q) of each series' day-over-day
    changes at q ∈ {2, 4}: Var of q-period sums over q·Var of 1-period
    changes (population variances of overlapping q-sums, the simple
    uncorrected form, documented) — 1 under a random walk, <1 mean-
    reverting, >1 trending."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            r = np.diff(v)
            if len(r) < 5:
                continue
            v1 = r.var(ddof=0)
            for q in (2, 4):
                rq = np.convolve(r, np.ones(q), mode="valid")
                vr = rq.var(ddof=0) / (q * v1) if v1 > 0 else np.nan
                rows.append((et, q, len(rq),
                             np.round(vr, 6) + 0.0 if np.isfinite(vr)
                             else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "q", "n_windows",
                                           "vr"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["q", "n_windows"]] = out[["q", "n_windows"]].astype(np.int64)
    out = _fill(out, ["vr"])
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


SQL_VARIANCE_RATIO = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, d,
               v - LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS r
        FROM daily
    ),
    rr AS (SELECT event_type, d, r,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                      AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM r WHERE r IS NOT NULL),
    v1 AS (SELECT event_type, var_pop(r) AS v1, any_value(n) AS n
           FROM rr GROUP BY 1),
    qs AS (SELECT unnest([2, 4]) AS q),
    sums AS (
        SELECT a.event_type, qs.q, a.rn,
               sum(b.r) AS rq, count(*) AS cnt
        FROM qs, rr a
        JOIN rr b ON a.event_type = b.event_type
                  AND b.rn BETWEEN a.rn AND a.rn + qs.q - 1
        GROUP BY 1, 2, 3
        HAVING count(*) = qs.q
    ),
    vq AS (SELECT event_type, q, var_pop(rq) AS vq, count(*) AS nw
           FROM sums GROUP BY 1, 2)
    SELECT vq.event_type, CAST(vq.q AS BIGINT) AS q,
           CAST(vq.nw AS BIGINT) AS n_windows,
           COALESCE(CASE WHEN v1.v1 > 0 AND v1.n >= 5
                         THEN round(vq.vq / (vq.q * v1.v1), 6) + 0.0 END,
                    {NULLF}) AS vr
    FROM vq JOIN v1 USING (event_type)
    ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# shock half-life / mean excess / KPSS stationarity
# ---------------------------------------------------------------------------

def q_shock_halflife_daily(sf_dir: str) -> pd.DataFrame:
    """Shock persistence per series: from the exact AR(1) slope φ, the
    half-life of a deviation ln(½)/ln|φ| days (NULLF when |φ| ≥ 1 —
    shocks never decay — or φ ≈ 0). The 'how long does an incident
    linger' readout of the AR(1) fit, φ computed from the same rounded
    value both sides report."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            if len(v) < 3:
                rows.append((et, np.nan, np.nan))
                continue
            x, y = v[:-1], v[1:]
            xm, ym = x.mean(), y.mean()
            sxx = ((x - xm) ** 2).sum()
            if sxx <= 0:
                rows.append((et, np.nan, np.nan))
                continue
            phi = np.round(((x - xm) * (y - ym)).sum() / sxx, 6) + 0.0
            if phi == 0 or abs(phi) >= 1:
                rows.append((et, phi, np.nan))
                continue
            rows.append((et, phi,
                         np.round(np.log(0.5) / np.log(abs(phi)), 6)
                         + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "phi",
                                           "halflife_days"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out = _fill(out, ["phi", "halflife_days"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_SHOCK_HALFLIFE = f"""
    WITH daily AS ({_DAILY_SQL}),
    p AS (
        SELECT event_type, v,
               LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS x
        FROM daily
    ),
    fit AS (
        SELECT event_type, count(*) AS n,
               round(regr_slope(v, x), 6) + 0.0 AS phi
        FROM p WHERE x IS NOT NULL GROUP BY 1
    )
    SELECT event_type,
           COALESCE(CASE WHEN n >= 2 THEN phi END, {NULLF}) AS phi,
           COALESCE(CASE WHEN n >= 2 AND phi <> 0 AND abs(phi) < 1
                         THEN round(ln(0.5) / ln(abs(phi)), 6) + 0.0 END,
                    {NULLF}) AS halflife_days
    FROM fit ORDER BY 1
"""


def q_mean_excess_events(sf_dir: str) -> pd.DataFrame:
    """Mean-excess function at the p50/p75/p90 thresholds per type:
    e(u) = mean(v − u | v > u) — rising e(u) ⇒ heavy (Pareto-ish) tail,
    flat ⇒ exponential; the graphical EVT threshold-picker as a table.
    Thresholds round to 6 before the conditional mean on both sides."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g["value"].to_numpy(np.float64)
            for qq in (0.5, 0.75, 0.9):
                u = np.round(np.quantile(v, qq), 6) + 0.0
                exc = v[v > u] - u
                rows.append((et, qq, u, len(exc),
                             np.round(exc.mean(), 6) + 0.0 if len(exc)
                             else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "q", "threshold",
                                           "n_exc", "mean_excess"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_exc"] = out["n_exc"].astype(np.int64)
    out = _fill(out, ["mean_excess"])
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


SQL_MEAN_EXCESS = f"""
    WITH thr AS (
        SELECT event_type, 0.5 AS q,
               round(quantile_cont(value, 0.5), 6) + 0.0 AS u
        FROM events GROUP BY 1
        UNION ALL
        SELECT event_type, 0.75,
               round(quantile_cont(value, 0.75), 6) + 0.0
        FROM events GROUP BY 1
        UNION ALL
        SELECT event_type, 0.9,
               round(quantile_cont(value, 0.9), 6) + 0.0
        FROM events GROUP BY 1
    ),
    exc AS (
        SELECT t.event_type, t.q, t.u,
               count(*) FILTER (WHERE e.value > t.u) AS n_exc,
               avg(e.value - t.u) FILTER (WHERE e.value > t.u) AS me
        FROM thr t JOIN events e USING (event_type)
        GROUP BY 1, 2, 3
    )
    SELECT event_type, q, u AS threshold,
           CAST(n_exc AS BIGINT) AS n_exc,
           COALESCE(round(me, 6) + 0.0, {NULLF}) AS mean_excess
    FROM exc ORDER BY 1, 2
"""


def q_kpss_daily(sf_dir: str) -> pd.DataFrame:
    """KPSS level-stationarity statistic per series (Kwiatkowski et al.
    1992, lag-0 long-run variance — the simple form, documented):
    η = Σ Sₜ²/(n²·σ̂²_pop) over partial sums of demeaned values. The
    null-reversed companion to the Dickey-Fuller test (KPSS null =
    stationary); 0.463 is the 5% critical value."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n = len(v)
            e = v - v.mean()
            s2 = (e ** 2).mean()
            if n < 3 or s2 <= 0:
                rows.append((et, n, np.nan, None))
                continue
            S = np.cumsum(e)
            eta = np.round((S ** 2).sum() / (n * n * s2), 6) + 0.0
            rows.append((et, n, eta, bool(eta > 0.463)))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "kpss_eta", "reject_level"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["kpss_eta"])
    out["reject_level"] = out["reject_level"].fillna(False).astype(bool)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_KPSS_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, count(*)::DOUBLE AS n
          FROM daily GROUP BY 1),
    s AS (
        SELECT d.event_type, m.n,
               sum(d.v - m.mu) OVER (PARTITION BY d.event_type
                                     ORDER BY d.d
                                     ROWS UNBOUNDED PRECEDING) AS S,
               (d.v - m.mu) * (d.v - m.mu) AS e2
        FROM daily d JOIN m USING (event_type)
    ),
    agg AS (
        SELECT event_type, any_value(n) AS n, sum(S * S) AS ss2,
               sum(e2) / any_value(n) AS s2
        FROM s GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN n >= 3 AND s2 > 0
                         THEN round(ss2 / (n * n * s2), 6) + 0.0 END,
                    {NULLF}) AS kpss_eta,
           COALESCE(CASE WHEN n >= 3 AND s2 > 0
                         THEN round(ss2 / (n * n * s2), 6) + 0.0 > 0.463
                    END, false) AS reject_level
    FROM agg ORDER BY 1
"""


# ---------------------------------------------------------------------------
# pairwise dominance / Newey-West mean CI / Nelson-Aalen hazard
# ---------------------------------------------------------------------------

def q_dominance_matrix_daily(sf_dir: str) -> pd.DataFrame:
    """Day-wise dominance between every series pair: over common days,
    the share where a's value strictly exceeds b's (ties counted
    separately) — the nonparametric 'who usually wins' matrix under the
    Mann-Whitney story but paired by day."""
    daily = _bucket_series(sf_dir, DAY_US, "d")
    wide = daily.to_pandas().pivot_table(index="d", columns="event_type",
                                         values="v", aggfunc="sum")
    ets = sorted(wide.columns)
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            m = wide[a].notna() & wide[b].notna()
            va = wide.loc[m, a].to_numpy(np.float64)
            vb = wide.loc[m, b].to_numpy(np.float64)
            n = len(va)
            wins = int((va > vb).sum())
            ties = int((va == vb).sum())
            rows.append((a, b, n, wins, ties,
                         np.round(wins / n, 6) + 0.0 if n else NULLF))
    return pd.DataFrame(rows, columns=["et_a", "et_b", "n_days",
                                       "a_wins", "ties", "win_share"]) \
        .astype({"n_days": np.int64, "a_wins": np.int64,
                 "ties": np.int64})


SQL_DOMINANCE_MATRIX = f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT a.event_type AS et_a, b.event_type AS et_b,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN a.v > b.v THEN 1 ELSE 0 END) AS BIGINT)
               AS a_wins,
           CAST(sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS BIGINT)
               AS ties,
           round(sum(CASE WHEN a.v > b.v THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) + 0.0 AS win_share
    FROM daily a JOIN daily b
      ON a.d = b.d AND a.event_type < b.event_type
    GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_newey_west_daily(sf_dir: str) -> pd.DataFrame:
    """Autocorrelation-robust mean inference per series: Newey-West
    long-run variance with Bartlett weights at lag L=3,
    σ²_NW = γ₀ + 2Σₖ(1−k/(L+1))γₖ (population autocovariances), and the
    95% CI mean ± 1.96·√(σ²_NW/n) — the honest uncertainty when daily
    values autocorrelate (the naive CI is also reported for contrast)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    L = 3

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n = len(v)
            if n < L + 2:
                rows.append((et, n, np.nan, np.nan, np.nan))
                continue
            dv = v - v.mean()
            lrv = (dv ** 2).mean()
            for k in range(1, L + 1):
                gk = (dv[k:] * dv[:-k]).sum() / n
                lrv += 2.0 * (1.0 - k / (L + 1.0)) * gk
            se_nw = np.sqrt(max(lrv, 0.0) / n)
            se_naive = np.sqrt((dv ** 2).sum() / (n - 1.0) / n)
            rows.append((et, n, np.round(v.mean(), 6) + 0.0,
                         np.round(1.96 * se_nw, 6) + 0.0,
                         np.round(1.96 * se_naive, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "mean_v", "hw_neweywest",
                                           "hw_naive"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["mean_v", "hw_neweywest", "hw_naive"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_NEWEY_WEST = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, count(*)::DOUBLE AS n
          FROM daily GROUP BY 1),
    r AS (
        SELECT d.event_type, d.v - m.mu AS dv, m.n, m.mu,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.d) AS rn
        FROM daily d JOIN m USING (event_type)
    ),
    g0 AS (SELECT event_type, sum(dv * dv) / any_value(n) AS g0,
                  sum(dv * dv) / (any_value(n) - 1) AS s2,
                  any_value(n) AS n, any_value(mu) AS mu
           FROM r GROUP BY 1),
    gk AS (
        SELECT a.event_type, k.k,
               sum(a.dv * b.dv) / any_value(a.n) AS gk
        FROM (SELECT unnest(range(1, 4)) AS k) k, r a
        JOIN r b ON a.event_type = b.event_type AND a.rn = b.rn + k.k
        GROUP BY 1, 2
    ),
    lrv AS (
        SELECT g0.event_type, g0.n, g0.mu, g0.s2,
               g0.g0 + 2 * sum((1 - gk.k / 4.0) * gk.gk) AS lrv
        FROM g0 JOIN gk USING (event_type)
        GROUP BY 1, 2, 3, 4, g0.g0
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN n >= 5
                         THEN round(mu, 6) + 0.0 END, {NULLF}) AS mean_v,
           COALESCE(CASE WHEN n >= 5
                         THEN round(1.96 * sqrt(greatest(lrv, 0) / n),
                                    6) + 0.0 END, {NULLF})
               AS hw_neweywest,
           COALESCE(CASE WHEN n >= 5
                         THEN round(1.96 * sqrt(s2 / n), 6) + 0.0 END,
                    {NULLF}) AS hw_naive
    FROM lrv ORDER BY 1
"""


def q_nelson_aalen_users(sf_dir: str) -> pd.DataFrame:
    """Nelson-Aalen cumulative hazard over the Kaplan-Meier lifetime
    table (same lifetimes/censoring as kaplan_meier_users):
    H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ — the additive companion whose exp(−H) bounds
    the KM curve. One calendar-bounded table to the driver."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    span = hash_aggregate(ev, ["user_id"],
                          {"first_ts": ("ts", "min"),
                           "last_ts": ("ts", "max")},
                          num_partitions=_NP)
    end = ev.map_batches(lambda b: pd.DataFrame({"m": [b["ts"].max()]}),
                         batch_format="pandas").to_pandas()["m"].max()
    cutoff = end - pd.Timedelta(days=7)

    def life(b: pd.DataFrame) -> pd.DataFrame:
        t = ((b["last_ts"].astype("datetime64[us]").astype("int64")
              - b["first_ts"].astype("datetime64[us]").astype("int64"))
             // DAY_US).astype(np.int64)
        return pd.DataFrame({
            "t": t,
            "death": (b["last_ts"] <= cutoff).astype(np.int64),
            "one": np.ones(len(b), dtype=np.int64)})

    tab = hash_aggregate(span.map_batches(life, batch_format="pandas"),
                         ["t"], {"d": ("death", "sum"),
                                 "c": ("one", "sum")},
                         num_partitions=4).to_pandas().sort_values("t")
    total = int(tab["c"].sum())
    at_risk = total - np.concatenate(
        [[0], np.cumsum(tab["c"].to_numpy())[:-1]])
    H = np.cumsum(tab["d"].to_numpy(np.float64) / at_risk)
    return pd.DataFrame({
        "t_days": tab["t"].astype(np.int64).to_numpy(),
        "n_at_risk": at_risk.astype(np.int64),
        "n_deaths": tab["d"].astype(np.int64).to_numpy(),
        "cum_hazard": np.round(H, 6) + 0.0,
    }).reset_index(drop=True)


SQL_NELSON_AALEN = """
    WITH u AS (
        SELECT user_id, min(ts) AS f, max(ts) AS l FROM events GROUP BY 1
    ),
    ce AS (SELECT max(ts) AS e FROM events),
    lt AS (
        SELECT (epoch_us(l) - epoch_us(f)) // 86400000000 AS t,
               CASE WHEN l <= (SELECT e - INTERVAL 7 DAY FROM ce)
                    THEN 1 ELSE 0 END AS death
        FROM u
    ),
    tab AS (SELECT t, sum(death) AS d, count(*) AS c FROM lt GROUP BY 1),
    r AS (
        SELECT t, d,
               (SELECT sum(c) FROM tab) -
               COALESCE(sum(c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_at_risk
        FROM tab
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_deaths,
           round(sum(d * 1.0 / n_at_risk)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 6) + 0.0
               AS cum_hazard
    FROM r ORDER BY t
"""


# ---------------------------------------------------------------------------
# fixed-effects trend / Juilland's D / dow eta-squared
# ---------------------------------------------------------------------------

def q_fixed_effects_trend_daily(sf_dir: str) -> pd.DataFrame:
    """Panel within-estimator: the POOLED time trend after absorbing
    series fixed effects — demean v and the day index within each series,
    then one OLS slope over the stacked residuals (the two-way panel
    primitive; cross-series level differences cannot contaminate the
    trend). Per-series demeaning stays co-located; one moment row
    crosses."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        sxx = sxy = n = 0.0
        for _, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            us = g["d"].astype("datetime64[us]").astype("int64").to_numpy()
            t = ((us - us.min()) // DAY_US).astype(np.float64)
            v = g["v"].to_numpy(np.float64)
            td, vd = t - t.mean(), v - v.mean()
            sxx += (td ** 2).sum()
            sxy += (td * vd).sum()
            n += len(v)
        return pd.DataFrame({"sxx": [sxx], "sxy": [sxy], "n": [n]})

    m = keyed_map_partitions(daily, ["event_type"], kernel,
                             num_partitions=_NP).to_pandas().sum()
    slope = m["sxy"] / m["sxx"]
    return pd.DataFrame({
        "n_obs": [np.int64(m["n"])],
        "within_slope": [np.round(slope, 6) + 0.0],
    })


SQL_FIXED_EFFECTS_TREND = f"""
    WITH daily AS ({_DAILY_SQL}),
    tt AS (
        SELECT event_type, v,
               CAST(datediff('day',
                    min(d) OVER (PARTITION BY event_type), d) AS DOUBLE)
                   AS t
        FROM daily
    ),
    dm AS (
        SELECT event_type,
               t - avg(t) OVER (PARTITION BY event_type) AS td,
               v - avg(v) OVER (PARTITION BY event_type) AS vd
        FROM tt
    )
    SELECT CAST(count(*) AS BIGINT) AS n_obs,
           round(sum(td * vd) / sum(td * td), 6) + 0.0 AS within_slope
    FROM dm
"""


def q_juilland_d_documents(sf_dir: str) -> pd.DataFrame:
    """Juilland's dispersion D = 1 − CV/√(k−1) of each corpus top-10
    token's RELATIVE frequency across the k sources (population CV) —
    1 = evenly spread, →0 = concentrated in few sources; the corpus-
    linguistics dispersion measure behind 'core vocabulary' lists."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[["source"]].copy()
        ex["tok"] = b["text"].str.split()
        ex = ex.explode("tok").dropna(subset=["tok"])
        vc = ex.groupby(["source", "tok"], sort=False).size()
        return vc.rename("cnt").reset_index() \
            .rename(columns={"tok": "token"})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["source", "token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP).materialize()
    corpus = hash_aggregate(tc, ["token"], {"n": ("c", "sum")},
                            num_partitions=_NP).to_pandas()
    top = list(corpus.sort_values(["n", "token"],
                                  ascending=[False, True]).head(10)
               ["token"])
    sub = tc.filter(lambda r: r["token"] in set(top)).to_pandas()
    totals = hash_aggregate(tc, ["source"], {"N": ("c", "sum")},
                            num_partitions=_NP).to_pandas() \
        .set_index("source")["N"].astype(float)
    k = len(totals)
    piv = sub.pivot_table(index="token", columns="source", values="c",
                          aggfunc="sum", fill_value=0.0)
    piv = piv.reindex(index=top, columns=totals.index, fill_value=0.0)
    F = piv.to_numpy(np.float64) / totals.to_numpy(np.float64)[None, :]
    mu = F.mean(axis=1)
    sd = F.std(axis=1, ddof=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        dj = 1.0 - (sd / mu) / np.sqrt(k - 1.0)
    nmap = dict(zip(corpus["token"], corpus["n"].astype(np.int64)))
    return pd.DataFrame({
        "token": top,
        "n_total": [nmap[t] for t in top],
        "juilland_d": np.where(np.isfinite(dj),
                               np.round(dj, 6) + 0.0, NULLF),
    }).sort_values("token").reset_index(drop=True)


SQL_JUILLAND_D = rf"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT source, token, count(*)::DOUBLE AS c
           FROM tok GROUP BY 1, 2),
    corpus AS (SELECT token, sum(c) AS n FROM tc GROUP BY 1),
    top AS (SELECT token, n AS ntot FROM corpus
            ORDER BY n DESC, token LIMIT 10),
    totals AS (SELECT source, sum(c) AS src_total FROM tc GROUP BY 1),
    grid AS (SELECT top.token, top.ntot, t.source, t.src_total
             FROM top CROSS JOIN totals t),
    f AS (
        SELECT g.token, g.ntot AS n, COALESCE(tc.c, 0) / g.src_total AS f
        FROM grid g LEFT JOIN tc
          ON tc.source = g.source AND tc.token = g.token
    ),
    k AS (SELECT count(*)::DOUBLE AS k FROM totals)
    SELECT f.token, CAST(any_value(f.n) AS BIGINT) AS n_total,
           COALESCE(CASE WHEN avg(f.f) > 0
                         THEN round(1 - (stddev_pop(f.f) / avg(f.f))
                                    / sqrt(any_value(k.k) - 1), 6) + 0.0
                    END, {NULLF}) AS juilland_d
    FROM f CROSS JOIN k
    GROUP BY f.token ORDER BY f.token
"""


def q_eta_squared_dow_daily(sf_dir: str) -> pd.DataFrame:
    """Effect size of day-of-week per series: η² = SS_between/SS_total
    from the one-way dow grouping — 'how much of the variance does the
    weekly cycle explain', the magnitude the ANOVA F obscures."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.copy()
            g["dow"] = g["d"].dt.dayofweek
            v = g["v"].to_numpy(np.float64)
            gm = v.mean()
            ss_tot = ((v - gm) ** 2).sum()
            means = g.groupby("dow")["v"].agg(["mean", "size"])
            ss_b = (means["size"].to_numpy(np.float64)
                    * (means["mean"].to_numpy(np.float64) - gm) ** 2).sum()
            eta2 = ss_b / ss_tot if ss_tot > 0 else np.nan
            rows.append((et, len(v),
                         np.round(eta2, 6) + 0.0 if np.isfinite(eta2)
                         else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "eta_squared"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["eta_squared"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_ETA_SQUARED_DOW = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (SELECT event_type, v, isodow(d) AS dow FROM daily),
    gm AS (SELECT event_type, avg(v) AS gm, count(*) AS n,
                  sum(v * v) - count(*) * avg(v) * avg(v) AS ss_tot
           FROM t GROUP BY 1),
    b AS (
        SELECT t.event_type,
               sum(cnt * (m - gm.gm) * (m - gm.gm)) AS ss_b
        FROM (SELECT event_type, dow, avg(v) AS m, count(*) AS cnt
              FROM t GROUP BY 1, 2) t
        JOIN gm USING (event_type)
        GROUP BY 1
    )
    SELECT gm.event_type, CAST(gm.n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN gm.ss_tot > 0
                         THEN round(b.ss_b / gm.ss_tot, 6) + 0.0 END,
                    {NULLF}) AS eta_squared
    FROM gm JOIN b USING (event_type)
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Blomqvist's beta / t-score collocations / daily mix divergence
# ---------------------------------------------------------------------------

def q_blomqvist_beta_daily(sf_dir: str) -> pd.DataFrame:
    """Blomqvist's quadrant dependence β between every series pair:
    concordance of signs around each series' (ROUNDED) median over common
    days, β = (concordant − discordant)/n with points ON a median counted
    neither — the 50%-breakdown dependence measure correlation can't
    match."""
    daily = _bucket_series(sf_dir, DAY_US, "d")
    wide = daily.to_pandas().pivot_table(index="d", columns="event_type",
                                         values="v", aggfunc="sum")
    ets = sorted(wide.columns)
    meds = {e: np.round(np.nanquantile(wide[e].to_numpy(np.float64), 0.5),
                        6) + 0.0 for e in ets}
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            m = wide[a].notna() & wide[b].notna()
            sa = np.sign(wide.loc[m, a].to_numpy(np.float64) - meds[a])
            sb = np.sign(wide.loc[m, b].to_numpy(np.float64) - meds[b])
            valid = (sa != 0) & (sb != 0)
            n = int(valid.sum())
            conc = int((sa[valid] == sb[valid]).sum())
            beta = (2.0 * conc - n) / n if n else np.nan
            rows.append((a, b, n,
                         np.round(beta, 6) + 0.0 if np.isfinite(beta)
                         else NULLF))
    return pd.DataFrame(rows, columns=["et_a", "et_b", "n_days", "beta"]) \
        .astype({"n_days": np.int64})


SQL_BLOMQVIST_BETA = f"""
    WITH daily AS ({_DAILY_SQL}),
    med AS (SELECT event_type,
                   round(quantile_cont(v, 0.5), 6) + 0.0 AS med
            FROM daily GROUP BY 1),
    s AS (
        SELECT d.event_type, d.d,
               CASE WHEN d.v > med.med THEN 1
                    WHEN d.v < med.med THEN -1 ELSE 0 END AS sg
        FROM daily d JOIN med USING (event_type)
    ),
    p AS (
        SELECT a.event_type AS et_a, b.event_type AS et_b,
               count(*) FILTER (WHERE a.sg <> 0 AND b.sg <> 0) AS n,
               count(*) FILTER (WHERE a.sg <> 0 AND a.sg = b.sg) AS conc
        FROM s a JOIN s b ON a.d = b.d AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT et_a, et_b, CAST(n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN n > 0
                         THEN round((2.0 * conc - n) / n, 6) + 0.0 END,
                    {NULLF}) AS beta
    FROM p ORDER BY 1, 2
"""


def q_tscore_bigrams_documents(sf_dir: str) -> pd.DataFrame:
    """Collocation extraction by t-score (Church & Hanks era alternative
    to PMI that doesn't over-reward rare pairs): t = (O − E)/√O with
    O = bigram count and E = c(w1)·c(w2)/N under independence; top 20 by
    (ROUNDED t desc, bigram asc)."""
    from forecastframe_ray.pipelines.tfidf import doc_bigram_freqs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bg = doc_bigram_freqs(docs).materialize()
    cb = hash_aggregate(bg, ["w1", "w2"], {"c": ("tf", "sum")},
                        num_partitions=_NP).to_pandas()
    c1 = cb.groupby("w1")["c"].sum()
    c2 = cb.groupby("w2")["c"].sum()
    N = float(cb["c"].sum())
    O = cb["c"].to_numpy(np.float64)
    E = (cb["w1"].map(c1).to_numpy(np.float64)
         * cb["w2"].map(c2).to_numpy(np.float64)) / N
    t = np.round((O - E) / np.sqrt(O), 6) + 0.0
    out = pd.DataFrame({"w1": cb["w1"], "w2": cb["w2"],
                        "n": cb["c"].astype(np.int64), "t_score": t})
    out = out.sort_values(["t_score", "w1", "w2"],
                          ascending=[False, True, True]).head(20)
    return out.reset_index(drop=True)


SQL_TSCORE_BIGRAMS = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    bg AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ),
    cb AS (SELECT w1, w2, count(*)::DOUBLE AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(c) AS n1 FROM cb GROUP BY 1),
    c2 AS (SELECT w2, sum(c) AS n2 FROM cb GROUP BY 1),
    tot AS (SELECT sum(c) AS N FROM cb)
    SELECT cb.w1, cb.w2, CAST(cb.c AS BIGINT) AS n,
           round((cb.c - c1.n1 * c2.n2 / tot.N) / sqrt(cb.c), 6) + 0.0
               AS t_score
    FROM cb JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tot
    ORDER BY t_score DESC, w1, w2 LIMIT 20
"""


def q_daily_mix_divergence(sf_dir: str) -> pd.DataFrame:
    """Composition-drift monitor: Jensen-Shannon divergence (nats)
    between each day's event-type mix and the GLOBAL mix — the alarm
    signal for 'today looks categorically different', robust to volume.
    Count shares (not value shares) so zero-heavy days stay defined."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame({
            "d": pd.to_datetime((us // DAY_US) * DAY_US, unit="us"),
            "event_type": b["event_type"], "one": 1})

    ct = hash_aggregate(ev.map_batches(day_fn, batch_format="pandas"),
                        ["d", "event_type"], {"n": ("one", "sum")},
                        num_partitions=_NP).to_pandas()
    glob = ct.groupby("event_type")["n"].sum()
    q = (glob / glob.sum()).to_dict()
    rows = []
    for d, g in ct.groupby("d"):
        tot = float(g["n"].sum())
        p = dict(zip(g["event_type"], g["n"] / tot))
        js = 0.0
        for et in set(q) | set(p):
            pi, qi = p.get(et, 0.0), q.get(et, 0.0)
            mi = (pi + qi) / 2.0
            if pi > 0:
                js += 0.5 * pi * np.log(pi / mi)
            if qi > 0:
                js += 0.5 * qi * np.log(qi / mi)
        rows.append((d, int(tot), np.round(js, 6) + 0.0))
    return pd.DataFrame(rows, columns=["d", "n_events", "js_nats"]) \
        .astype({"n_events": np.int64}) \
        .sort_values("d").reset_index(drop=True)


SQL_DAILY_MIX_DIVERGENCE = """
    WITH ct AS (
        SELECT date_trunc('day', ts) AS d, event_type,
               count(*)::DOUBLE AS n
        FROM events GROUP BY 1, 2
    ),
    gmix AS (SELECT event_type, sum(n) AS gn FROM ct GROUP BY 1),
    gt AS (SELECT sum(gn) AS G FROM gmix),
    dt AS (SELECT d, sum(n) AS T FROM ct GROUP BY 1),
    grid AS (
        SELECT dt.d, dt.T, gmix.event_type, gmix.gn, gt.G
        FROM dt CROSS JOIN gmix CROSS JOIN gt
    ),
    terms AS (
        SELECT g.d, g.T,
               COALESCE(ct.n, 0) / g.T AS p,
               g.gn / g.G AS q
        FROM grid g LEFT JOIN ct ON ct.d = g.d
                                AND ct.event_type = g.event_type
    )
    SELECT d, CAST(any_value(T) AS BIGINT) AS n_events,
           round(sum(CASE WHEN p > 0
                          THEN 0.5 * p * ln(p / ((p + q) / 2))
                          ELSE 0 END
                     + CASE WHEN q > 0
                            THEN 0.5 * q * ln(q / ((p + q) / 2))
                            ELSE 0 END), 6) + 0.0 AS js_nats
    FROM terms GROUP BY d ORDER BY d
"""


# ---------------------------------------------------------------------------
# ITS level shift / first-touch conversion / peak concentration
# ---------------------------------------------------------------------------

def q_its_level_shift_daily(sf_dir: str) -> pd.DataFrame:
    """Interrupted-time-series fit with a KNOWN intervention at day 15:
    exact OLS of v on [1, t, post] (post = 1[t ≥ 15]) via Cramer's rule —
    the causal-inference primitive that separates a LEVEL jump from the
    ongoing trend (the slope-change sibling is piecewise_trend_daily)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")
    KNOT = 15.0

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            us = g["d"].astype("datetime64[us]").astype("int64").to_numpy()
            t = ((us - us.min()) // DAY_US).astype(np.float64)
            p = (t >= KNOT).astype(np.float64)
            y = g["v"].to_numpy(np.float64)
            X = np.stack([np.ones_like(t), t, p], axis=1)
            A = X.T @ X
            bvec = X.T @ y
            det = np.linalg.det(A)
            if abs(det) < 1e-9:
                rows.append((et, len(y), np.nan, np.nan, np.nan))
                continue
            coef = []
            for c in range(3):
                M = A.copy()
                M[:, c] = bvec
                coef.append(np.linalg.det(M) / det)
            rows.append((et, len(y), np.round(coef[0], 6) + 0.0,
                         np.round(coef[1], 6) + 0.0,
                         np.round(coef[2], 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "intercept", "slope",
                                           "level_shift"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["intercept", "slope", "level_shift"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_ITS_LEVEL_SHIFT = f"""
    WITH daily AS ({_DAILY_SQL}),
    tt AS (
        SELECT event_type, v,
               CAST(datediff('day',
                    min(d) OVER (PARTITION BY event_type), d) AS DOUBLE)
                   AS t
        FROM daily
    ),
    x AS (SELECT event_type, v, t,
                 CASE WHEN t >= 15 THEN 1.0 ELSE 0.0 END AS h
          FROM tt),
    m AS (
        SELECT event_type, count(*)::DOUBLE AS n, sum(t) AS st,
               sum(h) AS sh, sum(t*t) AS stt, sum(t*h) AS sth,
               sum(h*h) AS shh, sum(v) AS sy, sum(v*t) AS syt,
               sum(v*h) AS syh
        FROM x GROUP BY 1
    ),
    dets AS (
        SELECT event_type, n,
               n*(stt*shh - sth*sth) - st*(st*shh - sth*sh)
                   + sh*(st*sth - stt*sh) AS det,
               sy*(stt*shh - sth*sth) - st*(syt*shh - sth*syh)
                   + sh*(syt*sth - stt*syh) AS det_a,
               n*(syt*shh - syh*sth) - sy*(st*shh - sth*sh)
                   + sh*(st*syh - syt*sh) AS det_b,
               n*(stt*syh - sth*syt) - st*(st*syh - syt*sh)
                   + sy*(st*sth - stt*sh) AS det_c
        FROM m
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN abs(det) >= 1e-9
                         THEN round(det_a / det, 6) + 0.0 END, {NULLF})
               AS intercept,
           COALESCE(CASE WHEN abs(det) >= 1e-9
                         THEN round(det_b / det, 6) + 0.0 END, {NULLF})
               AS slope,
           COALESCE(CASE WHEN abs(det) >= 1e-9
                         THEN round(det_c / det, 6) + 0.0 END, {NULLF})
               AS level_shift
    FROM dets ORDER BY 1
"""


def q_first_touch_conversion(sf_dir: str) -> pd.DataFrame:
    """First-touch conversion: users cohort by their FIRST event's type
    (ties at the first timestamp broken by lowest event_id) and each
    cohort reports its eventual purchase rate — the acquisition-channel
    read that last-touch attribution inverts."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in part.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"])
            first = g.iloc[0]["event_type"]
            purchased = int((g["event_type"] == "purchase").any())
            rows.append((first, 1, purchased))
        return pd.DataFrame(rows, columns=["first_type", "one",
                                           "purchased"])

    agg = hash_aggregate(
        keyed_map_partitions(ev, ["user_id"], kernel,
                             num_partitions=_NP),
        ["first_type"], {"n_users": ("one", "sum"),
                         "n_purchasers": ("purchased", "sum")},
        num_partitions=4).to_pandas()
    agg["conversion"] = np.round(
        agg["n_purchasers"].to_numpy(np.float64)
        / agg["n_users"].to_numpy(np.float64), 6) + 0.0
    agg[["n_users", "n_purchasers"]] = \
        agg[["n_users", "n_purchasers"]].astype(np.int64)
    return agg.sort_values("first_type").reset_index(drop=True)


SQL_FIRST_TOUCH_CONVERSION = """
    WITH f AS (
        SELECT user_id, event_type AS first_type
        FROM (SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
    ),
    p AS (SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS purchased
          FROM events GROUP BY 1)
    SELECT f.first_type, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(p.purchased) AS BIGINT) AS n_purchasers,
           round(sum(p.purchased) * 1.0 / count(*), 6) + 0.0
               AS conversion
    FROM f JOIN p USING (user_id)
    GROUP BY 1 ORDER BY 1
"""


def q_peak_concentration_events(sf_dir: str) -> pd.DataFrame:
    """Load concentration: share of ALL events landing in the top-k
    busiest (weekday, hour) cells for k ∈ {5, 10, 20} of the 168 —
    'how peaky is the week', the capacity-planning scalar behind the
    heatmap. Cells rank by (count desc, dow, hour)."""
    ev = _read(sf_dir, "events", ["ts"])

    def cell(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        day = us // DAY_US
        return pd.DataFrame({
            "dow": ((day + 3) % 7).astype(np.int64),  # 1970-01-01 = Thu
            "hour": ((us % DAY_US) // HOUR_US).astype(np.int64),
            "one": 1})

    ct = hash_aggregate(ev.map_batches(cell, batch_format="pandas"),
                        ["dow", "hour"], {"n": ("one", "sum")},
                        num_partitions=_NP).to_pandas()
    ct = ct.sort_values(["n", "dow", "hour"],
                        ascending=[False, True, True])
    total = float(ct["n"].sum())
    cum = np.cumsum(ct["n"].to_numpy(np.float64))
    rows = []
    for k in (5, 10, 20):
        kk = min(k, len(ct))
        rows.append((k, np.round(cum[kk - 1] / total, 6) + 0.0))
    return pd.DataFrame(rows, columns=["k_cells", "share"]) \
        .astype({"k_cells": np.int64})


SQL_PEAK_CONCENTRATION = f"""
    WITH ct AS (
        SELECT (epoch_us(ts) // {DAY_US} + 3) % 7 AS dow,
               (epoch_us(ts) % {DAY_US}) // {HOUR_US} AS hour,
               count(*)::DOUBLE AS n
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT n,
               ROW_NUMBER() OVER (ORDER BY n DESC, dow, hour) AS rk,
               sum(n) OVER (ORDER BY n DESC, dow, hour
                            ROWS UNBOUNDED PRECEDING) AS cum,
               (SELECT sum(n) FROM ct) AS total,
               (SELECT count(*) FROM ct) AS ncells
        FROM ct
    ),
    ks AS (SELECT unnest([5, 10, 20]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k_cells,
           round(r.cum / r.total, 6) + 0.0 AS share
    FROM ks JOIN r ON r.rk = least(ks.k, r.ncells)
    ORDER BY ks.k
"""


# ---------------------------------------------------------------------------
# Wilson interval / weekly coherence / holiday lift
# ---------------------------------------------------------------------------

def q_wilson_interval_daily(sf_dir: str) -> pd.DataFrame:
    """Wilson score interval (1927) for each day's purchase share —
    the binomial CI that behaves at small n and extreme p where the Wald
    interval collapses: center (p̂ + z²/2n)/(1 + z²/n), half-width
    z√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n), z = 1.96."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def day_fn(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame({
            "d": pd.to_datetime((us // DAY_US) * DAY_US, unit="us"),
            "n": 1,
            "x": (b["event_type"] == "purchase").astype(np.int64)})

    agg = hash_aggregate(ev.map_batches(day_fn, batch_format="pandas"),
                         ["d"], {"n": ("n", "sum"), "x": ("x", "sum")},
                         num_partitions=_NP).to_pandas().sort_values("d")
    n = agg["n"].to_numpy(np.float64)
    p = agg["x"].to_numpy(np.float64) / n
    Z = 1.96
    denom = 1.0 + Z * Z / n
    center = (p + Z * Z / (2 * n)) / denom
    hw = Z * np.sqrt(p * (1 - p) / n + Z * Z / (4 * n * n)) / denom
    return pd.DataFrame({
        "d": agg["d"], "n_events": agg["n"].astype(np.int64),
        "share": np.round(p, 6) + 0.0,
        "wilson_lo": np.round(center - hw, 6) + 0.0,
        "wilson_hi": np.round(center + hw, 6) + 0.0,
    }).reset_index(drop=True)


SQL_WILSON_INTERVAL = """
    WITH d AS (
        SELECT date_trunc('day', ts) AS d, count(*)::DOUBLE AS n,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END)::DOUBLE AS x
        FROM events GROUP BY 1
    )
    SELECT d, CAST(n AS BIGINT) AS n_events,
           round(x / n, 6) + 0.0 AS share,
           round(((x / n + 1.9208 / n)
                  - 1.96 * sqrt((x / n) * (1 - x / n) / n
                                + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) + 0.0 AS wilson_lo,
           round(((x / n + 1.9208 / n)
                  + 1.96 * sqrt((x / n) * (1 - x / n) / n
                                + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) + 0.0 AS wilson_hi
    FROM d ORDER BY d
"""


def q_weekly_coherence_pairs(sf_dir: str) -> pd.DataFrame:
    """Single-frequency cross-spectral coherence at the weekly period
    between every series pair: with complex projections
    Zₓ = Σx·e^{−iωt}, ω = 2π/7, coherence = |Zₓ·Z̄ᵧ|²/(|Zₓ|²|Zᵧ|²) ≡ 1
    for a single frequency — so the INFORMATIVE part is the PHASE LAG
    arg(Zₓ·Z̄ᵧ)·7/2π in days, plus each side's weekly power. Aligned on
    common days, demeaned."""
    daily = _bucket_series(sf_dir, DAY_US, "d")
    wide = daily.to_pandas().pivot_table(index="d", columns="event_type",
                                         values="v", aggfunc="sum")
    ets = sorted(wide.columns)
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            m = wide[a].notna() & wide[b].notna()
            x = wide.loc[m, a].to_numpy(np.float64)
            y = wide.loc[m, b].to_numpy(np.float64)
            n = len(x)
            t = np.arange(n, dtype=np.float64)
            w = 2.0 * np.pi / 7.0
            cx, sx = ((x - x.mean()) * np.cos(w * t)).sum(), \
                ((x - x.mean()) * np.sin(w * t)).sum()
            cy, sy = ((y - y.mean()) * np.cos(w * t)).sum(), \
                ((y - y.mean()) * np.sin(w * t)).sum()
            px = (cx * cx + sx * sx) / n
            py = (cy * cy + sy * sy) / n
            # Zx * conj(Zy) = (cx - i sx)(cy + i sy)
            re = cx * cy + sx * sy
            im = cx * sy - sx * cy
            lag = (np.arctan2(im, re) % (2.0 * np.pi)) * 7.0 \
                / (2.0 * np.pi)
            rows.append((a, b, n, np.round(px, 6) + 0.0,
                         np.round(py, 6) + 0.0,
                         np.round(lag, 6) + 0.0))
    return pd.DataFrame(rows, columns=["et_a", "et_b", "n_days",
                                       "weekly_power_a", "weekly_power_b",
                                       "phase_lag_days"]) \
        .astype({"n_days": np.int64})


SQL_WEEKLY_COHERENCE = f"""
    WITH daily AS ({_DAILY_SQL}),
    j AS (
        SELECT a.event_type AS et_a, b.event_type AS et_b,
               a.d, a.v AS x, b.v AS y
        FROM daily a JOIN daily b
          ON a.d = b.d AND a.event_type < b.event_type
    ),
    r AS (
        SELECT et_a, et_b, x, y,
               avg(x) OVER w AS mx, avg(y) OVER w AS my,
               (ROW_NUMBER() OVER (PARTITION BY et_a, et_b ORDER BY d)
                - 1.0) AS t,
               count(*) OVER w AS n
        FROM j WINDOW w AS (PARTITION BY et_a, et_b)
    ),
    p AS (
        SELECT et_a, et_b, any_value(n) AS n,
               sum((x - mx) * cos(2 * pi() * t / 7)) AS cx,
               sum((x - mx) * sin(2 * pi() * t / 7)) AS sx,
               sum((y - my) * cos(2 * pi() * t / 7)) AS cy,
               sum((y - my) * sin(2 * pi() * t / 7)) AS sy
        FROM r GROUP BY 1, 2
    )
    SELECT et_a, et_b, CAST(n AS BIGINT) AS n_days,
           round((cx * cx + sx * sx) / n, 6) + 0.0 AS weekly_power_a,
           round((cy * cy + sy * sy) / n, 6) + 0.0 AS weekly_power_b,
           round(fmod(atan2(cx * sy - sx * cy, cx * cy + sx * sy)
                      + 2 * pi(), 2 * pi()) * 7 / (2 * pi()), 6) + 0.0
               AS phase_lag_days
    FROM p ORDER BY 1, 2
"""


def q_holiday_lift_daily(sf_dir: str) -> pd.DataFrame:
    """Holiday lift per series: mean value on the fixed-list holiday days
    (±1-day halo) vs the non-halo baseline, as a ratio — the calendar-
    effect magnitude the holiday-distance features exist to feed."""
    daily = _bucket_series(sf_dir, DAY_US, "d")
    hol = np.array([pd.Timestamp(h).value // 1000 for h in _HOLIDAYS],
                   dtype=np.int64)
    halo = set()
    for h in hol:
        for k in (-1, 0, 1):
            halo.add(h + k * DAY_US)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        us = b["d"].astype("datetime64[us]").astype("int64").to_numpy()
        in_halo = np.isin(us, list(halo))
        b = b.copy()
        b["hn"] = in_halo.astype(np.int64)
        b["hv"] = np.where(in_halo, b["v"].to_numpy(np.float64), 0.0)
        b["bn"] = (~in_halo).astype(np.int64)
        b["bv"] = np.where(~in_halo, b["v"].to_numpy(np.float64), 0.0)
        return b[["event_type", "hn", "hv", "bn", "bv"]]

    agg = hash_aggregate(daily.map_batches(tag, batch_format="pandas"),
                         ["event_type"],
                         {"hn": ("hn", "sum"), "hv": ("hv", "sum"),
                          "bn": ("bn", "sum"), "bv": ("bv", "sum")},
                         num_partitions=_NP).to_pandas()
    hn = agg["hn"].to_numpy(np.float64)
    bn = agg["bn"].to_numpy(np.float64)
    hm = np.where(hn > 0, agg["hv"].to_numpy(np.float64) / hn, np.nan)
    bm = np.where(bn > 0, agg["bv"].to_numpy(np.float64) / bn, np.nan)
    with np.errstate(invalid="ignore", divide="ignore"):
        lift = hm / bm
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n_holiday_days": agg["hn"].astype(np.int64),
        "mean_holiday": np.where(np.isnan(hm), NULLF,
                                 np.round(hm, 6) + 0.0),
        "mean_baseline": np.where(np.isnan(bm), NULLF,
                                  np.round(bm, 6) + 0.0),
        "lift": np.where(np.isfinite(lift), np.round(lift, 6) + 0.0,
                         NULLF),
    }).sort_values("event_type").reset_index(drop=True)


SQL_HOLIDAY_LIFT = f"""
    WITH daily AS ({_DAILY_SQL}),
    hol AS (SELECT * FROM (VALUES {_HOLIDAY_VALUES}) AS t(h)),
    halo AS (
        SELECT DISTINCT h + to_days(k) AS hd
        FROM hol, (SELECT unnest([-1, 0, 1]) AS k)
    ),
    t AS (
        SELECT d.event_type, d.v,
               CAST(d.d AS DATE) IN (SELECT hd FROM halo) AS in_halo
        FROM daily d
    ),
    a AS (
        SELECT event_type,
               count(*) FILTER (in_halo) AS hn,
               avg(v) FILTER (in_halo) AS hm,
               count(*) FILTER (NOT in_halo) AS bn,
               avg(v) FILTER (NOT in_halo) AS bm
        FROM t GROUP BY 1
    )
    SELECT event_type, CAST(hn AS BIGINT) AS n_holiday_days,
           COALESCE(round(hm, 6) + 0.0, {NULLF}) AS mean_holiday,
           COALESCE(round(bm, 6) + 0.0, {NULLF}) AS mean_baseline,
           COALESCE(CASE WHEN hn > 0 AND bn > 0 AND bm <> 0
                         THEN round(hm / bm, 6) + 0.0 END, {NULLF})
               AS lift
    FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# weekly ICC / share trend / Friedman dow test
# ---------------------------------------------------------------------------

def q_icc_weekly_daily(sf_dir: str) -> pd.DataFrame:
    """Intraclass correlation ICC(1) of daily values grouped by ISO week
    per series: (MSB − MSW)/(MSB + (k̄−1)·MSW) with the unbalanced-design
    k̄ = (N − Σnⱼ²/N)/(J−1) — 'do days within a week resemble each
    other', the clustering diagnostic before any within-week pooling."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.copy()
            iso = g["d"].dt.isocalendar()
            g["wk"] = (iso["year"].astype(str) + "-"
                       + iso["week"].astype(str))
            v = g["v"].to_numpy(np.float64)
            N = len(v)
            J = g["wk"].nunique()
            if J < 2 or N <= J:
                rows.append((et, N, J, np.nan))
                continue
            gm = v.mean()
            grp = g.groupby("wk")["v"]
            nj = grp.size().to_numpy(np.float64)
            mj = grp.mean().to_numpy(np.float64)
            ssb = (nj * (mj - gm) ** 2).sum()
            ssw = ((v - g.groupby("wk")["v"].transform("mean")
                    .to_numpy(np.float64)) ** 2).sum()
            msb = ssb / (J - 1)
            msw = ssw / (N - J)
            kbar = (N - (nj ** 2).sum() / N) / (J - 1)
            icc = (msb - msw) / (msb + (kbar - 1) * msw)
            rows.append((et, N, J, np.round(icc, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "n_weeks", "icc1"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["n_days", "n_weeks"]] = out[["n_days", "n_weeks"]] \
        .astype(np.int64)
    out = _fill(out, ["icc1"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_ICC_WEEKLY = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (SELECT event_type, v,
                 CAST(isoyear(d) AS VARCHAR) || '-' ||
                 CAST(week(d) AS VARCHAR) AS wk
          FROM daily),
    gm AS (SELECT event_type, avg(v) AS gm, count(*)::DOUBLE AS N
           FROM t GROUP BY 1),
    wg AS (SELECT event_type, wk, count(*)::DOUBLE AS nj, avg(v) AS mj
           FROM t GROUP BY 1, 2),
    ssb AS (
        SELECT wg.event_type, count(*)::DOUBLE AS J,
               sum(wg.nj * (wg.mj - gm.gm) * (wg.mj - gm.gm)) AS ssb,
               sum(wg.nj * wg.nj) AS sn2
        FROM wg JOIN gm USING (event_type) GROUP BY 1
    ),
    ssw AS (
        SELECT t.event_type,
               sum((t.v - wg.mj) * (t.v - wg.mj)) AS ssw
        FROM t JOIN wg ON wg.event_type = t.event_type AND wg.wk = t.wk
        GROUP BY 1
    )
    SELECT gm.event_type, CAST(gm.N AS BIGINT) AS n_days,
           CAST(ssb.J AS BIGINT) AS n_weeks,
           COALESCE(CASE WHEN ssb.J >= 2 AND gm.N > ssb.J
                         THEN round(
                (ssb.ssb / (ssb.J - 1) - ssw.ssw / (gm.N - ssb.J))
                / (ssb.ssb / (ssb.J - 1)
                   + ((gm.N - ssb.sn2 / gm.N) / (ssb.J - 1) - 1)
                     * ssw.ssw / (gm.N - ssb.J)), 6) + 0.0 END, {NULLF})
               AS icc1
    FROM gm JOIN ssb USING (event_type) JOIN ssw USING (event_type)
    ORDER BY 1
"""


def q_share_trend_daily(sf_dir: str) -> pd.DataFrame:
    """Composition drift direction: OLS slope of each type's DAILY SHARE
    of the total on the day index — which categories are structurally
    gaining mix (shares are scale-free, so this sees drift that raw-value
    trends confound with volume)."""
    daily = _bucket_series(sf_dir, DAY_US, "d").materialize()
    tot = hash_aggregate(daily, ["d"], {"T": ("v", "sum")},
                         num_partitions=4).to_pandas()
    tmap = dict(zip(tot["d"], tot["T"]))

    def share(b: pd.DataFrame) -> pd.DataFrame:
        t = b["d"].map(tmap).to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            sh = np.where(t > 0, b["v"].to_numpy(np.float64) / t, np.nan)
        return pd.DataFrame({"event_type": b["event_type"], "d": b["d"],
                             "share": sh})

    df = daily.map_batches(share, batch_format="pandas").to_pandas()
    df = df[df["share"].notna()]
    rows = []
    for et, g in df.groupby("event_type"):
        g = g.sort_values("d")
        us = g["d"].astype("datetime64[us]").astype("int64").to_numpy()
        t = ((us - us.min()) // DAY_US).astype(np.float64)
        y = g["share"].to_numpy(np.float64)
        td = t - t.mean()
        slope = (td * (y - y.mean())).sum() / (td ** 2).sum()
        rows.append((et, len(g), np.round(y.mean(), 6) + 0.0,
                     np.round(slope, 6) + 0.0))
    return pd.DataFrame(rows, columns=["event_type", "n_days",
                                       "mean_share", "share_slope"]) \
        .astype({"n_days": np.int64}) \
        .sort_values("event_type").reset_index(drop=True)


SQL_SHARE_TREND = f"""
    WITH daily AS ({_DAILY_SQL}),
    tot AS (SELECT d, sum(v) AS T FROM daily GROUP BY 1),
    sh AS (
        SELECT daily.event_type, daily.d, daily.v / tot.T AS share
        FROM daily JOIN tot USING (d)
        WHERE tot.T > 0
    ),
    tt AS (
        SELECT event_type, share,
               CAST(datediff('day',
                    min(d) OVER (PARTITION BY event_type), d) AS DOUBLE)
                   AS t
        FROM sh
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(avg(share), 6) + 0.0 AS mean_share,
           round(regr_slope(share, t), 6) + 0.0 AS share_slope
    FROM tt GROUP BY 1 ORDER BY 1
"""


def q_friedman_dow_daily(sf_dir: str) -> pd.DataFrame:
    """Friedman test per series over complete ISO weeks (blocks) × the 7
    weekdays (treatments): within-week ranks of the daily values (ties
    impossible a.s. on ROUNDED distinct values — equal values take
    average ranks), Q = 12/(nk(k+1))·ΣRⱼ² − 3n(k+1) — the nonparametric
    'does weekday matter' test robust to weekly level shifts."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.copy()
            iso = g["d"].dt.isocalendar()
            g["wk"] = (iso["year"].astype(str) + "-"
                       + iso["week"].astype(str).str.zfill(2))
            g["dow"] = g["d"].dt.dayofweek
            full = g.groupby("wk")["dow"].nunique()
            weeks = full[full == 7].index
            g = g[g["wk"].isin(weeks)]
            n = len(weeks)
            if n < 1:
                rows.append((et, 0, np.nan))
                continue
            g["rank"] = g.groupby("wk")["v"].rank(method="average")
            R = g.groupby("dow")["rank"].sum().to_numpy(np.float64)
            k = 7.0
            Q = 12.0 / (n * k * (k + 1.0)) * (R ** 2).sum() \
                - 3.0 * n * (k + 1.0)
            rows.append((et, n, np.round(Q, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_weeks",
                                           "friedman_q"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_weeks"] = out["n_weeks"].astype(np.int64)
    out = _fill(out, ["friedman_q"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_FRIEDMAN_DOW = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (SELECT event_type, v, isodow(d) - 1 AS dow,
                 CAST(isoyear(d) AS VARCHAR) || '-' ||
                 lpad(CAST(week(d) AS VARCHAR), 2, '0') AS wk
          FROM daily),
    full_wk AS (
        SELECT event_type, wk FROM t
        GROUP BY 1, 2 HAVING count(DISTINCT dow) = 7
    ),
    f AS (SELECT t.* FROM t JOIN full_wk USING (event_type, wk)),
    rk AS (
        SELECT event_type, wk, dow,
               rank() OVER (PARTITION BY event_type, wk ORDER BY v)
               + (count(*) OVER (PARTITION BY event_type, wk, v) - 1)
                 / 2.0 AS r
        FROM f
    ),
    rs AS (SELECT event_type, dow, sum(r) AS R FROM rk GROUP BY 1, 2),
    nn AS (SELECT event_type, count(*)::DOUBLE AS n
           FROM full_wk GROUP BY 1),
    q AS (
        SELECT rs.event_type, any_value(nn.n) AS n,
               12.0 / (any_value(nn.n) * 7 * 8) * sum(rs.R * rs.R)
               - 3.0 * any_value(nn.n) * 8 AS Q
        FROM rs JOIN nn USING (event_type) GROUP BY 1
    ),
    base AS (SELECT DISTINCT event_type FROM daily)
    SELECT base.event_type,
           CAST(COALESCE(q.n, 0) AS BIGINT) AS n_weeks,
           COALESCE(round(q.Q, 6) + 0.0, {NULLF}) AS friedman_q
    FROM base LEFT JOIN q USING (event_type)
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Cochran's Q / Zipf abbreviation law / repeat tendency
# ---------------------------------------------------------------------------

def q_cochran_q_users(sf_dir: str) -> pd.DataFrame:
    """Cochran's Q over users × the event span's first four ISO-ordered
    7-day windows (binary 'active that week'): Q = (k−1)(k·ΣCⱼ² − N²) /
    (k·N − ΣRᵢ²) — the repeated-measures test for 'is activity propensity
    stable across weeks'. Users active in zero or all windows contribute
    nothing (standard)."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    bounds = ev.map_batches(
        lambda b: pd.DataFrame({"lo": [b["ts"].astype("int64").min()]}),
        batch_format="pandas").to_pandas()
    start = int(bounds["lo"].min())
    WK = 7 * DAY_US

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64").to_numpy()
        w = (us - start) // WK
        out = {"user_id": b["user_id"]}
        for j in range(4):
            out[f"w{j}"] = (w == j).astype(np.int64)
        return pd.DataFrame(out)

    per_user = hash_aggregate(
        ev.map_batches(flags, batch_format="pandas"), ["user_id"],
        {f"w{j}": (f"w{j}", "max") for j in range(4)},
        num_partitions=_NP).to_pandas()
    X = per_user[[f"w{j}" for j in range(4)]].to_numpy(np.float64)
    R = X.sum(axis=1)
    keep = (R > 0) & (R < 4)
    Xk = X[keep]
    k = 4.0
    C = Xk.sum(axis=0)
    Rk = Xk.sum(axis=1)
    N = Xk.sum()
    den = k * N - (Rk ** 2).sum()
    Q = (k - 1) * (k * (C ** 2).sum() - N * N) / den if den > 0 else np.nan
    return pd.DataFrame({
        "n_users_informative": [np.int64(keep.sum())],
        "cochran_q": [np.round(Q, 6) + 0.0 if np.isfinite(Q) else NULLF],
    })


SQL_COCHRAN_Q = f"""
    WITH start AS (SELECT min(epoch_us(ts)) AS s FROM events),
    u AS (
        SELECT user_id,
               max(CASE WHEN (epoch_us(ts) - start.s)
                        // {7 * DAY_US} = 0 THEN 1 ELSE 0 END) AS w0,
               max(CASE WHEN (epoch_us(ts) - start.s)
                        // {7 * DAY_US} = 1 THEN 1 ELSE 0 END) AS w1,
               max(CASE WHEN (epoch_us(ts) - start.s)
                        // {7 * DAY_US} = 2 THEN 1 ELSE 0 END) AS w2,
               max(CASE WHEN (epoch_us(ts) - start.s)
                        // {7 * DAY_US} = 3 THEN 1 ELSE 0 END) AS w3
        FROM events CROSS JOIN start GROUP BY 1
    ),
    keep AS (
        SELECT * FROM u
        WHERE w0 + w1 + w2 + w3 BETWEEN 1 AND 3
    ),
    agg AS (
        SELECT count(*)::DOUBLE AS nk,
               sum(w0)::DOUBLE AS c0, sum(w1)::DOUBLE AS c1,
               sum(w2)::DOUBLE AS c2, sum(w3)::DOUBLE AS c3,
               sum(w0 + w1 + w2 + w3)::DOUBLE AS N,
               sum((w0 + w1 + w2 + w3) * (w0 + w1 + w2 + w3))::DOUBLE
                   AS sr2
        FROM keep
    )
    SELECT CAST(nk AS BIGINT) AS n_users_informative,
           COALESCE(CASE WHEN 4 * N - sr2 > 0
                         THEN round(3 * (4 * (c0*c0 + c1*c1 + c2*c2
                                              + c3*c3) - N * N)
                                    / (4 * N - sr2), 6) + 0.0 END,
                    {NULLF}) AS cochran_q
    FROM agg
"""


def q_zipf_abbreviation_documents(sf_dir: str) -> pd.DataFrame:
    """Zipf's law of abbreviation check: Pearson correlation between
    ln(frequency) and character length over the corpus vocabulary —
    natural language goes negative (frequent words are short); a flat or
    positive value flags synthetic/templated text. Plus the
    frequency-weighted vs unweighted mean lengths."""
    docs = _read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["text"].str.split().explode().dropna().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "cnt": vc.to_numpy(np.int64)})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP).to_pandas()
    ln_f = np.log(tc["c"].to_numpy(np.float64))
    L = tc["token"].str.len().to_numpy(np.float64)
    x, y = ln_f - ln_f.mean(), L - L.mean()
    den = np.sqrt((x ** 2).sum() * (y ** 2).sum())
    r = (x * y).sum() / den if den > 0 else np.nan
    wmean = (L * tc["c"].to_numpy(np.float64)).sum() \
        / tc["c"].sum()
    return pd.DataFrame({
        "n_types": [np.int64(len(tc))],
        "corr_lnfreq_len": [np.round(r, 6) + 0.0 if np.isfinite(r)
                            else NULLF],
        "mean_len_types": [np.round(L.mean(), 6) + 0.0],
        "mean_len_tokens": [np.round(wmean, 6) + 0.0],
    })


SQL_ZIPF_ABBREVIATION = rf"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT token, count(*)::DOUBLE AS c FROM tok GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           COALESCE(round(corr(ln(c), len(token)::DOUBLE), 6) + 0.0,
                    {NULLF}) AS corr_lnfreq_len,
           round(avg(len(token)::DOUBLE), 6) + 0.0 AS mean_len_types,
           round(sum(len(token) * c) / sum(c), 6) + 0.0
               AS mean_len_tokens
    FROM tc
"""


def q_repeat_tendency_events(sf_dir: str) -> pd.DataFrame:
    """Repeat tendency of user streams: observed share of transitions
    that STAY on the same event type vs the independence expectation
    Σp(s)² (source-marginal squared mass) — ratio > 1 means behavior is
    sticky, the single-number read on the transition diagonal."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("user_id", sort=False):
            t = g.sort_values(["ts", "event_id"])["event_type"].to_numpy()
            if len(t) < 2:
                continue
            outs.append(pd.DataFrame({"cur": t[:-1], "nxt": t[1:]}))
        if not outs:
            return pd.DataFrame({"cur": pd.Series([], dtype="object"),
                                 "nxt": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.concat(outs, ignore_index=True)
        return df.groupby(["cur", "nxt"], sort=False).size() \
            .rename("n").reset_index()

    trans = hash_aggregate(
        keyed_map_partitions(ev, ["user_id"], pairs, num_partitions=_NP),
        ["cur", "nxt"], {"n": ("n", "sum")}, num_partitions=4).to_pandas()
    N = float(trans["n"].sum())
    diag = float(trans.loc[trans["cur"] == trans["nxt"], "n"].sum())
    ps = trans.groupby("cur")["n"].sum() / N
    expect = float((ps ** 2).sum())
    obs = diag / N
    return pd.DataFrame({
        "n_transitions": [np.int64(N)],
        "repeat_share": [np.round(obs, 6) + 0.0],
        "independence_share": [np.round(expect, 6) + 0.0],
        "stickiness_ratio": [np.round(obs / expect, 6) + 0.0],
    })


SQL_REPEAT_TENDENCY = """
    WITH s AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    t AS (SELECT cur, nxt FROM s WHERE nxt IS NOT NULL),
    tot AS (SELECT count(*)::DOUBLE AS N,
                   sum(CASE WHEN cur = nxt THEN 1 ELSE 0 END)::DOUBLE
                       AS diag
            FROM t),
    p AS (SELECT cur, count(*)::DOUBLE AS n FROM t GROUP BY 1)
    SELECT CAST(tot.N AS BIGINT) AS n_transitions,
           round(tot.diag / tot.N, 6) + 0.0 AS repeat_share,
           round(sum((p.n / tot.N) * (p.n / tot.N)), 6) + 0.0
               AS independence_share,
           round((tot.diag / tot.N)
                 / sum((p.n / tot.N) * (p.n / tot.N)), 6) + 0.0
               AS stickiness_ratio
    FROM p CROSS JOIN tot
    GROUP BY tot.N, tot.diag
"""


# ---------------------------------------------------------------------------
# rank-1 power approximation / hour-of-day entropy / intraday concentration
# ---------------------------------------------------------------------------

def q_rank1_power_dow(sf_dir: str) -> pd.DataFrame:
    """Rank-1 structure of the type×weekday mean matrix via ONE
    deterministic power half-iteration pair from the all-ones vector:
    v = Mᵀ1 (weekday profile), u = Mv (type loadings), least-squares
    scale c = ⟨M, uvᵀ⟩/‖uvᵀ‖², energy ratio = c²‖uvᵀ‖²/‖M‖² — 'is the
    weekly pattern shared across types?' with all algebra as plain
    aggregates (no eigensolver)."""
    daily = _bucket_series(sf_dir, DAY_US, "d")
    df = daily.to_pandas()
    df["dow"] = df["d"].dt.dayofweek
    M = df.pivot_table(index="event_type", columns="dow", values="v",
                       aggfunc="mean").fillna(0.0)
    M = M.reindex(index=sorted(M.index), columns=range(7), fill_value=0.0)
    A = M.to_numpy(np.float64)
    v = A.sum(axis=0)          # M^T 1
    u = A @ v                  # M v
    uv = np.outer(u, v)
    c = (A * uv).sum() / (uv * uv).sum()
    ratio = c * c * (uv * uv).sum() / (A * A).sum()
    return pd.DataFrame({
        "n_types": [np.int64(A.shape[0])],
        "energy_ratio": [np.round(ratio, 6) + 0.0],
        "scale_c": [np.round(c, 6) + 0.0],
    })


SQL_RANK1_POWER_DOW = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type AS et, isodow(d) - 1 AS dow, avg(v) AS m
          FROM daily GROUP BY 1, 2),
    v AS (SELECT dow, sum(m) AS v FROM m GROUP BY 1),
    u AS (SELECT m.et, sum(m.m * v.v) AS u
          FROM m JOIN v USING (dow) GROUP BY 1),
    uv AS (SELECT u.et, v.dow, u.u * v.v AS uv FROM u CROSS JOIN v),
    dots AS (
        SELECT sum(m.m * uv.uv) AS m_dot_uv
        FROM m JOIN uv ON uv.et = m.et AND uv.dow = m.dow
    ),
    norms AS (
        SELECT (SELECT sum(uv * uv) FROM uv) AS uv2,
               (SELECT sum(m * m) FROM m) AS m2,
               (SELECT count(DISTINCT et) FROM m) AS k
    )
    SELECT CAST(norms.k AS BIGINT) AS n_types,
           round(pow(dots.m_dot_uv / norms.uv2, 2) * norms.uv2
                 / norms.m2, 6) + 0.0 AS energy_ratio,
           round(dots.m_dot_uv / norms.uv2, 6) + 0.0 AS scale_c
    FROM dots CROSS JOIN norms
"""


def q_hod_entropy_events(sf_dir: str) -> pd.DataFrame:
    """Hour-of-day entropy per type: Shannon H of the 24-bin arrival
    distribution and the uniformity ratio H/ln(24) — 1 = around-the-clock,
    low = office-hours traffic; the marginal complement of the
    type×hour mutual information."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def hod(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame({"event_type": b["event_type"],
                             "h": (us % DAY_US) // HOUR_US, "one": 1})

    ct = hash_aggregate(ev.map_batches(hod, batch_format="pandas"),
                        ["event_type", "h"], {"n": ("one", "sum")},
                        num_partitions=_NP).to_pandas()
    rows = []
    for et, g in ct.groupby("event_type"):
        p = g["n"].to_numpy(np.float64)
        p = p / p.sum()
        H = float(-(p * np.log(p)).sum())
        rows.append((et, int(g["n"].sum()), np.round(H, 6) + 0.0,
                     np.round(H / np.log(24.0), 6) + 0.0))
    return pd.DataFrame(rows, columns=["event_type", "n_events",
                                       "hod_entropy", "uniformity"]) \
        .astype({"n_events": np.int64}) \
        .sort_values("event_type").reset_index(drop=True)


SQL_HOD_ENTROPY = f"""
    WITH ct AS (
        SELECT event_type, (epoch_us(ts) % {DAY_US}) // {HOUR_US} AS h,
               count(*)::DOUBLE AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, sum(n) AS T FROM ct GROUP BY 1)
    SELECT ct.event_type, CAST(any_value(tot.T) AS BIGINT) AS n_events,
           round(sum(-(ct.n / tot.T) * ln(ct.n / tot.T)), 6) + 0.0
               AS hod_entropy,
           round(sum(-(ct.n / tot.T) * ln(ct.n / tot.T)) / ln(24),
                 6) + 0.0 AS uniformity
    FROM ct JOIN tot USING (event_type)
    GROUP BY 1 ORDER BY 1
"""


def q_intraday_concentration_daily(sf_dir: str) -> pd.DataFrame:
    """Intraday concentration per day: the largest single-hour share of
    the day's event count and the HHI over its 24 hourly shares —
    'did one hour carry the day', the burst-compaction trigger signal."""
    ev = _read(sf_dir, "events", ["ts"])

    def cell(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame({
            "d": pd.to_datetime((us // DAY_US) * DAY_US, unit="us"),
            "h": (us % DAY_US) // HOUR_US, "one": 1})

    ct = hash_aggregate(ev.map_batches(cell, batch_format="pandas"),
                        ["d", "h"], {"n": ("one", "sum")},
                        num_partitions=_NP).to_pandas()
    rows = []
    for d, g in ct.groupby("d"):
        tot = float(g["n"].sum())
        sh = g["n"].to_numpy(np.float64) / tot
        rows.append((d, int(tot), np.round(sh.max(), 6) + 0.0,
                     np.round((sh ** 2).sum(), 6) + 0.0))
    return pd.DataFrame(rows, columns=["d", "n_events", "max_hour_share",
                                       "hhi"]) \
        .astype({"n_events": np.int64}) \
        .sort_values("d").reset_index(drop=True)


SQL_INTRADAY_CONCENTRATION = f"""
    WITH ct AS (
        SELECT date_trunc('day', ts) AS d,
               (epoch_us(ts) % {DAY_US}) // {HOUR_US} AS h,
               count(*)::DOUBLE AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT d, sum(n) AS T FROM ct GROUP BY 1)
    SELECT ct.d, CAST(any_value(tot.T) AS BIGINT) AS n_events,
           round(max(ct.n / tot.T), 6) + 0.0 AS max_hour_share,
           round(sum((ct.n / tot.T) * (ct.n / tot.T)), 6) + 0.0 AS hhi
    FROM ct JOIN tot USING (d)
    GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Siegel repeated medians / source vocab entropy / two-proportion z
# ---------------------------------------------------------------------------

def q_siegel_slope_daily(sf_dir: str) -> pd.DataFrame:
    """Siegel repeated-median slope per series (Siegel 1982): for each
    point the MEDIAN of its pairwise slopes, then the median of those —
    50% breakdown (vs Theil-Sen's 29%). Pairwise slopes round to 6 before
    the inner median so tie handling matches; day index is the
    regressor."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values("d")
            us = g["d"].astype("datetime64[us]").astype("int64").to_numpy()
            t = ((us - us.min()) // DAY_US).astype(np.float64)
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < 3:
                rows.append((et, n, np.nan))
                continue
            inner = []
            for i in range(n):
                dt = t - t[i]
                dv = v - v[i]
                s = np.round(dv[dt != 0] / dt[dt != 0], 6) + 0.0
                inner.append(np.quantile(s, 0.5))
            slope = np.quantile(np.round(np.array(inner), 6) + 0.0, 0.5)
            rows.append((et, n, np.round(slope, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "siegel_slope"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["siegel_slope"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_SIEGEL_SLOPE = f"""
    WITH daily AS ({_DAILY_SQL}),
    tt AS (
        SELECT event_type, v,
               CAST(datediff('day',
                    min(d) OVER (PARTITION BY event_type), d) AS DOUBLE)
                   AS t
        FROM daily
    ),
    sl AS (
        SELECT a.event_type, a.t AS ti,
               round((b.v - a.v) / (b.t - a.t), 6) + 0.0 AS s
        FROM tt a JOIN tt b
          ON a.event_type = b.event_type AND a.t <> b.t
    ),
    inner_med AS (
        SELECT event_type, ti,
               round(quantile_cont(s, 0.5), 6) + 0.0 AS med
        FROM sl GROUP BY 1, 2
    ),
    cnt AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1)
    SELECT c.event_type, CAST(c.n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN c.n >= 3
                         THEN round(quantile_cont(i.med, 0.5), 6) + 0.0
                    END, {NULLF}) AS siegel_slope
    FROM cnt c LEFT JOIN inner_med i USING (event_type)
    GROUP BY c.event_type, c.n ORDER BY 1
"""


def q_source_vocab_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-source token entropy and effective vocabulary e^H — how many
    'effective' distinct tokens each slice really uses (the diversity
    companion to the richness indices)."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[["source"]].copy()
        ex["tok"] = b["text"].str.split()
        ex = ex.explode("tok").dropna(subset=["tok"])
        vc = ex.groupby(["source", "tok"], sort=False).size()
        return vc.rename("cnt").reset_index() \
            .rename(columns={"tok": "token"})

    tc = hash_aggregate(docs.map_batches(partial, batch_format="pandas"),
                        ["source", "token"], {"c": ("cnt", "sum")},
                        num_partitions=_NP).to_pandas()
    rows = []
    for s, g in tc.groupby("source"):
        p = g["c"].to_numpy(np.float64)
        p = p / p.sum()
        H = float(-(p * np.log(p)).sum())
        rows.append((s, int(g["c"].sum()), len(g),
                     np.round(H, 6) + 0.0,
                     np.round(np.exp(H), 6) + 0.0))
    return pd.DataFrame(rows, columns=["source", "n_tokens", "n_types",
                                       "entropy", "effective_vocab"]) \
        .astype({"n_tokens": np.int64, "n_types": np.int64}) \
        .sort_values("source").reset_index(drop=True)


SQL_SOURCE_VOCAB_ENTROPY = r"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT source, token, count(*)::DOUBLE AS c
           FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, sum(c) AS T FROM tc GROUP BY 1)
    SELECT tc.source, CAST(any_value(tot.T) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(sum(-(tc.c / tot.T) * ln(tc.c / tot.T)), 6) + 0.0
               AS entropy,
           round(exp(sum(-(tc.c / tot.T) * ln(tc.c / tot.T))), 6) + 0.0
               AS effective_vocab
    FROM tc JOIN tot USING (source)
    GROUP BY 1 ORDER BY 1
"""


def q_weekend_share_ztest_events(sf_dir: str) -> pd.DataFrame:
    """Two-proportion z-test: does the purchase share differ between
    weekend and weekday events? Pooled-SE z, the classic A/B arithmetic
    on a calendar split."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].astype("int64") // DAY_US
        we = ((day + 3) % 7).isin([5, 6])  # 1970-01-01 = Thursday
        isp = (b["event_type"] == "purchase").astype(np.int64)
        return pd.DataFrame({
            "we_n": we.astype(np.int64), "we_x": (we * isp),
            "wd_n": (~we).astype(np.int64), "wd_x": ((~we) * isp)})

    agg = ev.map_batches(flags, batch_format="pandas").to_pandas().sum()
    n1, x1 = float(agg["we_n"]), float(agg["we_x"])
    n2, x2 = float(agg["wd_n"]), float(agg["wd_x"])
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    se = np.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    z = (p1 - p2) / se if se > 0 else np.nan
    return pd.DataFrame({
        "n_weekend": [np.int64(n1)], "n_weekday": [np.int64(n2)],
        "share_weekend": [np.round(p1, 6) + 0.0],
        "share_weekday": [np.round(p2, 6) + 0.0],
        "z": [np.round(z, 6) + 0.0 if np.isfinite(z) else NULLF],
    })


SQL_WEEKEND_SHARE_ZTEST = f"""
    WITH t AS (
        SELECT (epoch_us(ts) // {DAY_US} + 3) % 7 IN (5, 6) AS we,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
        FROM events
    ),
    a AS (
        SELECT sum(CASE WHEN we THEN 1 ELSE 0 END)::DOUBLE AS n1,
               sum(CASE WHEN we THEN x ELSE 0 END)::DOUBLE AS x1,
               sum(CASE WHEN we THEN 0 ELSE 1 END)::DOUBLE AS n2,
               sum(CASE WHEN we THEN 0 ELSE x END)::DOUBLE AS x2
        FROM t
    )
    SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(n2 AS BIGINT)
               AS n_weekday,
           round(x1 / n1, 6) + 0.0 AS share_weekend,
           round(x2 / n2, 6) + 0.0 AS share_weekday,
           COALESCE(CASE WHEN (x1 + x2) > 0 AND (x1 + x2) < (n1 + n2)
                         THEN round((x1 / n1 - x2 / n2)
                              / sqrt(((x1 + x2) / (n1 + n2))
                                     * (1 - (x1 + x2) / (n1 + n2))
                                     * (1 / n1 + 1 / n2)), 6) + 0.0 END,
                    {NULLF}) AS z
    FROM a
"""


# ---------------------------------------------------------------------------
# permutation entropy / seasonality drift / memorylessness check
# ---------------------------------------------------------------------------

def q_permutation_entropy_daily(sf_dir: str) -> pd.DataFrame:
    """Permutation entropy of order 3 per series (Bandt & Pompe 2002):
    classify every consecutive triple into one of the 6 ordinal patterns
    (strict comparisons; ties break toward the earlier index, i.e.
    'later value wins the tie' is FALSE — v_j <= v_i counts as not
    greater, documented), Shannon H over the pattern distribution
    normalized by ln 6 — the model-free complexity measure."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            if len(v) < 5:
                rows.append((et, 0, np.nan))
                continue
            a, b, c = v[:-2], v[1:-1], v[2:]
            # pattern id: ordinal rank of (a,b,c) with index tie-break
            gt_ab = (b > a).astype(np.int64)
            gt_ac = (c > a).astype(np.int64)
            gt_bc = (c > b).astype(np.int64)
            pid = gt_ab * 4 + gt_ac * 2 + gt_bc
            cnt = np.bincount(pid, minlength=8).astype(np.float64)
            p = cnt[cnt > 0] / cnt.sum()
            H = float(-(p * np.log(p)).sum())
            rows.append((et, int(cnt.sum()),
                         np.round(H / np.log(6.0), 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_triples",
                                           "perm_entropy"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_triples"] = out["n_triples"].astype(np.int64)
    out = _fill(out, ["perm_entropy"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_PERMUTATION_ENTROPY = f"""
    WITH daily AS ({_DAILY_SQL}),
    w AS (
        SELECT event_type, v AS a,
               LEAD(v, 1) OVER s AS b, LEAD(v, 2) OVER s AS c
        FROM daily WINDOW s AS (PARTITION BY event_type ORDER BY d)
    ),
    pat AS (
        SELECT event_type,
               (CASE WHEN b > a THEN 4 ELSE 0 END
                + CASE WHEN c > a THEN 2 ELSE 0 END
                + CASE WHEN c > b THEN 1 ELSE 0 END) AS pid
        FROM w WHERE b IS NOT NULL AND c IS NOT NULL
    ),
    cnt AS (SELECT event_type, pid, count(*)::DOUBLE AS n
            FROM pat GROUP BY 1, 2),
    tot AS (SELECT event_type, sum(n) AS T FROM cnt GROUP BY 1)
    SELECT cnt.event_type,
           CAST(any_value(tot.T) AS BIGINT) AS n_triples,
           COALESCE(CASE WHEN any_value(tot.T) >= 3
                         THEN round(sum(-(cnt.n / tot.T)
                                        * ln(cnt.n / tot.T)) / ln(6),
                                    6) + 0.0 END, {NULLF})
               AS perm_entropy
    FROM cnt JOIN tot USING (event_type)
    GROUP BY 1 ORDER BY 1
"""


def q_seasonality_drift_daily(sf_dir: str) -> pd.DataFrame:
    """Is the weekly cycle strengthening? Weekly-frequency spectral power
    of each series' first vs second half (demeaned within each half,
    ω = 2π/7), reported with the second/first ratio — the seasonality-
    drift monitor that decides when to refit seasonal models."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def power(v: np.ndarray) -> float:
        n = len(v)
        t = np.arange(n, dtype=np.float64)
        w = 2.0 * np.pi / 7.0
        dv = v - v.mean()
        c = (dv * np.cos(w * t)).sum()
        s = (dv * np.sin(w * t)).sum()
        return float((c * c + s * s) / n)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            h = len(v) // 2
            if h < 7:
                rows.append((et, len(v), np.nan, np.nan, np.nan))
                continue
            p1 = np.round(power(v[:h]), 6) + 0.0
            p2 = np.round(power(v[h:2 * h]), 6) + 0.0
            ratio = p2 / p1 if p1 > 0 else np.nan
            rows.append((et, len(v), p1, p2,
                         np.round(ratio, 6) + 0.0 if np.isfinite(ratio)
                         else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "power_first", "power_second",
                                           "drift_ratio"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["power_first", "power_second", "drift_ratio"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_SEASONALITY_DRIFT = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    seg AS (
        SELECT event_type, v, n,
               CASE WHEN rn <= n // 2 THEN 1
                    WHEN rn <= 2 * (n // 2) THEN 2 END AS half,
               CASE WHEN rn <= n // 2 THEN rn - 1.0
                    ELSE rn - n // 2 - 1.0 END AS t
        FROM r WHERE rn <= 2 * (n // 2)
    ),
    mu AS (SELECT event_type, half, avg(v) AS mu FROM seg
           WHERE half IS NOT NULL GROUP BY 1, 2),
    pw AS (
        SELECT s.event_type, s.half, any_value(s.n) AS n,
               round((pow(sum((s.v - mu.mu)
                              * cos(2 * pi() * s.t / 7)), 2)
                      + pow(sum((s.v - mu.mu)
                                * sin(2 * pi() * s.t / 7)), 2))
                     / count(*), 6) + 0.0 AS p
        FROM seg s JOIN mu ON mu.event_type = s.event_type
                           AND mu.half = s.half
        GROUP BY 1, 2
    ),
    piv AS (
        SELECT event_type, any_value(n) AS n,
               max(CASE WHEN half = 1 THEN p END) AS p1,
               max(CASE WHEN half = 2 THEN p END) AS p2,
               count(*) FILTER (half = 1) AS c1
        FROM pw GROUP BY 1
    ),
    base AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1)
    SELECT base.event_type, CAST(base.n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN base.n // 2 >= 7 THEN piv.p1 END, {NULLF})
               AS power_first,
           COALESCE(CASE WHEN base.n // 2 >= 7 THEN piv.p2 END, {NULLF})
               AS power_second,
           COALESCE(CASE WHEN base.n // 2 >= 7 AND piv.p1 > 0
                         THEN round(piv.p2 / piv.p1, 6) + 0.0 END,
                    {NULLF}) AS drift_ratio
    FROM base LEFT JOIN piv USING (event_type)
    ORDER BY 1
"""


def q_memoryless_check_events(sf_dir: str) -> pd.DataFrame:
    """Memorylessness audit of inter-arrival gaps per type: under an
    exponential process P(G > a+b | G > a) = P(G > b); compare the
    empirical P(G > 2·med | G > med) against P(G > med) (med = the
    ROUNDED median gap) — equality ⇒ Poisson-like arrivals, excess ⇒
    clustering."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["event_type", "ts", "event_id"])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            g = g.sort_values(["ts", "event_id"])
            us = g["ts"].astype("int64").to_numpy()
            if len(us) < 3:
                rows.append((et, 0, np.nan, np.nan, np.nan))
                continue
            gaps = np.diff(us) / 1e6
            med = np.round(np.quantile(gaps, 0.5), 6) + 0.0
            n_gt = int((gaps > med).sum())
            n_gt2 = int((gaps > 2 * med).sum())
            p_b = n_gt / len(gaps)
            p_cond = n_gt2 / n_gt if n_gt else np.nan
            rows.append((et, len(gaps), np.round(p_b, 6) + 0.0,
                         np.round(p_cond, 6) + 0.0 if np.isfinite(p_cond)
                         else np.nan,
                         np.round(p_cond / p_b, 6) + 0.0
                         if np.isfinite(p_cond) and p_b > 0 else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                           "p_exceed_med",
                                           "p_cond_exceed",
                                           "memory_ratio"])

    out = keyed_map_partitions(ev, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_gaps"] = out["n_gaps"].astype(np.int64)
    out = _fill(out, ["p_exceed_med", "p_cond_exceed", "memory_ratio"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_MEMORYLESS_CHECK = f"""
    WITH o AS (
        SELECT event_type, ts,
               LAG(ts) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS prev
        FROM events
    ),
    gaps AS (
        SELECT event_type, (epoch_us(ts) - epoch_us(prev)) / 1e6 AS g
        FROM o WHERE prev IS NOT NULL
    ),
    med AS (SELECT event_type, count(*) AS n,
                   round(quantile_cont(g, 0.5), 6) + 0.0 AS med
            FROM gaps GROUP BY 1),
    c AS (
        SELECT g.event_type, any_value(med.n) AS n,
               sum(CASE WHEN g.g > med.med THEN 1 ELSE 0 END)::DOUBLE
                   AS n_gt,
               sum(CASE WHEN g.g > 2 * med.med THEN 1 ELSE 0 END)::DOUBLE
                   AS n_gt2
        FROM gaps g JOIN med USING (event_type)
        GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           round(n_gt / n, 6) + 0.0 AS p_exceed_med,
           COALESCE(CASE WHEN n_gt > 0
                         THEN round(n_gt2 / n_gt, 6) + 0.0 END, {NULLF})
               AS p_cond_exceed,
           COALESCE(CASE WHEN n_gt > 0 AND n_gt / n > 0
                         THEN round((n_gt2 / n_gt) / (n_gt / n), 6) + 0.0
                    END, {NULLF}) AS memory_ratio
    FROM c ORDER BY 1
"""


# ---------------------------------------------------------------------------
# event trigrams / median residual life / exact median CI
# ---------------------------------------------------------------------------

def q_trigram_sequences_events(sf_dir: str) -> pd.DataFrame:
    """Second-order sequence motifs: the 10 most frequent event-type
    trigrams over per-user streams (count desc, lexicographic asc), each
    with its continuation probability P(c | a→b) — the next step up from
    the first-order transition matrix."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def tri(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("user_id", sort=False):
            t = g.sort_values(["ts", "event_id"])["event_type"].to_numpy()
            if len(t) < 3:
                continue
            outs.append(pd.DataFrame({"a": t[:-2], "b": t[1:-1],
                                      "c": t[2:]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.concat(outs, ignore_index=True)
        return df.groupby(["a", "b", "c"], sort=False).size() \
            .rename("n").reset_index()

    tg = hash_aggregate(
        keyed_map_partitions(ev, ["user_id"], tri, num_partitions=_NP),
        ["a", "b", "c"], {"n": ("n", "sum")}, num_partitions=4).to_pandas()
    ab = tg.groupby(["a", "b"])["n"].sum()
    tg["p_cont"] = np.round(
        tg["n"].to_numpy(np.float64)
        / tg.set_index(["a", "b"]).index.map(ab).to_numpy(np.float64),
        6) + 0.0
    tg = tg.sort_values(["n", "a", "b", "c"],
                        ascending=[False, True, True, True]).head(10)
    tg["n"] = tg["n"].astype(np.int64)
    return tg.reset_index(drop=True)


SQL_TRIGRAM_SEQUENCES = """
    WITH s AS (
        SELECT event_type AS a,
               LEAD(event_type, 1) OVER w AS b,
               LEAD(event_type, 2) OVER w AS c
        FROM events WINDOW w AS (PARTITION BY user_id
                                 ORDER BY ts, event_id)
    ),
    t AS (SELECT a, b, c, count(*) AS n FROM s
          WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2, 3),
    ab AS (SELECT a, b, sum(n) AS nab FROM t GROUP BY 1, 2)
    SELECT t.a, t.b, t.c, CAST(t.n AS BIGINT) AS n,
           round(t.n * 1.0 / ab.nab, 6) + 0.0 AS p_cont
    FROM t JOIN ab USING (a, b)
    ORDER BY t.n DESC, t.a, t.b, t.c LIMIT 10
"""


def q_median_residual_life_users(sf_dir: str) -> pd.DataFrame:
    """Median residual lifetime at t₀ = 7 days from the Kaplan-Meier
    curve (same lifetime table as kaplan_meier_users): the smallest event
    time t with S(t) ≤ S(7)/2, minus 7 — 'a user who made it a week has
    this much median life left' (NULLF when the curve never falls that
    far). Survival values ROUND to 6 before the comparison."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    span = hash_aggregate(ev, ["user_id"],
                          {"first_ts": ("ts", "min"),
                           "last_ts": ("ts", "max")},
                          num_partitions=_NP)
    end = ev.map_batches(lambda b: pd.DataFrame({"m": [b["ts"].max()]}),
                         batch_format="pandas").to_pandas()["m"].max()
    cutoff = end - pd.Timedelta(days=7)

    def life(b: pd.DataFrame) -> pd.DataFrame:
        t = ((b["last_ts"].astype("datetime64[us]").astype("int64")
              - b["first_ts"].astype("datetime64[us]").astype("int64"))
             // DAY_US).astype(np.int64)
        return pd.DataFrame({
            "t": t,
            "death": (b["last_ts"] <= cutoff).astype(np.int64),
            "one": np.ones(len(b), dtype=np.int64)})

    tab = hash_aggregate(span.map_batches(life, batch_format="pandas"),
                         ["t"], {"d": ("death", "sum"),
                                 "c": ("one", "sum")},
                         num_partitions=4).to_pandas().sort_values("t")
    total = int(tab["c"].sum())
    at_risk = total - np.concatenate(
        [[0], np.cumsum(tab["c"].to_numpy())[:-1]])
    surv = np.round(np.cumprod(1.0 - tab["d"].to_numpy(np.float64)
                               / at_risk), 6) + 0.0
    ts = tab["t"].to_numpy(np.int64)
    T0 = 7
    idx0 = np.searchsorted(ts, T0, side="right") - 1
    s0 = surv[idx0] if idx0 >= 0 else 1.0
    target = s0 / 2.0
    below = np.flatnonzero(surv <= target)
    mrl = float(ts[below[0]] - T0) if len(below) else np.nan
    return pd.DataFrame({
        "t0_days": [np.int64(T0)],
        "s_at_t0": [np.round(s0, 6) + 0.0],
        "median_residual_days": [np.round(mrl, 6) + 0.0
                                 if np.isfinite(mrl) else NULLF],
    })


SQL_MEDIAN_RESIDUAL_LIFE = f"""
    WITH u AS (
        SELECT user_id, min(ts) AS f, max(ts) AS l FROM events GROUP BY 1
    ),
    ce AS (SELECT max(ts) AS e FROM events),
    lt AS (
        SELECT (epoch_us(l) - epoch_us(f)) // 86400000000 AS t,
               CASE WHEN l <= (SELECT e - INTERVAL 7 DAY FROM ce)
                    THEN 1 ELSE 0 END AS death
        FROM u
    ),
    tab AS (SELECT t, sum(death) AS d, count(*) AS c FROM lt GROUP BY 1),
    r AS (
        SELECT t, d,
               (SELECT sum(c) FROM tab) -
               COALESCE(sum(c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_at_risk
        FROM tab
    ),
    km AS (
        SELECT t,
               round(exp(sum(ln(1 - d * 1.0 / n_at_risk))
                         OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)),
                     6) + 0.0 AS s
        FROM r
    ),
    s0 AS (SELECT COALESCE((SELECT s FROM km WHERE t <= 7
                            ORDER BY t DESC LIMIT 1), 1.0) AS s0),
    mrl AS (
        SELECT min(t) AS t_half FROM km CROSS JOIN s0
        WHERE km.s <= s0.s0 / 2.0
    )
    SELECT CAST(7 AS BIGINT) AS t0_days,
           round(s0.s0, 6) + 0.0 AS s_at_t0,
           COALESCE(round((mrl.t_half - 7)::DOUBLE, 6) + 0.0, {NULLF})
               AS median_residual_days
    FROM s0 CROSS JOIN mrl
"""


def q_median_ci_daily(sf_dir: str) -> pd.DataFrame:
    """Distribution-free exact 95% CI for each series' median via order
    statistics: the (l, u) ranks where the Binomial(n, ½) CDF first
    exceeds 2.5% / falls below 97.5% (computed with lgamma binomials —
    identically in the SQL oracle), CI = (v₍l₎, v₍u₎). No normality, no
    bootstrap."""
    from math import lgamma

    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def binom_cdf_half(n: int):
        # P(X <= k) for X ~ Bin(n, 1/2), k = 0..n
        logs = np.array([lgamma(n + 1) - lgamma(k + 1) - lgamma(n - k + 1)
                         for k in range(n + 1)])
        pmf = np.exp(logs - n * np.log(2.0))
        return np.cumsum(pmf)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = np.sort(g["v"].to_numpy(np.float64))
            n = len(v)
            if n < 6:
                rows.append((et, n, np.nan, np.nan, np.nan))
                continue
            cdf = binom_cdf_half(n)
            # l = largest k with P(X < k) <= 0.025 → rank l (1-based)
            l = int(np.searchsorted(cdf, 0.025, side="right"))
            u = n - l + 1  # symmetric upper rank
            med = np.round(np.quantile(v, 0.5), 6) + 0.0
            rows.append((et, n, med,
                         np.round(v[max(l - 1, 0)], 6) + 0.0,
                         np.round(v[min(u - 1, n - 1)], 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "median", "ci_lo", "ci_hi"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["median", "ci_lo", "ci_hi"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_MEDIAN_CI = f"""
    WITH daily AS ({_DAILY_SQL}),
    cnt AS (SELECT event_type, count(*) AS n,
                   round(quantile_cont(v, 0.5), 6) + 0.0 AS med
            FROM daily GROUP BY 1),
    ks AS (
        SELECT c.event_type, c.n, k.k,
               exp(lgamma(c.n + 1) - lgamma(k.k + 1)
                   - lgamma(c.n - k.k + 1) - c.n * ln(2)) AS pmf
        FROM cnt c, (SELECT unnest(range(0, 1000)) AS k) k
        WHERE k.k <= c.n
    ),
    cdf AS (
        SELECT event_type, k,
               sum(pmf) OVER (PARTITION BY event_type ORDER BY k
                              ROWS UNBOUNDED PRECEDING) AS cdf
        FROM ks
    ),
    l AS (
        SELECT event_type, count(*) AS l
        FROM cdf WHERE cdf <= 0.025 GROUP BY 1
    ),
    ranks AS (
        SELECT d.event_type, d.v,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.v) AS rk
        FROM daily d
    )
    SELECT c.event_type, CAST(c.n AS BIGINT) AS n_days,
           COALESCE(CASE WHEN c.n >= 6 THEN c.med END, {NULLF}) AS median,
           COALESCE(CASE WHEN c.n >= 6
                         THEN (SELECT round(v, 6) + 0.0 FROM ranks
                               WHERE ranks.event_type = c.event_type
                                 AND ranks.rk = greatest(l.l, 1)) END,
                    {NULLF}) AS ci_lo,
           COALESCE(CASE WHEN c.n >= 6
                         THEN (SELECT round(v, 6) + 0.0 FROM ranks
                               WHERE ranks.event_type = c.event_type
                                 AND ranks.rk = least(c.n - l.l + 1, c.n))
                    END, {NULLF}) AS ci_hi
    FROM cnt c LEFT JOIN l USING (event_type)
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# CRPS climatology / expected calibration error / same-day multi-orders
# ---------------------------------------------------------------------------

def q_crps_climatology_daily(sf_dir: str) -> pd.DataFrame:
    """CRPS of the climatology forecast per series: the empirical
    distribution of all-but-last days scores the LAST day's value,
    CRPS = E|X−y| − ½E|X−X′| with the Gini-mean-difference identity
    E|X−X′| = 2Σ(2i−n−1)x₍ᵢ₎/n² — the proper scoring rule that rewards
    sharp AND calibrated distributions (MAE is its degenerate point-mass
    case)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            if len(v) < 3:
                rows.append((et, len(v), np.nan))
                continue
            y = v[-1]
            x = np.sort(v[:-1])
            n = len(x)
            e_xy = np.abs(x - y).mean()
            i = np.arange(1, n + 1, dtype=np.float64)
            e_xx = 2.0 * ((2 * i - n - 1) * x).sum() / (n * n)
            rows.append((et, n, np.round(e_xy - 0.5 * e_xx, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_train",
                                           "crps"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_train"] = out["n_train"].astype(np.int64)
    out = _fill(out, ["crps"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_CRPS_CLIMATOLOGY = f"""
    WITH daily AS ({_DAILY_SQL}),
    last AS (SELECT event_type, arg_max(v, d) AS y, max(d) AS dmax,
                    count(*) AS ntot
             FROM daily GROUP BY 1),
    train AS (
        SELECT d.event_type, d.v, l.y
        FROM daily d JOIN last l USING (event_type)
        WHERE d.d < l.dmax
    ),
    rk AS (
        SELECT event_type, v, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v)
                   AS i,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM train
    )
    SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_train,
           COALESCE(CASE WHEN any_value(n) >= 2
                         THEN round(avg(abs(v - y))
                              - sum((2.0 * i - n - 1) * v)
                                / (any_value(n) * any_value(n)),
                              6) + 0.0 END, {NULLF}) AS crps
    FROM rk GROUP BY 1 ORDER BY 1
"""


def q_ece_users(sf_dir: str) -> pd.DataFrame:
    """Expected calibration error of the first-half→second-half purchase
    predictor over the decile bins: ECE = Σ(nₖ/N)·|p̄ₖ − ōₖ| plus the max
    bin gap (MCE) — the single-number calibration summary on top of the
    reliability table."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    bounds = ev.map_batches(
        lambda b: pd.DataFrame({"lo": [b["ts"].astype("int64").min()],
                                "hi": [b["ts"].astype("int64").max()]}),
        batch_format="pandas").to_pandas()
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64").to_numpy()
        first = us <= mid
        isp = (b["event_type"] == "purchase").to_numpy()
        return pd.DataFrame({
            "user_id": b["user_id"],
            "n1": first.astype(np.int64),
            "p1": (first & isp).astype(np.int64),
            "p2": (~first & isp).astype(np.int64)})

    per_user = hash_aggregate(
        ev.map_batches(flags, batch_format="pandas"), ["user_id"],
        {"n1": ("n1", "sum"), "p1": ("p1", "sum"), "p2": ("p2", "max")},
        num_partitions=_NP).to_pandas()
    per_user = per_user[per_user["n1"] > 0]
    pred = np.round(per_user["p1"].to_numpy(np.float64)
                    / per_user["n1"].to_numpy(np.float64), 6) + 0.0
    obs = per_user["p2"].to_numpy(np.float64)
    dec = np.minimum((pred * 10).astype(np.int64), 9)
    df = pd.DataFrame({"k": dec, "p": pred, "o": obs})
    g = df.groupby("k")
    nk = g.size().to_numpy(np.float64)
    gap = np.abs(g["p"].mean().to_numpy(np.float64)
                 - g["o"].mean().to_numpy(np.float64))
    N = nk.sum()
    return pd.DataFrame({
        "n_users": [np.int64(N)],
        "ece": [np.round((nk * gap).sum() / N, 6) + 0.0],
        "mce": [np.round(gap.max(), 6) + 0.0],
    })


SQL_ECE_USERS = """
    WITH mid AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
        FROM events
    ),
    u AS (
        SELECT user_id,
               sum(CASE WHEN epoch_us(ts) <= mid.m THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN epoch_us(ts) <= mid.m
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS p1,
               max(CASE WHEN epoch_us(ts) > mid.m
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS p2
        FROM events CROSS JOIN mid GROUP BY 1
    ),
    t AS (
        SELECT round(p1 * 1.0 / n1, 6) + 0.0 AS pred, p2::DOUBLE AS obs,
               least(CAST(floor((round(p1 * 1.0 / n1, 6) + 0.0) * 10)
                          AS BIGINT), 9) AS k
        FROM u WHERE n1 > 0
    ),
    bins AS (SELECT k, count(*)::DOUBLE AS nk,
                    abs(avg(pred) - avg(obs)) AS gap
             FROM t GROUP BY 1)
    SELECT CAST(sum(nk) AS BIGINT) AS n_users,
           round(sum(nk * gap) / sum(nk), 6) + 0.0 AS ece,
           round(max(gap), 6) + 0.0 AS mce
    FROM bins
"""


def q_same_day_multiorders(sf_dir: str) -> pd.DataFrame:
    """Integrity/behavior audit: customers placing MULTIPLE orders on one
    calendar day — how many customers, how many such days, and the share
    of all orders involved (dedup pipelines treat these as suspects)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def day(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["day"] = b["o_orderdate"].astype("datetime64[us]") \
            .astype("int64") // DAY_US
        b["one"] = 1
        return b[["o_custkey", "day", "one"]]

    cd = hash_aggregate(orders.map_batches(day, batch_format="pandas"),
                        ["o_custkey", "day"], {"n": ("one", "sum")},
                        num_partitions=_NP).to_pandas()
    multi = cd[cd["n"] > 1]
    total_orders = int(cd["n"].sum())
    return pd.DataFrame({
        "n_multi_days": [np.int64(len(multi))],
        "n_customers": [np.int64(multi["o_custkey"].nunique())],
        "n_orders_involved": [np.int64(multi["n"].sum())],
        "share_of_orders": [np.round(multi["n"].sum() / total_orders,
                                     6) + 0.0],
    })


SQL_SAME_DAY_MULTIORDERS = f"""
    WITH cd AS (
        SELECT o_custkey, epoch_us(o_orderdate) // {DAY_US} AS day,
               count(*) AS n
        FROM orders GROUP BY 1, 2
    ),
    m AS (SELECT * FROM cd WHERE n > 1)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_multi_days,
           (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM m)
               AS n_customers,
           (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) FROM m)
               AS n_orders_involved,
           round((SELECT COALESCE(sum(n), 0) FROM m) * 1.0
                 / (SELECT sum(n) FROM cd), 6) + 0.0 AS share_of_orders
"""


# ---------------------------------------------------------------------------
# effective sample size / flow imbalance / hourly ACF-24
# ---------------------------------------------------------------------------

def q_ess_daily(sf_dir: str) -> pd.DataFrame:
    """Effective sample size per series from the integrated
    autocorrelation time τ = 1 + 2Σₖ₌₁¹⁰ rₖ (rₖ the sample ACF, summed
    over the fixed window; τ floored at 1): ESS = n/τ — how many
    'independent' days the month really contains, the honest n for any
    downstream mean test."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            n = len(v)
            dv = v - v.mean()
            den = (dv ** 2).sum()
            if n < 12 or den <= 0:
                rows.append((et, n, np.nan, np.nan))
                continue
            tau = 1.0
            for k in range(1, 11):
                tau += 2.0 * (dv[k:] * dv[:-k]).sum() / den
            tau = max(tau, 1.0)
            rows.append((et, n, np.round(tau, 6) + 0.0,
                         np.round(n / tau, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "tau_int", "ess"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["tau_int", "ess"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_ESS_DAILY = f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, count(*) AS n
          FROM daily GROUP BY 1),
    r AS (
        SELECT d.event_type, d.v, m.mu, m.n,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.d) AS rn
        FROM daily d JOIN m USING (event_type)
    ),
    den AS (SELECT event_type, sum((v - mu) * (v - mu)) AS den,
                   any_value(n) AS n
            FROM r GROUP BY 1),
    acf AS (
        SELECT a.event_type,
               sum((a.v - a.mu) * (b.v - b.mu)) AS num
        FROM (SELECT unnest(range(1, 11)) AS k) k, r a
        JOIN r b ON a.event_type = b.event_type AND a.rn = b.rn + k.k
        GROUP BY 1
    ),
    tau AS (
        SELECT den.event_type, den.n,
               greatest(1.0 + 2.0 * acf.num / den.den, 1.0) AS tau
        FROM den JOIN acf USING (event_type)
        WHERE den.den > 0 AND den.n >= 12
    ),
    base AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1)
    SELECT base.event_type, CAST(base.n AS BIGINT) AS n_days,
           COALESCE(round(tau.tau, 6) + 0.0, {NULLF}) AS tau_int,
           COALESCE(round(base.n / tau.tau, 6) + 0.0, {NULLF}) AS ess
    FROM base LEFT JOIN tau USING (event_type)
    ORDER BY 1
"""


def q_flow_imbalance_events(sf_dir: str) -> pd.DataFrame:
    """Directional flow imbalance of the transition graph: for every
    unordered type pair, net flow (a→b minus b→a) over gross flow — a
    signed 'which way does traffic drift' audit of the Markov matrix's
    asymmetry."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("user_id", sort=False):
            t = g.sort_values(["ts", "event_id"])["event_type"].to_numpy()
            if len(t) < 2:
                continue
            outs.append(pd.DataFrame({"cur": t[:-1], "nxt": t[1:]}))
        if not outs:
            return pd.DataFrame({"cur": pd.Series([], dtype="object"),
                                 "nxt": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.concat(outs, ignore_index=True)
        return df.groupby(["cur", "nxt"], sort=False).size() \
            .rename("n").reset_index()

    trans = hash_aggregate(
        keyed_map_partitions(ev, ["user_id"], pairs, num_partitions=_NP),
        ["cur", "nxt"], {"n": ("n", "sum")}, num_partitions=4).to_pandas()
    tmap = {(r.cur, r.nxt): int(r.n) for r in trans.itertuples()}
    ets = sorted(set(trans["cur"]) | set(trans["nxt"]))
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            ab = tmap.get((a, b), 0)
            ba = tmap.get((b, a), 0)
            gross = ab + ba
            imb = (ab - ba) / gross if gross else np.nan
            rows.append((a, b, ab, ba,
                         np.round(imb, 6) + 0.0 if np.isfinite(imb)
                         else NULLF))
    return pd.DataFrame(rows, columns=["et_a", "et_b", "n_ab", "n_ba",
                                       "imbalance"]) \
        .astype({"n_ab": np.int64, "n_ba": np.int64})


SQL_FLOW_IMBALANCE = f"""
    WITH s AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    t AS (SELECT cur, nxt, count(*) AS n FROM s
          WHERE nxt IS NOT NULL GROUP BY 1, 2),
    ets AS (SELECT DISTINCT event_type AS et FROM events),
    pairs AS (SELECT a.et AS et_a, b.et AS et_b
              FROM ets a, ets b WHERE a.et < b.et),
    j AS (
        SELECT p.et_a, p.et_b,
               COALESCE(tab.n, 0) AS n_ab, COALESCE(tba.n, 0) AS n_ba
        FROM pairs p
        LEFT JOIN t tab ON tab.cur = p.et_a AND tab.nxt = p.et_b
        LEFT JOIN t tba ON tba.cur = p.et_b AND tba.nxt = p.et_a
    )
    SELECT et_a, et_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_ba AS BIGINT) AS n_ba,
           COALESCE(CASE WHEN n_ab + n_ba > 0
                         THEN round((n_ab - n_ba) * 1.0 / (n_ab + n_ba),
                                    6) + 0.0 END, {NULLF}) AS imbalance
    FROM j ORDER BY 1, 2
"""


def q_hourly_acf24_events(sf_dir: str) -> pd.DataFrame:
    """Hourly-grain autocorrelation at the diurnal (24h) and weekly
    (168h) lags per type — the direct periodicity fingerprint at the
    resolution the tier cascade actually ingests."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    hourly = _bucket_series(sf_dir, HOUR_US, "h")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("h")["v"].to_numpy(np.float64)
            dv = v - v.mean()
            den = (dv ** 2).sum()
            for k in (24, 168):
                if len(v) <= k or den <= 0:
                    rows.append((et, k, len(v), np.nan))
                    continue
                rk = (dv[k:] * dv[:-k]).sum() / den
                rows.append((et, k, len(v), np.round(rk, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "lag_h",
                                           "n_hours", "acf"])

    out = keyed_map_partitions(hourly, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out[["lag_h", "n_hours"]] = out[["lag_h", "n_hours"]] \
        .astype(np.int64)
    out = _fill(out, ["acf"])
    return out.sort_values(["event_type", "lag_h"]).reset_index(drop=True)


SQL_HOURLY_ACF24 = f"""
    WITH hourly AS ({_HOURLY_SQL}),
    m AS (SELECT event_type, avg(v) AS mu, count(*) AS n
          FROM hourly GROUP BY 1),
    r AS (
        SELECT h.event_type, h.v, m.mu, m.n,
               ROW_NUMBER() OVER (PARTITION BY h.event_type
                                  ORDER BY h.h) AS rn
        FROM hourly h JOIN m USING (event_type)
    ),
    den AS (SELECT event_type, sum((v - mu) * (v - mu)) AS den,
                   any_value(n) AS n
            FROM r GROUP BY 1),
    acf AS (
        SELECT a.event_type, k.k,
               sum((a.v - a.mu) * (b.v - b.mu)) AS num
        FROM (SELECT unnest([24, 168]) AS k) k, r a
        JOIN r b ON a.event_type = b.event_type AND a.rn = b.rn + k.k
        GROUP BY 1, 2
    ),
    grid AS (SELECT DISTINCT m.event_type, k.k, m.n
             FROM m CROSS JOIN (SELECT unnest([24, 168]) AS k) k)
    SELECT g.event_type, CAST(g.k AS BIGINT) AS lag_h,
           CAST(g.n AS BIGINT) AS n_hours,
           COALESCE(CASE WHEN den.den > 0 AND g.n > g.k
                         THEN round(acf.num / den.den, 6) + 0.0 END,
                    {NULLF}) AS acf
    FROM grid g
    LEFT JOIN den ON den.event_type = g.event_type
    LEFT JOIN acf ON acf.event_type = g.event_type AND acf.k = g.k
    ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Diebold-Mariano / Gini mean difference / down-day profile
# ---------------------------------------------------------------------------

def q_diebold_mariano_daily(sf_dir: str) -> pd.DataFrame:
    """Diebold-Mariano comparison of two one-step forecasters per series —
    naive (lag-1) vs seasonal-naive (lag-7) — on squared-error loss over
    the days both are defined: DM = d̄/√(σ²_pop(d)/n) with d = e₁² − e₂²
    (lag-0 variance, the simple documented form). Negative DM favors the
    naive, positive the seasonal — the principled 'which baseline wins'
    test."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            if len(v) < 10:
                rows.append((et, 0, np.nan, np.nan))
                continue
            e1 = v[7:] - v[6:-1]   # naive: predict v[t-1]
            e2 = v[7:] - v[:-7]    # seasonal naive: predict v[t-7]
            d = e1 ** 2 - e2 ** 2
            n = len(d)
            var = d.var(ddof=0)
            dm = d.mean() / np.sqrt(var / n) if var > 0 else np.nan
            rows.append((et, n, np.round(d.mean(), 6) + 0.0,
                         np.round(dm, 6) + 0.0 if np.isfinite(dm)
                         else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n_obs",
                                           "mean_loss_diff", "dm_stat"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_obs"] = out["n_obs"].astype(np.int64)
    out = _fill(out, ["mean_loss_diff", "dm_stat"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DIEBOLD_MARIANO = f"""
    WITH daily AS ({_DAILY_SQL}),
    w AS (
        SELECT event_type, v,
               LAG(v, 1) OVER s AS v1, LAG(v, 7) OVER s AS v7,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily WINDOW s AS (PARTITION BY event_type ORDER BY d)
    ),
    d AS (
        SELECT event_type,
               (v - v1) * (v - v1) - (v - v7) * (v - v7) AS d
        FROM w WHERE v7 IS NOT NULL AND n >= 10
    ),
    agg AS (SELECT event_type, count(*)::DOUBLE AS n, avg(d) AS md,
                   var_pop(d) AS vd
            FROM d GROUP BY 1),
    base AS (SELECT DISTINCT event_type FROM daily)
    SELECT base.event_type,
           CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_obs,
           COALESCE(round(agg.md, 6) + 0.0, {NULLF}) AS mean_loss_diff,
           COALESCE(CASE WHEN agg.vd > 0
                         THEN round(agg.md / sqrt(agg.vd / agg.n), 6)
                              + 0.0 END, {NULLF}) AS dm_stat
    FROM base LEFT JOIN agg USING (event_type)
    ORDER BY 1
"""


def q_gini_mean_diff_daily(sf_dir: str) -> pd.DataFrame:
    """Gini mean difference per series — E|X−X′| over all pairs via the
    order-statistic identity 2Σ(2i−n−1)x₍ᵢ₎/(n(n−1)) (ddof-1 form) —
    the L1 scale measure between the std (squares) and the Shamos
    (pair medians)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            x = np.sort(g["v"].to_numpy(np.float64))
            n = len(x)
            if n < 2:
                rows.append((et, n, np.nan))
                continue
            i = np.arange(1, n + 1, dtype=np.float64)
            gmd = 2.0 * ((2 * i - n - 1) * x).sum() / (n * (n - 1.0))
            rows.append((et, n, np.round(gmd, 6) + 0.0))
        return pd.DataFrame(rows, columns=["event_type", "n_days", "gmd"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_days"] = out["n_days"].astype(np.int64)
    out = _fill(out, ["gmd"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_GINI_MEAN_DIFF = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v)
                   AS i,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    )
    SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_days,
           COALESCE(CASE WHEN any_value(n) >= 2
                         THEN round(2.0 * sum((2.0 * i - n - 1) * v)
                              / (any_value(n) * (any_value(n) - 1.0)),
                              6) + 0.0 END, {NULLF}) AS gmd
    FROM r GROUP BY 1 ORDER BY 1
"""


def q_down_days_daily(sf_dir: str) -> pd.DataFrame:
    """Downside profile per series: share of day-over-day declines, the
    mean decline magnitude, and the down/up magnitude ratio — the
    asymmetry summary behind drawdown risk (a series can trend up while
    falling MOST days)."""
    from forecastframe_ray.stages.agg import keyed_map_partitions

    daily = _bucket_series(sf_dir, DAY_US, "d")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in part.groupby("event_type", sort=False):
            v = g.sort_values("d")["v"].to_numpy(np.float64)
            d = np.diff(v)
            if len(d) < 2:
                rows.append((et, len(d), np.nan, np.nan, np.nan))
                continue
            down = d[d < 0]
            up = d[d > 0]
            share = len(down) / len(d)
            md = -down.mean() if len(down) else np.nan
            mu = up.mean() if len(up) else np.nan
            ratio = md / mu if len(down) and len(up) and mu > 0 else np.nan
            rows.append((et, len(d), np.round(share, 6) + 0.0,
                         np.round(md, 6) + 0.0 if np.isfinite(md)
                         else np.nan,
                         np.round(ratio, 6) + 0.0 if np.isfinite(ratio)
                         else np.nan))
        return pd.DataFrame(rows, columns=["event_type", "n_moves",
                                           "down_share", "mean_down",
                                           "down_up_ratio"])

    out = keyed_map_partitions(daily, ["event_type"], kernel,
                               num_partitions=_NP).to_pandas()
    out["n_moves"] = out["n_moves"].astype(np.int64)
    out = _fill(out, ["down_share", "mean_down", "down_up_ratio"])
    return out.sort_values("event_type").reset_index(drop=True)


SQL_DOWN_DAYS = f"""
    WITH daily AS ({_DAILY_SQL}),
    d AS (
        SELECT event_type,
               v - LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS dv
        FROM daily
    ),
    m AS (
        SELECT event_type, count(*)::DOUBLE AS n,
               count(*) FILTER (WHERE dv < 0)::DOUBLE AS nd,
               count(*) FILTER (WHERE dv > 0)::DOUBLE AS nu,
               avg(-dv) FILTER (WHERE dv < 0) AS md,
               avg(dv) FILTER (WHERE dv > 0) AS mu
        FROM d WHERE dv IS NOT NULL GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_moves,
           COALESCE(CASE WHEN n >= 2
                         THEN round(nd / n, 6) + 0.0 END, {NULLF})
               AS down_share,
           COALESCE(CASE WHEN n >= 2 AND nd > 0
                         THEN round(md, 6) + 0.0 END, {NULLF})
               AS mean_down,
           COALESCE(CASE WHEN n >= 2 AND nd > 0 AND nu > 0 AND mu > 0
                         THEN round(md / mu, 6) + 0.0 END, {NULLF})
               AS down_up_ratio
    FROM m ORDER BY 1
"""
