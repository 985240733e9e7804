"""Stateless per-batch scalar ops (SURVEY.md §2.2 M1, M8, M10).

All functions are vectorized batch transforms meant for
``ds.map_batches(fn, batch_format="pandas")`` (pandas chosen where NaN /
datetime semantics must match the reference exactly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DATETIME_FEATURES = (
    "day", "day_of_week", "weekend_flag", "week", "month", "year",
    "quarter", "month_year", "quarter_year",
)


def correct_negatives_batch(batch: pd.DataFrame, features: list[str],
                            replace_value=0) -> pd.DataFrame:
    """M1: clamp negatives to ``replace_value`` (transform.py:42-61); NaN kept."""
    for f in features:
        col = batch[f]
        batch[f] = col.where(~(col < 0), replace_value)
    return batch


def datetime_features_batch(batch: pd.DataFrame, ts_col: str,
                            datetime_list=DATETIME_FEATURES) -> pd.DataFrame:
    """M8: calendar features with the reference's exact quirks
    (feature_engineering.py:151-161): ``week`` is Sunday-start ``%U`` **plus
    one** (53 → 54 possible), ``year`` is the 2-digit ``%y``, ``month_year``
    ``"%yM%m"``, ``quarter_year`` ``"%yQ%q"``. day_of_week is Monday=0."""
    s = pd.to_datetime(batch[ts_col])
    dt = s.dt
    dow = dt.dayofweek.astype(np.int8)
    out = {}
    if "day" in datetime_list:
        out["day"] = dt.day.astype(np.int8)
    if "day_of_week" in datetime_list:
        out["day_of_week"] = dow
    if "weekend_flag" in datetime_list:
        out["weekend_flag"] = dow >= 5
    if "week" in datetime_list:
        # %U: Sunday-start week of year; vectorized closed form equal to
        # strftime("%U"): (doy + 6 - sunday_weekday) // 7, then the
        # reference's +1 (feature_engineering.py:155).
        sunday_dow = (dow.astype(np.int16) + 1) % 7
        u = (dt.dayofyear.astype(np.int16) + 6 - sunday_dow) // 7
        out["week"] = (u + 1).astype(np.int8)
    if "month" in datetime_list:
        out["month"] = dt.month.astype(np.int8)
    if "year" in datetime_list:
        out["year"] = (dt.year % 100).astype(np.int16)
    if "quarter" in datetime_list:
        out["quarter"] = dt.quarter.astype(np.int8)
    if "month_year" in datetime_list:
        yy = (dt.year % 100).astype(str).str.zfill(2)
        mm = dt.month.astype(str).str.zfill(2)
        out["month_year"] = yy + "M" + mm
    if "quarter_year" in datetime_list:
        yy = (dt.year % 100).astype(str).str.zfill(2)
        out["quarter_year"] = yy + "Q" + dt.quarter.astype(str)
    for name in datetime_list:  # preserve requested order
        batch[name] = out[name]
    return batch


def downcast_plan(stats: dict[str, tuple]) -> dict[str, str]:
    """M10: choose the narrowest lossless integer type per column given
    (min, max) stats. Floats stay float64 (bit-exactness of the Gorilla path
    and tier values trumps the reference's lossy float32 downcast)."""
    plan = {}
    for col, (lo, hi) in stats.items():
        if lo is None or hi is None:
            continue
        for dt in (np.int8, np.int16, np.int32, np.int64):
            info = np.iinfo(dt)
            if info.min <= lo and hi <= info.max:
                plan[col] = np.dtype(dt).name
                break
    return plan


def extract_json_int(ds, col: str, key: str, out_name: str | None = None):
    """Pull an integer field out of a JSON-string column with ONE vectorized
    regex pass (``Series.str.extract`` — no per-row json.loads in the hot
    path). Contract: the field is a flat top-level integer (the shape of
    event property bags like ``{"k": 69}``); rows without the field yield
    pandas NA. SQL twin: ``CAST(json_extract(col, '$.key') AS BIGINT)``.

    For nested/typed payloads use an actor-pool stage with a real parser;
    this is the fast path for the overwhelmingly common flat case."""
    import re

    out = out_name or key
    pat = re.compile(r'"' + re.escape(key) + r'"\s*:\s*(-?\d+)')

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[out] = b[col].str.extract(pat, expand=False).astype("Int64")
        return b

    return ds.map_batches(fn, batch_format="pandas")
