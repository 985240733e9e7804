"""Frame persistence + plan replay (SURVEY.md §2.1 S2/S3, §3.3).

The reference pickles the whole ``ForecastFrame`` object — data, recorded
plan, scaler state (``/root/reference/forecastframe/io.py:9-40``). Ours is
the scale-safe analog: the data as partitioned Parquet (written distributed,
resumable) plus a small JSON manifest carrying everything non-data —
hierarchy/datetime/target, the recorded logical plan (``function_list`` /
``scalers_list``), fitted scaler constants (``transforms``), and categorical
dictionaries. No pickle anywhere.

``replay`` is the reference's record/replay phase
(``/root/reference/forecastframe/model.py:550-628``): apply the recorded
scaler pipeline then every recorded feature-engineering call, by name, to a
fresh frame over new data.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

import numpy as np
import pandas as pd


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    # timestamps (e.g. a release-dates dim table recorded for replay) → ISO
    # strings; the recorded per-column dtypes restore them on load
    if obj is pd.NaT:
        return None
    if isinstance(obj, (pd.Timestamp, _dt.datetime, _dt.date)):
        return obj.isoformat()
    if isinstance(obj, np.datetime64):
        return pd.Timestamp(obj).isoformat()
    if isinstance(obj, (pd.Timedelta, _dt.timedelta)):
        return pd.Timedelta(obj).isoformat()
    return obj


def save_frame(fr, path: str) -> None:
    """Write ``fr.dataset`` as Parquet under ``path/data`` + manifest JSON."""
    os.makedirs(path, exist_ok=True)
    # dictionary-encoded + zstd data files (reference compress()'s
    # object→category parity at the storage layer; transform.py:30-33)
    fr.dataset.write_parquet(
        os.path.join(path, "data"),
        arrow_parquet_args_fn=lambda: {"use_dictionary": True,
                                       "compression": "zstd"})
    manifest = {
        "datetime_column": fr.datetime_column,
        "target": fr.target,
        "hierarchy": fr.hierarchy,
        "num_partitions": fr.num_partitions,
        "transforms": _jsonable(fr.transforms),
        "categorical_keys": {
            col: list(d.items()) for col, d in fr.categorical_keys.items()
        },
        "function_list": _jsonable(fr.function_list),
        "scalers_list": _jsonable(fr.scalers_list),
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def load_frame(path: str):
    """Rebuild a frame from :func:`save_frame` output (lazy Parquet read)."""
    from forecastframe_ray.frame import RayForecastFrame

    with open(os.path.join(path, "manifest.json")) as f:
        m = json.load(f)
    fr = RayForecastFrame(
        os.path.join(path, "data"),
        datetime_column=m["datetime_column"], target=m["target"],
        hierarchy=m["hierarchy"], num_partitions=m["num_partitions"],
    )
    fr.transforms = m["transforms"]
    fr.categorical_keys = {
        col: {int(c): v for c, v in pairs} for col, pairs in m["categorical_keys"].items()
    }
    fr.function_list = [(name, kwargs) for name, kwargs in m["function_list"]]
    fr.scalers_list = [(name, kwargs) for name, kwargs in m["scalers_list"]]
    return fr


_SCALER_METHODS = {
    "log1p": "log_features",
    "standardize": "standardize_features",
    "normalize": "normalize_features",
}


def replay(fr, data, num_partitions: int | None = None):
    """Apply ``fr``'s recorded plan to new ``data``: scalers (re-fit on the
    new data, like ``_run_scaler_pipeline``) then every recorded
    feature-engineering call in order (``_run_feature_engineering``).
    Returns the new frame."""
    from forecastframe_ray.frame import RayForecastFrame

    out = RayForecastFrame(
        data, datetime_column=fr.datetime_column, target=fr.target,
        hierarchy=fr.hierarchy,
        num_partitions=num_partitions or fr.num_partitions,
    )
    for name, kwargs in fr.scalers_list:
        getattr(out, _SCALER_METHODS[name])(**kwargs)
    for name, kwargs in fr.function_list:
        getattr(out, name)(**kwargs)
    return out


def load_table(path: str, columns: list[str] | None = None,
               filter_expr=None):
    """Pushdown-aware parquet read — the S1 production entry point for big
    tables: ``columns`` prunes at the column-chunk level and ``filter_expr``
    (a ``pyarrow.dataset`` expression, e.g. ``pc.field("ts") >= cutoff``)
    prunes row groups via footer statistics BEFORE bytes leave storage and
    filters the surviving fragments during the scan. At 100 TB this is the
    difference between scanning a day and scanning the archive: a read that
    loads all columns/rows for a filtered two-column transform is wrong.
    Returns a lazy ``ray.data.Dataset``."""
    import ray.data

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    return ray.data.read_parquet(path, **kwargs)
