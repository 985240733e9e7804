"""Globally-consistent ordinal encoding of categoricals (SURVEY.md M6/M7).

The reference encodes via pandas ``category`` codes — code = position of the
value in the lexicographically-sorted category list (transform.py:367-396,
pinned by tests/test_transform.py:122-144). Distributed equivalent: one
distinct scan per column (``ds.unique`` — a shuffle over the already-tiny
distinct sets), sort on the driver, broadcast the value→code dict into a
single ``map_batches``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def string_columns(ds) -> list[str]:
    s = ds.schema()
    out = []
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                out.append(n)
        elif t is object or t is str:  # pandas-block columns surface as object
            out.append(n)
    return out


def fit_categories(ds, columns: list[str]) -> dict[str, dict[int, str]]:
    """code→value dict per column (reference ``categorical_keys``, main.py:47)."""
    keys = {}
    for col in columns:
        cats = sorted(v for v in ds.unique(col) if v is not None)
        keys[col] = dict(enumerate(cats))
    return keys


def encode_batch_fn(categorical_keys: dict[str, dict[int, str]]):
    maps = {col: {v: c for c, v in d.items()} for col, d in categorical_keys.items()}

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        for col, m in maps.items():
            # unseen value → -1, the pandas cat.codes NaN convention
            batch[col] = batch[col].map(m).fillna(-1).astype("int32")
        return batch

    return fn


def decode_batch_fn(categorical_keys: dict[str, dict[int, str]]):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        for col, d in categorical_keys.items():
            batch[col] = batch[col].map(d)
        return batch

    return fn
