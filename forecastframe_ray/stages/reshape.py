"""Reshape stages: pivot (long → wide) and melt (wide → long).

The reference materializes wide per-series feature matrices before modeling
(its pandas frames are implicitly wide); on Ray Data the long form is the
scale-native layout, so these two stages convert at the boundary.

``pivot_wide`` is ONE combiner pass + ONE coarse-hash merge: each batch
emits one column per category (value where the pivot column matches, else
null), then the merge folds partial rows per index key with a null-skipping
``max`` — no per-group task, no driver materialization. The category set
must be known (small by contract — it becomes the column axis); pass it
explicitly or let ``distinct_categories`` compute it with a tiny distinct
aggregate first.

``melt_long`` is a stateless ``map_batches`` (no shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from forecastframe_ray.stages.agg import hash_aggregate


def distinct_categories(ds, col: str, num_partitions: int = 16) -> list:
    """Small-cardinality distinct values of ``col`` (the future column axis),
    sorted for deterministic column order."""
    from forecastframe_ray.stages.agg import hash_count

    vals = hash_count(ds, [col], out_col="__n",
                      num_partitions=num_partitions).to_pandas()[col]
    return sorted(vals.tolist())


def _col_name(prefix: str, cat) -> str:
    return f"{prefix}{cat}"


def pivot_wide(ds, index_keys: list[str], pivot_col: str, value_col: str,
               categories: list, prefix: str | None = None,
               num_partitions: int = 32):
    """Long → wide: one output row per distinct ``index_keys``, one column
    per category holding that row's ``value_col`` (null when absent).
    Requires (index_keys, pivot_col) to be unique — the frame PK contract;
    duplicate cells would silently fold with ``max``, so callers needing
    dup detection should ``validate_primary_key`` first."""
    prefix = f"{value_col}_" if prefix is None else prefix
    cats = list(categories)
    names = [_col_name(prefix, c) for c in cats]

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        out = b[index_keys].copy()
        pv = b[pivot_col].to_numpy()
        v = b[value_col].to_numpy(dtype=np.float64)
        for c, name in zip(cats, names):
            out[name] = np.where(pv == c, v, np.nan)
        return out

    wide = ds.map_batches(widen, batch_format="pandas")
    plan = {name: (name, "max") for name in names}  # null-skipping fold
    return hash_aggregate(wide, list(index_keys), plan, num_partitions)


def melt_long(ds, index_keys: list[str], value_cols: list[str],
              var_name: str = "variable", value_name: str = "value",
              drop_null: bool = False):
    """Wide → long: each row fans out to one row per value column. Stateless
    vectorized ``pd.melt`` per batch — no shuffle, streams at any scale."""
    cols = list(value_cols)

    def narrow(b: pd.DataFrame) -> pd.DataFrame:
        out = b.melt(id_vars=index_keys, value_vars=cols,
                     var_name=var_name, value_name=value_name)
        if drop_null:
            out = out[out[value_name].notna()]
        return out

    return ds.map_batches(narrow, batch_format="pandas")


def union_by_name(datasets: list, fill=None):
    """Schema-evolution union: concatenate Datasets whose schemas differ
    (columns added/dropped across file versions — the standard lakehouse
    read problem; reference has no analog, this is engine surface). The
    target schema is the NAME-ordERED union of all input columns; each
    side gets its missing columns appended as ``fill`` (default None →
    null) inside a vectorized map_batches, then the blocks union without
    any shuffle. Column dtype reconciliation is Arrow's (union of null +
    typed promotes to typed)."""
    all_cols: list[str] = []
    for ds in datasets:
        for name in ds.schema().names:
            if name not in all_cols:
                all_cols.append(name)
    target = sorted(all_cols)

    def conform(b: pd.DataFrame) -> pd.DataFrame:
        for c in target:
            if c not in b.columns:
                b[c] = fill
        return b[target]

    out = datasets[0].map_batches(conform, batch_format="pandas")
    for ds in datasets[1:]:
        out = out.union(ds.map_batches(conform, batch_format="pandas"))
    return out
