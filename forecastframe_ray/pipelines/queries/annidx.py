"""Oracled query catalog — persisted incremental ANN index entries
(:mod:`forecastframe_ray.pipelines.ann_index`).

- ``ann_index_search_embeddings`` — build the centroid-partitioned index
  incrementally (two shards split at the median vec_id), then search with
  ``nprobe == num_centroids``: probing everything makes IVF EXACT, so the
  result through the persisted-index read path (pruned file list →
  streamed exact cosine) carries the same full DuckDB value oracle as the
  brute-force entry.
- ``ann_index_incremental_gate`` — appended == rebuilt-with-the-same-
  frozen-centroids (search results compared exactly at partial and full
  probes, ids+ranks — cos_sim's last float bits vary with layout) AND
  partial-probe (nprobe=8 of 16, the ``ann_ivf_recall`` setting) recall
  ≥0.9 vs brute force; constant-shape
  oracle row flips on any miss (the ``ann_ivf_recall`` gate pattern).
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd

from forecastframe_ray.pipelines import similarity
from forecastframe_ray.pipelines.queries.spine import (
    SQL_ANN_BRUTEFORCE,
    _query_vectors,
    _read,
)

SQL_ANN_INDEX_SEARCH = SQL_ANN_BRUTEFORCE


def _split(sf_dir: str):
    import pyarrow.parquet as pq
    ids = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id"])["vec_id"].to_numpy()
    cut = int(np.median(ids))
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    sh1 = emb.map_batches(
        lambda b: b[b["vec_id"].to_numpy() <= cut], batch_format="pandas")
    sh2 = emb.map_batches(
        lambda b: b[b["vec_id"].to_numpy() > cut], batch_format="pandas")
    return emb, sh1, sh2


def q_ann_index_search_embeddings(sf_dir: str) -> pd.DataFrame:
    from forecastframe_ray.pipelines import ann_index as AI

    _emb, sh1, sh2 = _split(sf_dir)
    d = tempfile.mkdtemp(prefix="ffr_annidx_", dir="/tmp")
    try:
        AI.build_ann_index(sh1, d, num_centroids=16)
        AI.append_ann(sh2, d)
        top = AI.search_ann(d, _query_vectors(sf_dir), k=10, nprobe=16)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    top["query_ix"] = top["query_ix"].astype("int64")
    top["rank"] = top["rank"].astype("int64")
    return top[["query_ix", "rank", "vec_id"]].reset_index(drop=True)


def q_ann_index_incremental_gate(sf_dir: str) -> pd.DataFrame:
    from forecastframe_ray.pipelines import ann_index as AI

    emb, sh1, sh2 = _split(sf_dir)
    q = _query_vectors(sf_dir)
    inc = tempfile.mkdtemp(prefix="ffr_annI_", dir="/tmp")
    full = tempfile.mkdtemp(prefix="ffr_annF_", dir="/tmp")
    try:
        AI.build_ann_index(sh1, inc, num_centroids=16)
        AI.append_ann(sh2, inc)
        C = AI._load_meta(inc)["centroids"]
        AI.build_ann_index(emb, full, centroids=C)
        ok = True
        for nprobe in (4, 16):
            # content equality: ids+ranks (cos_sim floats differ in last
            # bits with file/batch layout — sum-order noise, not content)
            a = AI.search_ann(inc, q, 10, nprobe).reset_index(drop=True)
            b = AI.search_ann(full, q, 10, nprobe).reset_index(drop=True)
            ok = ok and a[["query_ix", "rank", "vec_id"]].equals(
                b[["query_ix", "rank", "vec_id"]])
        hits = AI.search_ann(inc, q, 10, nprobe=8)
        brute = similarity.brute_force_topk(emb, q, k=10)
        got = set(zip(hits["query_ix"].astype(int), hits["vec_id"]))
        want = set(zip(brute["query_ix"].astype(int), brute["vec_id"]))
        recall = len(got & want) / max(len(want), 1)
        ok = ok and recall >= 0.9
    finally:
        shutil.rmtree(inc, ignore_errors=True)
        shutil.rmtree(full, ignore_errors=True)
    return pd.DataFrame({"gate": pd.Series([0], dtype="int64"),
                         "match_ok": pd.Series([ok], dtype="bool")})


SQL_ANN_INDEX_GATE = """
    SELECT CAST(0 AS BIGINT) AS gate, true AS match_ok
"""
