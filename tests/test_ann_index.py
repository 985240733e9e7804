"""Persisted incremental ANN index (pipelines/ann_index.py): full-probe
exactness vs brute force, appended == rebuilt-with-same-centroids,
file-level probe pruning of the centroid-partitioned layout, and
crash-retry idempotence."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from forecastframe_ray.pipelines import ann_index as AI
from forecastframe_ray.pipelines import similarity as S

SF = "/root/testdata/sf0.001"


def _emb():
    import pyarrow.parquet as pq
    df = pq.read_table(f"{SF}/embeddings.parquet",
                       columns=["vec_id", "embedding"]).to_pandas()
    return df.sort_values("vec_id").reset_index(drop=True)


def _queries(df):
    return np.stack(df.loc[df["vec_id"].isin([0, 1]), "embedding"]
                    .to_numpy())


def test_full_probe_equals_brute_force(tmp_path):
    df = _emb()
    ds = ray.data.from_pandas(df)
    d = str(tmp_path / "idx")
    AI.build_ann_index(ds, d, num_centroids=8)
    q = _queries(df)
    got = AI.search_ann(d, q, k=10, nprobe=8)
    want = S.brute_force_topk(ds, q, k=10)
    for df_ in (got, want):
        df_["query_ix"] = df_["query_ix"].astype("int64")
        df_["rank"] = df_["rank"].astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["query_ix", "rank", "vec_id"]],
        want.reset_index(drop=True)[["query_ix", "rank", "vec_id"]])


def test_append_equals_rebuild_with_same_centroids(tmp_path):
    df = _emb()
    cut = int(df["vec_id"].median())
    sh1 = ray.data.from_pandas(df[df["vec_id"] <= cut])
    sh2 = ray.data.from_pandas(df[df["vec_id"] > cut])
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    AI.build_ann_index(sh1, inc, num_centroids=8)
    AI.append_ann(sh2, inc)
    C = AI._load_meta(inc)["centroids"]
    AI.build_ann_index(ray.data.from_pandas(df), full, centroids=C)
    from forecastframe_ray.pipelines.queries.annidx import _same_topk
    q = _queries(df)
    for nprobe in (2, 8):
        a = AI.search_ann(inc, q, 10, nprobe)
        b = AI.search_ann(full, q, 10, nprobe)
        # tie-tolerant: block layouts differ → last-bit cos_sim noise can
        # legally swap near-equal neighbors (see annidx._same_topk)
        assert _same_topk(a, b)


def test_probe_pruning_layout(tmp_path):
    """Partition files are keyed by centroid id: a probed search's file
    list is a strict subset, and each file holds only its centroid."""
    import pyarrow.parquet as pq
    df = _emb()
    d = str(tmp_path / "idx")
    AI.build_ann_index(ray.data.from_pandas(df), d, num_centroids=8)
    tier = os.path.join(d, "tier=vectors")
    files = sorted(os.listdir(tier))
    assert 1 < len(files) <= 8
    for f in files:
        part = int(f[len("part="):-len(".parquet")])
        cent = pq.read_table(os.path.join(tier, f),
                             columns=["centroid"])["centroid"].to_numpy()
        assert (cent == part).all()


def test_append_crash_retry(tmp_path):
    df = _emb()
    cut = int(df["vec_id"].median())
    sh1 = ray.data.from_pandas(df[df["vec_id"] <= cut])
    sh2 = ray.data.from_pandas(df[df["vec_id"] > cut])
    clean, crash = str(tmp_path / "clean"), str(tmp_path / "crash")
    AI.build_ann_index(sh1, clean, num_centroids=8)
    AI.append_ann(sh2, clean, shard_id="shard-001")
    q = _queries(df)
    want = AI.search_ann(clean, q, 10, 8)

    AI.build_ann_index(sh1, crash, num_centroids=8)
    with pytest.raises(RuntimeError, match="simulated crash"):
        AI.append_ann(sh2, crash, shard_id="shard-001", fail_after=1)
    assert AI._load_meta(crash)["shards"] == ["shard-000"]
    AI.append_ann(sh2, crash, shard_id="shard-001")
    pd.testing.assert_frame_equal(want, AI.search_ann(crash, q, 10, 8))
