"""Flagship web pipeline: exact tier-value match vs the pandas oracle,
cascade exactness (1d from 1h, 7d from 1d), checkpoint/resume byte-identity."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data

from forecastframe_ray import synth
from forecastframe_ray.pipelines import web
from forecastframe_ray.state import checkpoint

N_PAGES = 3000
TIER_COLS = ["host", "bucket_us", "pages", "bytes", "sum_val", "min_val",
             "max_val", "sum_sq", "mean_val", "std_val"]


@pytest.fixture(scope="module")
def tier_results(ray_session):
    pages = synth.pages_dataset(N_PAGES, seed=42, num_domains=60, override_num_blocks=6)
    prepared = web.prepare_pages(pages)
    tiers = web.build_tiers(prepared, ("host",), num_salts=4)
    got = {t: ds.to_pandas().sort_values(["host", "bucket_us"]).reset_index(drop=True)
           for t, ds in tiers.items()}
    oracle = web.oracle_tiers(synth.pages_table(N_PAGES, seed=42, num_domains=60).to_pandas())
    return got, oracle


@pytest.mark.parametrize("tier", ["1h", "1d", "7d"])
def test_tiers_exact_match_oracle(tier_results, tier):
    got, oracle = tier_results
    g, o = got[tier][TIER_COLS], oracle[tier][TIER_COLS]
    assert len(g) == len(o), (tier, len(g), len(o))
    assert (g["host"].values == o["host"].values).all()
    assert (g["bucket_us"].values == o["bucket_us"].values).all()
    for col in TIER_COLS[2:]:
        a = g[col].to_numpy(dtype=np.float64)
        b = o[col].to_numpy(dtype=np.float64)
        same_nan = np.isnan(a) == np.isnan(b)
        assert same_nan.all(), (tier, col)
        mask = ~np.isnan(a)
        if col in ("std_val", "mean_val"):
            np.testing.assert_allclose(a[mask], b[mask], rtol=1e-9, atol=1e-9)
        else:
            np.testing.assert_array_equal(a[mask], b[mask])  # exact


def test_cascade_consistency(tier_results):
    got, _ = tier_results
    # total pages/bytes identical across tiers (algebraic cascade is exact)
    for col in ("pages", "bytes", "sum_val"):
        v1, v2, v3 = (got[t][col].sum() for t in ("1h", "1d", "7d"))
        assert v1 == v2 == v3


def test_checkpoint_resume_byte_identical(ray_session, tmp_path):
    pages = synth.pages_dataset(800, seed=42, num_domains=30, override_num_blocks=4)
    tiers = web.build_tiers(web.prepare_pages(pages), ("host",), num_salts=2)

    full_dir = str(tmp_path / "full")
    web.write_tiers({"1h": tiers["1h"]}, full_dir, num_partitions=8)

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="simulated crash"):
        web.write_tiers({"1h": tiers["1h"]}, crash_dir, num_partitions=8, fail_after=3)
    done_before = checkpoint.load_done(crash_dir)
    assert len(done_before) == 3
    # resume: completes only the missing partitions
    rows = web.write_tiers({"1h": tiers["1h"]}, crash_dir, num_partitions=8)
    assert {r["part"] for r in rows}.isdisjoint({p for (_, p) in done_before})

    # final output byte-identical to the uninterrupted run
    for part_file in sorted(os.listdir(os.path.join(full_dir, "tier=1h"))):
        a = open(os.path.join(full_dir, "tier=1h", part_file), "rb").read()
        b = open(os.path.join(crash_dir, "tier=1h", part_file), "rb").read()
        assert a == b, part_file

    # manifest checksums agree partition-by-partition
    full_manifest = checkpoint.load_done(full_dir)
    crash_manifest = checkpoint.load_done(crash_dir)
    assert {k: v["checksum"] for k, v in full_manifest.items()} == \
           {k: v["checksum"] for k, v in crash_manifest.items()}


def test_full_run_with_compression(ray_session, tmp_path):
    pages = synth.pages_dataset(1500, seed=42, num_domains=40, override_num_blocks=4)
    metrics = web.run(pages, out_dir=None, num_salts=2, compress=True)
    assert metrics["total_points"] > 0
    assert metrics["tier_points"]["1h"] >= metrics["tier_points"]["1d"] >= metrics["tier_points"]["7d"]
    cs = metrics["chunk_stats"]
    assert cs["payload_bytes"] < cs["raw_bytes"]  # regular buckets compress

    # chunk roundtrip: decode == 1h pages series exactly
    from forecastframe_ray.stages import gorilla
    tiers = web.build_tiers(web.prepare_pages(
        synth.pages_dataset(1500, seed=42, num_domains=40, override_num_blocks=4)), num_salts=2)
    chunks = web.compress_tier(tiers["1h"], ("host",), "1h", "pages")
    back = gorilla.decode_chunk_dataset(chunks, ["host"], ts_col="bucket_us",
                                        value_col="pages").to_pandas()
    src = tiers["1h"].to_pandas()
    a = src.sort_values(["host", "bucket_us"]).reset_index(drop=True)
    b = back.sort_values(["host", "bucket_us"]).reset_index(drop=True)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["pages"].to_numpy(dtype=np.float64),
                                  b["pages"].to_numpy(dtype=np.float64))


def test_distinct_host_tiers_exact_at_small_scale(tmp_path):
    """distinct_host_tiers over the synthetic corpus: every tier bucket's
    sketch is in the exact regime at this scale and must equal pandas
    nunique of hosts per bucket, with the 1d tier produced by sketch
    MERGE from 1h (not a re-read)."""
    import pandas as pd

    from forecastframe_ray import synth
    from forecastframe_ray.keys import TIER_US
    from forecastframe_ray.pipelines import web

    pages = synth.pages_dataset(8000, seed=11)
    prepared = web.prepare_series(pages)
    spine = prepared.to_pandas()
    tiers = web.distinct_host_tiers(prepared, k=4096, num_partitions=4)
    for tier in ("1h", "1d", "7d"):
        got = tiers[tier].to_pandas().sort_values("bucket_us") \
            .reset_index(drop=True)
        assert bool(got["is_exact"].all())
        us = spine["warc_ts"].astype("datetime64[us]").astype("int64")
        exact = spine.assign(
            bucket_us=(us // TIER_US[tier]) * TIER_US[tier]) \
            .groupby("bucket_us")["host"].nunique()
        assert len(got) == len(exact)
        for r in got.itertuples(index=False):
            assert r.distinct_est == exact.loc[r.bucket_us]
