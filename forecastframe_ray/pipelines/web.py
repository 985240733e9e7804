"""The flagship web pipeline (north_star): Common-Crawl-style pages →
deterministic text extraction → url-hierarchy keys → per-host crawl-rate
series → exact 1h/1d/7d retention tiers → gap-filled feature series →
Gorilla-compressed chunks, with partition-granular checkpoint/resume.

Every stage is a lazy Ray Data transform; the only materializations are the
(small) tier tables and the driver-side manifest."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from forecastframe_ray import extract
from forecastframe_ray import keys as K
from forecastframe_ray.pipelines import rollup
from forecastframe_ray.stages import gorilla
from forecastframe_ray.state import checkpoint


def prepare_pages(pages_ds, extract_html: bool = True):
    """pages → pages + (host, domain, tld, text_bytes). Stateless Arrow maps."""
    if extract_html:
        pages_ds = pages_ds.map_batches(extract.extract_text_batch, batch_format="pyarrow")

    def keys_fn(batch: pa.Table) -> pa.Table:
        parts = K.split_url(batch["url"])
        for name, arr in parts.items():
            batch = batch.append_column(name, arr)
        tb = pc.binary_length(batch["text"].cast(pa.binary()))
        return batch.append_column("text_bytes", tb.cast(pa.int64()))

    return pages_ds.map_batches(keys_fn, batch_format="pyarrow")


def prepare_series(pages_ds, extract_html: bool = True):
    """The slim spine: extract + url keys + projection fused into ONE
    ``map_batches`` so the fat ``html``/``text`` columns never cross an
    operator boundary (inter-operator blocks are 3 small columns — the
    store-bandwidth term that otherwise does not scale with CPUs)."""

    def fn(batch: pa.Table) -> pa.Table:
        if extract_html:
            batch = extract.extract_text_batch(batch, "html", "text")
        host = K.split_url(batch["url"])["host"]
        tb = pc.binary_length(batch["text"].cast(pa.binary())).cast(pa.int64())
        return pa.table({
            "host": host, "warc_ts": batch["warc_ts"], "text_bytes": tb,
        })

    return pages_ds.map_batches(fn, batch_format="pyarrow")


def build_tiers(prepared, series_keys=("host",), num_salts: int = 16) -> dict:
    """Exact per-(host, bucket) tier tables: pages count, bytes, and value
    stats over ``text_bytes`` (the per-bucket crawl-rate series)."""
    cols = set(prepared.schema().names)
    need = list(series_keys) + ["warc_ts", "text_bytes"]
    slim = prepared.select_columns(need) if set(need) < cols else prepared
    return rollup.rollup_tiers(
        slim, list(series_keys), "warc_ts",
        value_col="text_bytes", size_col="text_bytes", num_salts=num_salts,
    )


def tier_points(tiers: dict) -> dict[str, int]:
    return {t: ds.count() for t, ds in tiers.items()}


def write_tiers(tiers: dict, out_dir: str, series_keys=("host",),
                num_partitions: int = 32, fail_after: int | None = None):
    """Checkpointed tier writes; resume skips completed (tier, part) pairs."""
    rows = []
    for tier, ds in tiers.items():
        rows += checkpoint.write_partitioned(
            ds, out_dir, tier, list(series_keys), num_partitions=num_partitions,
            sort_cols=list(series_keys) + ["bucket_us"],
            fail_after=fail_after,
        )
    return rows


def refresh_chunks(out_dir: str, parts: set, series_keys=("host",),
                   tier: str = "1h", value_col: str = "pages",
                   num_partitions: int = 32) -> list[dict]:
    """Re-encode the Gorilla chunk tier for the PARTITIONS whose source
    tier files changed (an incremental append's return value names them).
    Chunk rows derive wholly from their own tier partition's content and
    both layouts hash the same ``series_keys`` into the same
    ``num_partitions``, so rewriting exactly those chunk partitions
    (``overwrite_parts``) restores chunks == encode(full tier) without
    touching — or reading — any other partition."""
    import os

    import ray.data

    files = [os.path.join(out_dir, f"tier={tier}", f"part={p}.parquet")
             for p in sorted(parts)]
    files = [f for f in files if os.path.exists(f)]
    if not files:
        return []
    subset = ray.data.read_parquet(files)
    chunks = compress_tier(subset, series_keys, tier, value_col,
                           num_partitions)
    return checkpoint.write_partitioned(
        chunks, out_dir, f"chunks_{tier}", list(series_keys),
        num_partitions=num_partitions, sort_cols=list(series_keys),
        overwrite_parts=set(parts))


def append_tiers(pages_ds, out_dir: str, delta_id: str,
                 series_keys=("host",), num_salts: int = 16,
                 num_partitions: int = 32,
                 refresh_compressed: bool = False,
                 value_col: str = "pages") -> list[dict]:
    """Continuous-aggregate maintenance: fold a NEW batch of pages (e.g.
    today's crawl) into an existing checkpointed tier store without
    rebuilding it. The delta's own 1h/1d/7d tier tables are built with the
    normal cascade (tiny relative to the corpus), then merged into the
    stored tiers partition-granularly via the algebraic
    (count, sum, min, max, Σx²) carry — the result is EXACTLY the tiers a
    full rebuild over old+new pages would produce (pinned by
    ``tests/test_incremental_tiers.py`` and the
    ``tier_incremental_1d_events`` driver oracle).

    ``delta_id`` names the batch for idempotence: re-running the same
    append after a crash skips partitions already merged for it.
    ``refresh_compressed`` additionally re-encodes the Gorilla chunk tier
    for exactly the 1h partitions this append rewrote."""
    prepared = (prepare_series(pages_ds) if tuple(series_keys) == ("host",)
                else prepare_pages(pages_ds))
    delta = build_tiers(prepared, series_keys, num_salts)
    rows = []
    for tier, ds in delta.items():
        rows += checkpoint.merge_partitioned(
            ds, out_dir, tier, list(series_keys),
            list(series_keys) + ["bucket_us"], rollup.TIER_PLAN,
            delta_id=delta_id, num_partitions=num_partitions,
            sort_cols=list(series_keys) + ["bucket_us"],
            finalize_fn=lambda df, tier=tier:
                rollup.finalize_tier_batch(df, tier))
    if refresh_compressed:
        touched = {r["part"] for r in rows if r["tier"] == "1h"}
        rows += refresh_chunks(out_dir, touched, series_keys, "1h",
                               value_col, num_partitions)
    return rows


def compress_tier(tier_ds, series_keys=("host",), tier: str = "1h",
                  value_col: str = "pages", num_partitions: int = 32):
    """Gorilla-encode one tier's (host → bucket series) into chunk rows."""
    slim = tier_ds.map_batches(
        lambda b: b[list(series_keys) + ["bucket_us", value_col]].copy(),
        batch_format="pandas",
    )
    # small pool (sized by encode_series_dataset to leave CPU headroom):
    # chunk rows ≈ #series, so encode work per tier is tiny relative to the
    # spine — a large autoscaling pool only pays startup.
    return gorilla.encode_series_dataset(
        slim, list(series_keys), "bucket_us", value_col,
        tier=tier, num_partitions=min(32, num_partitions), concurrency=None,
    )


def run(pages_ds, out_dir: str | None = None, series_keys=("host",),
        num_salts: int = 16, num_partitions: int = 32,
        compress: bool = True) -> dict:
    """End-to-end flagship run. Returns metrics incl. the north-star
    rolled-up points/sec across tiers."""
    t_start = time.perf_counter()
    prepared = (prepare_series(pages_ds) if tuple(series_keys) == ("host",)
                else prepare_pages(pages_ds))
    tiers = build_tiers(prepared, series_keys, num_salts)
    points = tier_points(tiers)

    if out_dir:
        write_tiers(tiers, out_dir, series_keys, num_partitions)

    chunk_stats = None
    if compress:
        chunks = compress_tier(tiers["1h"], series_keys, "1h", "pages", num_partitions)
        if out_dir:
            chunk_rows = checkpoint.write_partitioned(
                chunks, out_dir, "chunks_1h", list(series_keys),
                num_partitions=num_partitions, sort_cols=list(series_keys),
            )
            chunk_stats = {"chunks": int(sum(r["rows"] for r in chunk_rows))}
        else:
            cdf = chunks.to_pandas()
            payload = int(cdf["ts_payload"].map(len).sum() + cdf["val_payload"].map(len).sum())
            chunk_stats = {
                "chunks": len(cdf),
                "payload_bytes": payload,
                "raw_bytes": int(cdf["n_points"].sum()) * 16,
            }

    wall = time.perf_counter() - t_start
    total_points = int(sum(points.values()))
    return {
        "tier_points": points,
        "total_points": total_points,
        "wall_s": round(wall, 3),
        "points_per_sec": round(total_points / wall, 1),
        "chunk_stats": chunk_stats,
    }


# ---------------------------------------------------------------------------
# pandas oracle (tests): reference-semantics tiers computed single-node
# ---------------------------------------------------------------------------

def oracle_tiers(pages_df: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Exact expected tier values from raw pages with plain pandas, using the
    same (count,sum,min,max,Σx²) definitions. ``text`` must be the extracted
    text (byte-identity is asserted separately)."""
    df = pages_df.copy()
    host = df["url"].str.replace(r"^[a-z][a-z0-9+.-]*://", "", regex=True) \
        .str.replace(r"[/:?#].*$", "", regex=True)
    df["host"] = host
    df["text_bytes"] = df["text"].str.encode("utf-8").str.len().astype("int64")
    ts_us = df["warc_ts"].astype("datetime64[us]").astype("int64")
    out = {}
    for tier, width in K.TIER_US.items():
        b = (ts_us // width) * width
        g = df.assign(bucket_us=b).groupby(["host", "bucket_us"])["text_bytes"]
        agg = g.agg(pages="count", bytes="sum", sum_val="sum", min_val="min",
                    max_val="max").reset_index()
        agg["sum_sq"] = g.apply(lambda x: float(np.sum(np.square(x, dtype=np.float64)))).values
        agg["pages"] = agg["pages"].astype(np.float64)
        agg["bytes"] = agg["bytes"].astype(np.float64)
        n = agg["pages"].to_numpy()
        s = agg["sum_val"].to_numpy(dtype=np.float64)
        ss = agg["sum_sq"].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            agg["mean_val"] = s / n
            var = np.where(n > 1, (ss - s * s / n) / (n - 1), np.nan)
        agg["std_val"] = np.sqrt(np.maximum(var, 0.0))
        out[tier] = agg.sort_values(["host", "bucket_us"]).reset_index(drop=True)
    return out


def distinct_host_tiers(prepared, k: int = 4096,
                        num_partitions: int = 32) -> dict:
    """Distinct crawled hosts per retention bucket — the continuous
    aggregate the exact tier spine cannot carry (COUNT(DISTINCT) is not
    algebraic): per-1h KMV sketches over the slim spine, cascaded 1h→1d→7d
    by pure sketch merge (stages/sketch.py). Shuffle traffic is
    O(buckets × k × 8 B) regardless of corpus size; at 10^12 pages the 1h
    tier is ~9k buckets/year → a few hundred MB of sketch rows total."""
    from forecastframe_ray.stages.sketch import distinct_tiers

    return distinct_tiers(prepared, "warc_ts", "host",
                          k=k, num_partitions=num_partitions)
