"""Partition-granular checkpoint manifest: lineage + metrics + resume
(SURVEY.md §4 "Checkpoint / resume"; replaces the reference's whole-object
pickle, ``/root/reference/forecastframe/io.py:9-40``).

Output layout: ``out/tier=<1h|1d|7d|chunks>/part=<k>.parquet`` — one file per
hash-bucket partition, written atomically (temp file + rename). A JSON-lines
manifest at ``out/manifest.jsonl`` records one row per completed partition:
``(tier, part, rows, points, checksum, wall_s, fingerprint)``. On resume,
completed ``(tier, part)`` pairs are filtered from the input *before* any
compute, so a rerun only pays for missing partitions.

Single-node note: files land on the local filesystem; on a real cluster the
same layout goes to shared storage (s3/nfs) — the atomic-rename is then a
temp-key + final-key copy. The manifest is driver-written (tiny).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from forecastframe_ray import keys as K
from forecastframe_ray.stages.keyed import PART_COL

MANIFEST = "manifest.jsonl"


def load_done(out_dir: str) -> dict[tuple[str, int], dict]:
    path = os.path.join(out_dir, MANIFEST)
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    row = json.loads(line)
                    done[(row["tier"], int(row["part"]))] = row
    return done


def append_manifest(out_dir: str, rows: list[dict]):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, MANIFEST), "a") as f:
        for row in rows:
            f.write(json.dumps(row, sort_keys=True) + "\n")


def _partition_checksum(df: pd.DataFrame) -> int:
    # list/array columns (e.g. an ANN index's embedding vectors) are
    # unhashable for hash_pandas_object — fold them in as raw bytes
    plain, arrays = [], []
    for c in df.columns:
        v = df[c]
        first = v.iloc[0] if len(v) else None
        if v.dtype == object and isinstance(first, (np.ndarray, list)):
            arrays.append(v)
        else:
            plain.append(c)
    crc = 0
    if plain:
        h = pd.util.hash_pandas_object(df[plain], index=False) \
            .to_numpy(dtype=np.uint64)
        crc = zlib.crc32(h.tobytes(), crc)
    for v in arrays:
        for x in v:
            crc = zlib.crc32(np.asarray(x, dtype=np.float64).tobytes(), crc)
    return int(crc)


def write_partitioned(ds, out_dir: str, tier: str, partition_keys: list[str],
                      num_partitions: int = 32, sort_cols: list[str] | None = None,
                      fail_after: int | None = None,
                      overwrite_parts: set | None = None,
                      part_offset: int = 0,
                      direct_part_col: str | None = None) -> list[dict]:
    """Write ``ds`` as hash-partitioned parquet with per-partition lineage.

    Skips partitions already in the manifest (resume = a filter, not replay),
    EXCEPT those in ``overwrite_parts`` — the refresh path for derived
    tiers (e.g. Gorilla chunks whose source tier partitions were rewritten
    by an incremental append); their manifest rows chain ``gen``.
    ``fail_after`` is a test hook: raise after N partitions to simulate a
    mid-job crash.

    ``part_offset`` shifts the partition ids (part = offset + hash % N) —
    the APPEND-ONLY delta layout: each shard of an insert-only table
    writes its own ``num_partitions`` files under the same tier instead of
    read-merge-rewriting shared partitions (which costs O(stored table)
    per append); readers just see more files, and crash-retry idempotence
    falls out of the manifest skip because offsets make (tier, part)
    shard-unique.

    ``direct_part_col`` uses an existing INTEGER column's value (must lie
    in [0, num_partitions)) as the partition id instead of hashing
    ``partition_keys`` — the identity layout that lets readers prune at
    the FILE level by semantic id (e.g. an ANN index partitioned by
    coarse-quantizer centroid: a query opens only its probed centroids'
    files).
    """
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    os.makedirs(tier_dir, exist_ok=True)
    prior = load_done(out_dir)
    done = {p for (t, p) in prior if t == tier} - set(overwrite_parts or ())
    gens = {p: int(row.get("gen", 0))
            for (t, p), row in prior.items() if t == tier}

    def assign(batch: pd.DataFrame):
        batch = batch.copy()  # upstream fused map may hand us a slice view
        batch[PART_COL] = part_offset + (
            batch[direct_part_col].to_numpy().astype(np.int64)
            if direct_part_col else
            K.partition_ids(batch, partition_keys, num_partitions))
        if done:
            batch = batch[~batch[PART_COL].isin(list(done))]
        if len(batch) == 0:
            # hand back an Arrow empty (typed) block: Ray's pandas block
            # size sampler trips on zero-row string columns (np.vectorize
            # on empty input) and logs a spurious error per empty block —
            # the common case on a resume pass where every row filters out.
            # Zero-row object columns infer as Arrow null — cast to string
            # so the exchange can union this block with non-empty ones.
            tbl = pa.Table.from_pandas(batch, preserve_index=False)
            return tbl.cast(pa.schema(
                [pa.field(f.name, pa.string())
                 if pa.types.is_null(f.type) else f for f in tbl.schema]))
        return batch

    def write_part(part_df: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        part = int(part_df[PART_COL].iloc[0])
        df = part_df.drop(columns=[PART_COL])
        if sort_cols:  # deterministic file contents across runs/parallelism
            df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        final = os.path.join(tier_dir, f"part={part}.parquet")
        tmp = final + f".tmp.{os.getpid()}"
        # dictionary-encode everything (key strings are low-cardinality per
        # partition — reference transform.py:30-33 parity) + zstd: ~2× file
        # shrink vs snappy at negligible write cost; read-back is unchanged
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp,
                       use_dictionary=True, compression="zstd")
        os.replace(tmp, final)  # atomic on one filesystem
        return pd.DataFrame([{
            "tier": tier, "part": part, "rows": len(df),
            "points": len(df), "checksum": _partition_checksum(df),
            "wall_s": round(time.perf_counter() - t0, 4),
            "fingerprint": f"{tier}/{part}/{num_partitions}",
            "gen": gens.get(part, 0) + 1,
        }])

    results = (
        ds.map_batches(assign, batch_format="pandas")
        .groupby(PART_COL)
        .map_groups(write_part, batch_format="pandas")
    ).to_pandas()

    rows = results.to_dict("records")
    if fail_after is not None:
        rows = rows[:fail_after]
    append_manifest(out_dir, rows)
    if fail_after is not None:
        raise RuntimeError(f"simulated crash after {fail_after} partitions")
    return rows


def merge_partitioned(delta_ds, out_dir: str, tier: str,
                      partition_keys: list[str], group_keys: list[str],
                      merge_plan: dict, delta_id: str,
                      num_partitions: int = 32,
                      sort_cols: list[str] | None = None,
                      finalize_fn=None,
                      fail_after: int | None = None) -> list[dict]:
    """Continuous-aggregate maintenance: merge a DELTA of algebraic stat
    rows (e.g. a new crawl batch's tier table) into the checkpointed tier,
    rewriting ONLY the partitions the delta lands in — the incremental form
    of the north_rule's 1h/1d/7d retention tiers (no TimescaleDB analog
    consulted; the algebra is the same (count, sum, min, max, Σx²) carry
    the cascade in :mod:`forecastframe_ray.pipelines.rollup` already uses).

    - ``merge_plan``: ``{col: (col, op)}`` over the algebraic columns; any
      derived columns (mean/std/labels) in the delta or the stored files
      are dropped before merging and rebuilt by ``finalize_fn``.
    - **Idempotent per** ``delta_id``: each rewritten partition's manifest
      row records ``delta_id`` and a bumped ``gen``; re-applying the same
      delta (crash-retry of an append job) skips partitions whose latest
      manifest row already carries it, so stats are never double-counted.
    - Untouched partitions keep their files and manifest rows; lineage
      stays partition-granular (`gen` chains the rewrites).
    - ``fail_after``: test hook, as in :func:`write_partitioned`.

    At 100 TB framing the delta is one ingest batch: its tier table is
    orders of magnitude smaller than the stored tiers, and the merge cost
    is proportional to the AFFECTED partitions, not the corpus.
    """
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    os.makedirs(tier_dir, exist_ok=True)
    done = load_done(out_dir)
    skip = {p for (t, p), row in done.items()
            if t == tier and row.get("delta_id") == delta_id}
    gens = {p: int(row.get("gen", 0))
            for (t, p), row in done.items() if t == tier}
    merge_cols = list(group_keys) + list(merge_plan)

    def assign(batch: pd.DataFrame):
        batch = batch.copy()
        batch[PART_COL] = K.partition_ids(batch, partition_keys, num_partitions)
        if skip:
            batch = batch[~batch[PART_COL].isin(list(skip))]
        if len(batch) == 0:  # typed empty block (see write_partitioned)
            tbl = pa.Table.from_pandas(batch, preserve_index=False)
            return tbl.cast(pa.schema(
                [pa.field(f.name, pa.string())
                 if pa.types.is_null(f.type) else f for f in tbl.schema]))
        return batch

    def merge_part(part_df: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        part = int(part_df[PART_COL].iloc[0])
        frames = [part_df[merge_cols]]
        final = os.path.join(tier_dir, f"part={part}.parquet")
        applied: list[str] = []
        if os.path.exists(final):
            old = pq.read_table(final)
            meta = (old.schema.metadata or {}).get(b"delta_ids")
            applied = json.loads(meta) if meta else []
            if delta_id in applied:
                # crash landed between this partition's atomic file replace
                # and its manifest append — the FILE already carries this
                # delta (metadata backstop); just re-emit the lineage row
                df_old = old.to_pandas()
                return pd.DataFrame([{
                    "tier": tier, "part": part, "rows": len(df_old),
                    "points": len(df_old),
                    "checksum": _partition_checksum(df_old),
                    "wall_s": round(time.perf_counter() - t0, 4),
                    "fingerprint": f"{tier}/{part}/{num_partitions}",
                    "gen": gens.get(part, 0) + 1, "delta_id": delta_id,
                }])
            frames.append(old.to_pandas()[merge_cols])
        allf = pd.concat(frames, ignore_index=True)
        df = allf.groupby(list(group_keys), as_index=False, sort=False,
                          observed=True) \
            .agg(**{c: (src, op) for c, (src, op) in merge_plan.items()})
        if finalize_fn is not None:
            df = finalize_fn(df)
        if sort_cols:
            df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        tbl = tbl.replace_schema_metadata({
            **{k: v for k, v in (tbl.schema.metadata or {}).items()},
            b"delta_ids": json.dumps(applied + [delta_id]).encode(),
        })
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(tbl, tmp, use_dictionary=True, compression="zstd")
        os.replace(tmp, final)
        return pd.DataFrame([{
            "tier": tier, "part": part, "rows": len(df), "points": len(df),
            "checksum": _partition_checksum(df),
            "wall_s": round(time.perf_counter() - t0, 4),
            "fingerprint": f"{tier}/{part}/{num_partitions}",
            "gen": gens.get(part, 0) + 1, "delta_id": delta_id,
        }])

    results = (
        delta_ds.map_batches(assign, batch_format="pandas")
        .groupby(PART_COL)
        .map_groups(merge_part, batch_format="pandas")
    ).to_pandas()

    rows = results.to_dict("records")
    if fail_after is not None:
        rows = rows[:fail_after]
    append_manifest(out_dir, rows)
    if fail_after is not None:
        raise RuntimeError(f"simulated crash after {fail_after} partitions")
    return rows


def expire_tier(out_dir: str, tier: str, cutoff_us: int,
                bucket_col: str = "bucket_us") -> list[dict]:
    """Retention expiry — the other half of continuous-aggregate
    maintenance: drop buckets strictly older than ``cutoff_us`` from a
    checkpointed tier (e.g. keep 1h for 30 days, 1d for a year; the 7d
    tier retains the coarse history). Partition-granular and idempotent:
    each partition file's footer min/max statistics on ``bucket_col``
    decide whether it is touched at all — a partition whose oldest bucket
    is already >= cutoff is skipped without reading data, so repeated
    expiry sweeps cost metadata only. Rewrites are atomic, drop to file
    deletion when everything expires, and append gen-chained manifest rows
    (``expired_before`` records the cutoff).

    Driver-side loop over partition FILES (not rows): the per-tier
    partition count is bounded (the layout's ``num_partitions``), and each
    touched file rewrite is one pruned parquet read/write — on a cluster
    this loop is trivially dispatchable, but it is metadata-scale work
    either way."""
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    gens = {p: int(row.get("gen", 0))
            for (t, p), row in load_done(out_dir).items() if t == tier}
    rows: list[dict] = []
    if not os.path.isdir(tier_dir):
        return rows
    for fname in sorted(os.listdir(tier_dir)):
        if not (fname.startswith("part=") and fname.endswith(".parquet")):
            continue
        part = int(fname[len("part="):-len(".parquet")])
        path = os.path.join(tier_dir, fname)
        t0 = time.perf_counter()
        pf = pq.ParquetFile(path)
        idx = pf.schema_arrow.get_field_index(bucket_col)
        mins = [pf.metadata.row_group(g).column(idx).statistics.min
                for g in range(pf.metadata.num_row_groups)]
        if mins and min(mins) >= cutoff_us:
            continue  # nothing to expire — metadata-only skip
        df = pf.read().to_pandas()
        meta = pf.schema_arrow.metadata or {}
        kept = df[df[bucket_col] >= cutoff_us].reset_index(drop=True)
        if len(kept) == len(df):
            continue
        if len(kept) == 0:
            os.remove(path)
        else:
            tbl = pa.Table.from_pandas(kept, preserve_index=False)
            tbl = tbl.replace_schema_metadata(
                {**{k: v for k, v in meta.items()}})
            tmp = path + f".tmp.{os.getpid()}"
            pq.write_table(tbl, tmp, use_dictionary=True, compression="zstd")
            os.replace(tmp, path)
        rows.append({
            "tier": tier, "part": part, "rows": len(kept),
            "points": len(kept), "checksum": _partition_checksum(kept),
            "wall_s": round(time.perf_counter() - t0, 4),
            "fingerprint": f"{tier}/{part}/expire",
            "gen": gens.get(part, 0) + 1, "expired_before": int(cutoff_us),
        })
    append_manifest(out_dir, rows)
    return rows


def read_tier(out_dir: str, tier: str):
    import ray.data

    # merge_partitioned stamps ``delta_ids`` into the parquet footer (the
    # crash-retry backstop); pa.Schema with metadata is unhashable
    # (pyarrow 16) and trips Ray's schema-dedup at the read and at every
    # downstream shuffle input ("Failed to hash the schemas" log spam) —
    # so hand read_parquet an explicit metadata-free schema from the
    # first file's footer (files within a tier are uniform)
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    schema = None
    for fname in sorted(os.listdir(tier_dir)):
        if fname.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(tier_dir, fname)) \
                .remove_metadata()
            break
    return ray.data.read_parquet(tier_dir, schema=schema)
