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
    h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
    return int(zlib.crc32(h.tobytes()))


def write_partitioned(ds, out_dir: str, tier: str, partition_keys: list[str],
                      num_partitions: int = 32, sort_cols: list[str] | None = None,
                      fail_after: int | None = None) -> list[dict]:
    """Write ``ds`` as hash-partitioned parquet with per-partition lineage.

    Skips partitions already in the manifest (resume = a filter, not replay).
    ``fail_after`` is a test hook: raise after N partitions to simulate a
    mid-job crash.
    """
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    os.makedirs(tier_dir, exist_ok=True)
    done = {p for (t, p) in load_done(out_dir) if t == tier}

    def assign(batch: pd.DataFrame):
        batch = batch.copy()  # upstream fused map may hand us a slice view
        batch[PART_COL] = K.partition_ids(batch, partition_keys, num_partitions)
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


def read_tier(out_dir: str, tier: str):
    import ray.data
    return ray.data.read_parquet(os.path.join(out_dir, f"tier={tier}"))
