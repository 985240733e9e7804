"""Persisted, incrementally-maintainable ANN index — the similarity-search
sibling of the LLM-funnel corpus index (:mod:`.llm_incremental`): adding an
embedding shard must cost O(shard), and a query must read only the files
its probes touch.

Layout under ``index_dir``:

- ``tier=vectors`` — ``(vec_id, centroid, embedding)`` parquet files
  partitioned BY CENTROID ID (``write_partitioned(direct_part_col=
  "centroid")`` — the identity layout): file ``part = shard·K + c`` holds
  shard ``shard``'s vectors assigned to centroid ``c``. Searching with
  ``nprobe`` centroids opens exactly ``shards × nprobe`` files — "prune at
  the read" made literal: the probed-partition file list is computed
  driver-side from metadata, unprobed vectors never leave storage.
- ``index_meta.json`` — the frozen coarse quantizer (centroid matrix),
  params, shard log.

Contracts:

- Centroids are FROZEN at build (standard IVF practice — the coarse
  quantizer trains once on a sample); appends assign new vectors to the
  existing centroids. Assignment is deterministic, so **an appended index
  is bit-identical in content to rebuilding with the same centroids** —
  the in-Ray gate `ann_index_incremental_gate` pins it.
- ``search(..., nprobe=num_centroids)`` probes everything and is EXACT
  (== brute force) — which is what lets the search path carry a full
  DuckDB value oracle (`ann_index_search_embeddings`); partial-probe
  recall is gated the `ann_ivf_recall` way.

Crash-retry: shard offsets make (tier, part) manifest rows shard-unique;
re-submitting a crashed append skips finished partitions; meta (commit
point) is written last.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd

from forecastframe_ray.pipelines.similarity import (
    _normalize,
    _stack,
    train_centroids,
)
from forecastframe_ray.stages import pq as PQ
from forecastframe_ray.state import checkpoint

META_FILE = "index_meta.json"


def _load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        m = json.load(f)
    m["centroids"] = np.asarray(m["centroids"], dtype=np.float64)
    if m.get("pq_books") is not None:
        m["pq_books"] = np.asarray(m["pq_books"], dtype=np.float64)
    return m


def _write_meta(index_dir: str, meta: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    out = dict(meta)
    out["centroids"] = np.asarray(meta["centroids"]).tolist()
    if out.get("pq_books") is not None:
        out["pq_books"] = np.asarray(out["pq_books"]).tolist()
    path = os.path.join(index_dir, META_FILE)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(out, f, sort_keys=True)
    os.replace(tmp, path)


def _assign_and_write(emb_ds, index_dir: str, C: np.ndarray, vec_col: str,
                      id_col: str, shard_index: int,
                      fail_after: int | None = None,
                      books: np.ndarray | None = None) -> None:
    import ray

    ref = ray.put((C, books))
    k = len(C)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        Cm, bks = ray.get(ref)
        M = _normalize(_stack(b[vec_col]))
        cent = (M @ Cm.T).argmax(axis=1).astype(np.int32)
        if bks is not None:
            # PQ layout: m uint8 codes per vector replace the float
            # payload (64-dim float64 → 8 bytes, 64× smaller files)
            codes = PQ.pq_encode(M, bks)
            out = pd.DataFrame({id_col: b[id_col].to_numpy(),
                                "pq_code": [c.tobytes() for c in codes]})
            out["centroid"] = cent
            return out
        out = b[[id_col, vec_col]].copy()
        out["centroid"] = cent
        return out

    checkpoint.write_partitioned(
        emb_ds.map_batches(assign, batch_format="pandas"), index_dir,
        "vectors", ["centroid"], num_partitions=k, sort_cols=[id_col],
        part_offset=shard_index * k, direct_part_col="centroid",
        fail_after=fail_after)


def build_ann_index(emb_ds, index_dir: str, num_centroids: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 5, shard_id: str = "shard-000",
                    centroids: np.ndarray | None = None,
                    pq_m: int | None = None) -> dict:
    """Train the coarse quantizer on a sample (deterministic seed), assign
    every vector, write the centroid-partitioned files. Pass ``centroids``
    to build against an EXISTING quantizer (the appended == rebuilt
    equality gate rebuilds with the incremental index's frozen
    centroids). ``pq_m`` turns on product-quantized storage: vectors are
    stored as ``pq_m`` uint8 codes (``stages/pq.py`` — 64-dim float64 →
    pq_m bytes) and search scores by asymmetric distance; the PQ
    codebooks train on the same id-sorted sample and freeze with the
    centroids."""
    t0 = time.perf_counter()
    C = centroids if centroids is not None else \
        train_centroids(emb_ds, num_centroids, vec_col, seed=seed,
                        sort_col=id_col)
    books = None
    if pq_m:
        sample = emb_ds.limit(4096).to_pandas() \
            .sort_values(id_col).reset_index(drop=True)
        books = PQ.train_pq(_normalize(_stack(sample[vec_col])), m=pq_m,
                            seed=seed)
    _assign_and_write(emb_ds, index_dir, C, vec_col, id_col, 0,
                      books=books)
    _write_meta(index_dir, {"centroids": C, "num_centroids": len(C),
                            "vec_col": vec_col, "id_col": id_col,
                            "pq_books": books, "pq_m": pq_m,
                            "shards": [shard_id]})
    return {"vectors": int(emb_ds.count()), "num_centroids": len(C),
            "wall_s": round(time.perf_counter() - t0, 3)}


def append_ann(emb_ds, index_dir: str, shard_id: str | None = None,
               fail_after: int | None = None) -> dict:
    """O(shard) append: assign the new vectors to the FROZEN centroids and
    write one new file set at the shard's partition offset. Nothing stored
    is read or rewritten."""
    meta = _load_meta(index_dir)
    shard_id = shard_id or f"shard-{len(meta['shards']):03d}"
    t0 = time.perf_counter()
    _assign_and_write(emb_ds, index_dir, meta["centroids"],
                      meta["vec_col"], meta["id_col"],
                      shard_index=len(meta["shards"]),
                      fail_after=fail_after, books=meta.get("pq_books"))
    meta["shards"] = meta["shards"] + [shard_id]
    _write_meta(index_dir, meta)
    return {"vectors": int(emb_ds.count()),
            "wall_s": round(time.perf_counter() - t0, 3)}


def search_ann(index_dir: str, queries: np.ndarray, k: int = 10,
               nprobe: int = 4) -> pd.DataFrame:
    """Top-k by exact cosine over ONLY the probed centroids' files.

    The probed-partition file list is computed from metadata (union of
    every query's ``nprobe`` nearest centroids × every shard offset); the
    scan then streams just those files and each batch does one matmul per
    query against the query matrix, masked to that query's own probes.
    ``nprobe == num_centroids`` probes everything → exact brute force.
    """
    import ray
    import ray.data

    meta = _load_meta(index_dir)
    C, kc = meta["centroids"], int(meta["num_centroids"])
    id_col = meta["id_col"]
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]     # (nq, nprobe)

    tier_dir = os.path.join(index_dir, "tier=vectors")
    wanted = sorted({int(c) for row in probe for c in row})
    paths = [os.path.join(tier_dir, f"part={s * kc + c}.parquet")
             for s in range(len(meta["shards"])) for c in wanted]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return pd.DataFrame({"query_ix": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype="int64"),
                             "cos_sim": pd.Series([], dtype="float64")})

    books = meta.get("pq_books")
    state = ray.put((Q, probe, books))
    nq = len(Q)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        Qm, P, bks = ray.get(state)
        if bks is not None:  # PQ layout: uint8 codes, asymmetric scores
            codes = np.frombuffer(b"".join(batch["pq_code"]),
                                  dtype=np.uint8) \
                .reshape(len(batch), bks.shape[0])
            M = None
        else:
            M = _normalize(_stack(batch[meta["vec_col"]]))
        ids = batch[id_col].to_numpy()
        cent = batch["centroid"].to_numpy()
        frames = []
        for qi in range(nq):
            mask = np.isin(cent, P[qi])
            if not mask.any():
                continue
            sims = (PQ.adc_scores(Qm[qi], codes[mask], bks)
                    if bks is not None else M[mask] @ Qm[qi])
            sub = ids[mask]
            kk = min(k, len(sub))
            part = np.argpartition(-sims, kk - 1)[:kk]
            frames.append(pd.DataFrame({
                "query_ix": np.full(kk, qi, dtype=np.int64),
                id_col: sub[part], "cos_sim": sims[part]}))
        if not frames:
            return pd.DataFrame({"query_ix": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype=ids.dtype),
                                 "cos_sim": pd.Series([], dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    cand = ray.data.read_parquet(paths) \
        .map_batches(local_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_ix", "cos_sim", id_col],
                            ascending=[True, False, True], kind="mergesort")
    top = cand.groupby("query_ix", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_ix").cumcount().astype(np.int64)
    return top[["query_ix", "rank", id_col, "cos_sim"]]
