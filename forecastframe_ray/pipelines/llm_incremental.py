"""Incremental (append-only) maintenance of the LLM-funnel corpus index —
the round-5 engine capability: adding a shard to a deduped corpus must cost
O(shard + collisions), not a full re-run of dedup over the whole corpus.

No reference analog (cited for contrast: /root/reference/forecastframe/
main.py:61-69 has only an in-memory PK-uniqueness check); this module
mirrors the tier path's continuous-aggregate maintenance
(``state/checkpoint.merge_partitioned``, ``web.append_tiers``) for the
funnel: a **persisted, partitioned corpus index** that new shards PROBE.

Index layout under ``index_dir`` (all tables written through
``checkpoint.write_partitioned`` in the append-only DELTA layout — each
shard writes its own hash-partitioned parquet files at a shard-unique
partition-id offset, atomic renames, per-partition lineage manifest whose
(tier, part) skip makes a crashed append re-submittable; no stored
partition is ever read-merge-rewritten, so an append's write cost is
O(shard), not O(corpus)):

- ``tier=corpus``  — ``(doc_id, text_clean, rep_id)`` for every
  exact-dedup survivor ever seen; near-dup NON-representatives stay here
  (their cleaned text is what makes later new-vs-old Jaccard verification
  exact) with ``rep_id`` pointing at their cluster representative.
- ``tier=digests`` — ``(digest, keep_id)``: min doc id per distinct
  cleaned text, the exact-dedup index.
- ``tier=bands``   — ``(band, bucket, doc_id)``: the MinHash LSH band
  index of every exact-dedup survivor — the probe structure that turns
  near-dup maintenance into "which existing docs share a bucket with the
  shard".
- ``tier=remap``   — ``(old_rep, new_rep)``: append-only representative
  remaps. When a new doc bridges two existing clusters their reps merge;
  instead of rewriting every member row, the losing rep's redirect is
  appended here and resolved (driver-side path compression over a table
  whose size is the number of cross-shard merges, ≪ corpus) at read time.
- ``index_meta.json`` — funnel parameters + ``max_seen_id`` + shard log.

**Incremental == full rebuild.** :func:`final_corpus` after
``build_index(shard_1); append_shard(shard_2); …`` equals the one-shot
funnel (C4 clean → exact dedup → MinHash+LSH near-dup → min-id
representative per connected component) over the concatenated shards,
row-for-row, provided:

1. doc ids are append-monotonic (each shard's min id > ``max_seen_id``) —
   asserted at append; this is what makes the stored exact-dedup winner
   and the stored representative stable under new data (min-id rules);
2. no LSH bucket crosses a verify-kernel CAP boundary *between* runs —
   ``bucket_cap`` (100k members), ``CLASS_CAP`` (32 distinct-text classes
   per bucket → star emission) and ``CLIQUE_CAP``/``FANOUT_CAP``. The
   caps are scale-hardening heuristics for pathological mega-clusters;
   candidate generation on the probed subset sees every touched bucket's
   FULL membership (old members come back via the band index), so below
   the caps the candidate sets — and hence the verified pairs — are
   identical. A corpus whose duplicate CLUSTERS are mega-scale (e.g. one
   doc with 200k near-copies) sits outside the exact-equivalence
   contract, in both directions: the full rebuild's own star caps are
   then already approximating.

Proof sketch (encoded in ``tests/test_llm_incremental.py`` against the
one-shot pipeline): exact survivors match because min-id per digest is
prefix-stable under monotonic ids; the probed verify subset contains every
(new, old) and (new, new) candidate pair of the full rebuild because a
shared bucket is by definition a touched bucket and the band index returns
ALL its old members (including near-dup non-representatives — which is why
``tier=corpus`` keeps their texts); transitive chains through old members
are preserved by adding the stored ``member → rep`` edges of every old doc
appearing in a verified pair, so union-find components — and their min-id
reps — coincide with the full rebuild's.

Scale shape of :func:`append_shard` (100 TB framing): every stage is
O(shard + collisions). The digest anti-probe and the bucket probe are
key-only (16-byte digest / 12-byte band rows) broadcast filters below
``broadcast_limit`` and distributed hash joins above; old document TEXT
moves only for docs that actually collide with the shard; pair
verification reuses the hardened :func:`dedup.minhash_lsh_pairs` machinery
(bucket caps, KMV prefilter, candidate- and CPU-scaled verify fan-out,
band waves) on the shard ∪ colliding-old subset.

The corpus-frequency boilerplate pass (``textstats.remove_boilerplate``)
is deliberately OUTSIDE the incremental contract: a corpus-global line
frequency is not prefix-stable — a line crossing ``max_repeats`` only
after shard k would retroactively change already-indexed documents'
cleaned text. Pipelines that want it run it upstream on full rebuilds;
the incremental funnel is C4-clean → exact → near-dup, the stages whose
state factorizes over shards.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd

from forecastframe_ray.pipelines import dedup as D
from forecastframe_ray.pipelines import textstats as T
from forecastframe_ray.state import checkpoint

META_FILE = "index_meta.json"

#: key-set sizes (rows) below which index probes broadcast via the object
#: store instead of running a distributed hash join — same threshold family
#: as dedup.exact_dedup / decontaminate
BROADCAST_LIMIT = 5_000_000


# ---------------------------------------------------------------------------
# meta
# ---------------------------------------------------------------------------


def _load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        return json.load(f)


def _write_meta(index_dir: str, meta: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, META_FILE)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True, indent=1)
    os.replace(tmp, path)


_PARAM_KEYS = ("minhash_threshold", "min_words_per_line", "require_terminal",
               "num_perm", "num_bands", "shingle_width", "seed")


# ---------------------------------------------------------------------------
# shared stages
# ---------------------------------------------------------------------------


def _clean(docs_ds, id_col: str, text_col: str, p: dict):
    """C4 line cleaning → ``(id, text_clean)`` (deterministic per doc —
    the prefix-stable part of the funnel)."""
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        lambda b: T.c4_clean_batch(b, text_col=text_col,
                                   min_words_per_line=p["min_words_per_line"],
                                   require_terminal=p["require_terminal"])
        [[id_col, "text_clean"]],
        batch_format="pandas")


def _digests(cleaned, id_col: str):
    """(id, digest) narrow projection of the cleaned shard."""
    return cleaned.map_batches(
        lambda b: D._digest_batch(b, "text_clean", "digest")
        [[id_col, "digest"]],
        batch_format="pandas")


def _band_rows(kept, id_col: str, p: dict):
    """(band, bucket, doc_id) LSH band index rows for a cleaned corpus."""
    return kept.map_batches(
        lambda b: D.minhash_batch(b[[id_col, "text_clean"]], "text_clean",
                                  p["num_perm"], p["shingle_width"],
                                  p["num_bands"], p["seed"]),
        batch_format="pandas")


def _apply_rep(kept, rep_map: dict, id_col: str):
    """Attach ``rep_id`` (default self) from a driver-side mapping. The
    mapping's size is the number of docs appearing in verified pairs —
    collisions, not corpus; above ``BROADCAST_LIMIT`` callers switch to the
    Dataset-label join path (see build_index's scale branch)."""
    import ray

    ref = ray.put(rep_map)

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        b = b.copy()
        ids = b[id_col]
        b["rep_id"] = (ids.map(m).fillna(ids).astype(np.int64)
                       if m else ids.to_numpy().astype(np.int64))
        return b

    return kept.map_batches(attach, batch_format="pandas")


def _apply_rep_distributed(kept, labels, id_col: str, num_partitions: int):
    """Scale path: labels stay a Dataset; attach rep via left hash join
    (missing → self)."""
    from forecastframe_ray.stages.join import hash_join

    lab = labels.map_batches(
        lambda b: b.rename(columns={"doc_id": id_col}),
        batch_format="pandas")
    joined = hash_join(kept, lab, on=[id_col], how="left",
                       num_partitions=num_partitions)
    return joined.map_batches(
        lambda b: b.assign(rep_id=b["rep_id"].fillna(b[id_col])
                           .astype(np.int64)),
        batch_format="pandas")


def _rep_mapping(pairs, extra_edges: pd.DataFrame | None = None,
                 driver_pair_limit: int = 20_000_000,
                 num_partitions: int = 16):
    """Connected components → ``{doc_id: rep_id}`` (driver union-find below
    ``driver_pair_limit`` pairs, distributed hash-min propagation above —
    the scale path returns a Dataset and the caller uses
    :func:`_apply_rep_distributed`). ``extra_edges`` carries the stored
    member→rep edges that keep transitive chains intact on appends."""
    n_pairs = pairs.count()
    extra = extra_edges if extra_edges is not None and len(extra_edges) \
        else None
    if n_pairs == 0 and extra is None:
        return {}, None
    if n_pairs + (len(extra) if extra is not None else 0) <= driver_pair_limit:
        df = pairs.to_pandas()[["id_a", "id_b"]] if n_pairs else \
            pd.DataFrame({"id_a": [], "id_b": []})
        if extra is not None:
            df = pd.concat([df, extra.rename(
                columns={extra.columns[0]: "id_a",
                         extra.columns[1]: "id_b"})], ignore_index=True)
        return D.clusters_from_pairs(df), None
    import ray.data
    all_pairs = pairs
    if extra is not None:
        all_pairs = all_pairs.union(ray.data.from_pandas(
            extra.rename(columns={extra.columns[0]: "id_a",
                                  extra.columns[1]: "id_b"})))
    labels = D.clusters_from_pairs_distributed(
        all_pairs, broadcast_limit=BROADCAST_LIMIT,
        num_partitions=num_partitions)
    return None, labels


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def build_index(docs_ds, index_dir: str, *, id_col: str = "doc_id",
                text_col: str = "text", minhash_threshold: float = 0.7,
                min_words_per_line: int = 5, require_terminal: bool = True,
                num_perm: int = 64, num_bands: int = 16,
                shingle_width: int = 5, seed: int = 7,
                num_partitions: int = 16,
                driver_pair_limit: int = 20_000_000,
                shard_id: str = "shard-000") -> dict:
    """One-shot funnel over the first shard, persisting the probe index.

    Re-submitting after a crash is safe: every table write is an
    append-only ``write_partitioned`` delta whose (tier, part) manifest
    rows skip already-written partitions, and the meta file is written
    last, atomically.
    """
    p = {"minhash_threshold": minhash_threshold,
         "min_words_per_line": min_words_per_line,
         "require_terminal": require_terminal, "num_perm": num_perm,
         "num_bands": num_bands, "shingle_width": shingle_width,
         "seed": seed}
    t0 = time.perf_counter()

    cleaned = _clean(docs_ds, id_col, text_col, p).materialize()

    # exact dedup, keeping the digest index this time (dedup.exact_dedup
    # discards it): min id per digest → digests table; survivors by
    # broadcast/join id filter
    from forecastframe_ray.stages.agg import hash_aggregate
    dig = _digests(cleaned, id_col)
    digests = hash_aggregate(dig, ["digest"], {"keep_id": (id_col, "min")}) \
        .materialize()
    keep = digests.map_batches(
        lambda b: pd.DataFrame({"__keep_id": b["keep_id"]}),
        batch_format="pandas").materialize()
    kept = D._keep_id_semi_join(cleaned, keep, id_col, BROADCAST_LIMIT) \
        .materialize()
    n_exact = kept.count()

    pairs = D.minhash_lsh_pairs(kept, text_col="text_clean", id_col=id_col,
                                num_perm=num_perm, num_bands=num_bands,
                                shingle_width=shingle_width,
                                threshold=minhash_threshold, seed=seed,
                                approx_docs=n_exact).materialize()
    rep_map, labels = _rep_mapping(pairs, driver_pair_limit=driver_pair_limit,
                                   num_partitions=num_partitions)
    corpus = _apply_rep(kept, rep_map, id_col) if labels is None else \
        _apply_rep_distributed(kept, labels, id_col, num_partitions)

    bands = _band_rows(kept, id_col, p)

    _write_tables(index_dir, corpus, digests, bands, None, id_col,
                  num_partitions, shard_index=0)

    max_id = int(docs_ds.max(id_col) or -1)
    _write_meta(index_dir, {**p, "id_col": id_col,
                            "max_seen_id": max_id,
                            "num_partitions": num_partitions,
                            "shards": [shard_id]})
    return {"docs_in": int(docs_ds.count()), "exact_survivors": int(n_exact),
            "near_dup_pairs": int(pairs.count()),
            "wall_s": round(time.perf_counter() - t0, 3)}


def _write_tables(index_dir, corpus, digests, bands, remap_df, id_col,
                  num_partitions, shard_index,
                  fail_after: int | None = None):
    """Append-only DELTA write of the index tables: every table here is
    insert-only by construction (doc ids are append-monotonic; digests and
    band rows are pre-deduped against the index before writing; remap only
    ever gains redirects), so each shard writes its OWN partition files
    (``part = shard_index·N + hash``) instead of read-merge-rewriting
    shared partitions — a merge layout costs O(stored corpus) per append
    (measured: a 10% shard rewrote every partition and the append lost to
    the full rebuild). Crash-retry idempotence = the checkpoint manifest's
    (tier, part) skip; shard offsets make those ids shard-unique.

    Readers see one extra file set per shard; a periodic compaction pass
    (rewrite tier files at offset 0, truncate the manifest) would bound
    the fan-in on long shard chains — metadata-scale work, out of scope
    here."""
    off = shard_index * num_partitions
    checkpoint.write_partitioned(
        corpus, index_dir, "corpus", [id_col],
        num_partitions=num_partitions, sort_cols=[id_col], part_offset=off)
    checkpoint.write_partitioned(
        digests, index_dir, "digests", ["digest"],
        num_partitions=num_partitions, sort_cols=["digest"],
        part_offset=off)
    if remap_df is not None and len(remap_df):
        import ray.data
        checkpoint.write_partitioned(
            ray.data.from_pandas(remap_df), index_dir, "remap",
            ["old_rep"], num_partitions=1, sort_cols=["old_rep"],
            part_offset=shard_index)
    checkpoint.write_partitioned(
        bands, index_dir, "bands", ["band", "bucket"],
        num_partitions=num_partitions,
        sort_cols=["band", "bucket", id_col], part_offset=off,
        fail_after=fail_after)


def _load_remap(index_dir: str) -> dict:
    """Path-compressed representative redirects. Driver-side: the table has
    one row per cross-shard cluster merge — collision-scale, not corpus
    (if it ever outgrew one heap the same resolution is an iterated
    hash-min join, i.e. pointer doubling over a Dataset)."""
    tier_dir = os.path.join(index_dir, "tier=remap")
    if not os.path.isdir(tier_dir):
        return {}
    df = checkpoint.read_tier(index_dir, "remap").to_pandas()
    m = dict(zip(df["old_rep"].astype(np.int64),
                 df["new_rep"].astype(np.int64)))

    def resolve(x):
        seen = []
        while x in m:
            seen.append(x)
            x = m[x]
        for s in seen:
            m[s] = x
        return x

    for k in list(m):
        resolve(k)
    return m


# ---------------------------------------------------------------------------
# append
# ---------------------------------------------------------------------------


def append_shard(shard_ds, index_dir: str, shard_id: str | None = None,
                 driver_pair_limit: int = 20_000_000,
                 fail_after: int | None = None) -> dict:
    """Probe-only maintenance: index the new shard against the stored
    corpus. Cost is O(shard + collisions); the existing corpus is touched
    only where the shard's digests or LSH buckets land.

    Idempotent per ``shard_id`` (defaults to ``shard-{k}`` from the meta
    shard log): crash-retry re-runs skip already-written delta partitions
    via the checkpoint manifest (shard-offset partition ids are
    shard-unique), and the meta file — the commit point — is written
    last. ``fail_after`` is the test hook forwarded to the LAST table
    write to simulate a mid-append crash.
    """
    meta = _load_meta(index_dir)
    p = {k: meta[k] for k in _PARAM_KEYS}
    id_col = meta["id_col"]
    num_partitions = int(meta["num_partitions"])
    shard_id = shard_id or f"shard-{len(meta['shards']):03d}"
    t0 = time.perf_counter()
    stage_wall: dict[str, float] = {}

    shard_min = shard_ds.min(id_col)
    if shard_min is not None and shard_min <= meta["max_seen_id"]:
        raise ValueError(
            f"append-monotonic ids required: shard min {shard_min} <= "
            f"max_seen_id {meta['max_seen_id']}")

    # 1. C4 clean (per-doc, prefix-stable)
    cleaned = _clean(shard_ds, id_col, "text", p).materialize()

    # 2. exact dedup: new-vs-new (min id per digest) then anti-probe the
    #    digest index (old digest always wins under monotonic ids). Key-only
    #    exchange: 32-char digest + int id.
    from forecastframe_ray.stages.agg import hash_aggregate
    dig = _digests(cleaned, id_col)
    new_digests = hash_aggregate(dig, ["digest"],
                                 {"keep_id": (id_col, "min")}).materialize()
    fresh_digests = _anti_probe_digests(new_digests, index_dir,
                                        num_partitions,
                                        max_id=meta["max_seen_id"]) \
        .materialize()
    keep = fresh_digests.map_batches(
        lambda b: pd.DataFrame({"__keep_id": b["keep_id"]}),
        batch_format="pandas").materialize()
    kept = D._keep_id_semi_join(cleaned, keep, id_col, BROADCAST_LIMIT) \
        .materialize()
    n_exact = kept.count()
    stage_wall["exact_s"] = round(time.perf_counter() - t0, 3)
    t1 = time.perf_counter()

    # 3. LSH probe: shard band rows → touched buckets → old members of
    #    those buckets (band-index semi-join; key-only) → their texts
    #    (corpus semi-join on id). THEN the hardened pair machinery runs on
    #    shard ∪ colliding-old — identical candidate sets to a full rebuild
    #    for every pair involving a new doc (see module docstring).
    new_bands = _band_rows(kept, id_col, p).materialize()
    # the probe is bounded to ids ≤ max_seen_id: a crashed append may have
    # merged SOME of this shard's own band/corpus rows before dying, and a
    # retry must not treat them as "old" members (meta — the commit point —
    # still carries the pre-shard max)
    old_hits = _probe_bands(new_bands, index_dir, id_col,
                            max_id=meta["max_seen_id"])
    old_ids = old_hits.select_columns([id_col]) if old_hits is not None \
        else None
    if old_ids is not None:
        # globally-distinct keep ids (a doc colliding in several buckets
        # must not duplicate its corpus row through the semi-join's
        # hash-join path)
        keep_old = hash_aggregate(old_ids, [id_col],
                                  {"__m": (id_col, "size")}).map_batches(
            lambda b: pd.DataFrame({"__keep_id": b[id_col]}),
            batch_format="pandas").materialize()
        old_docs = D._keep_id_semi_join(
            checkpoint.read_tier(index_dir, "corpus")
            .select_columns([id_col, "text_clean"]),
            keep_old, id_col, BROADCAST_LIMIT)
        # consolidate blocks: the union inherits shard blocks + one block
        # set PER delta file of the corpus tier — measured ~500 near-empty
        # blocks whose fixed per-block cost made the verify sort exchange
        # 58 s of a 66 s pair stage (the subset is collision-scale, so one
        # extra copy is cheap)
        subset = kept.union(old_docs).repartition(num_partitions) \
            .materialize()
    else:
        subset = kept
    n_subset = subset.count()

    pairs = D.minhash_lsh_pairs(subset, text_col="text_clean", id_col=id_col,
                                num_perm=p["num_perm"],
                                num_bands=p["num_bands"],
                                shingle_width=p["shingle_width"],
                                threshold=p["minhash_threshold"],
                                seed=p["seed"], approx_docs=n_subset)
    max_seen = meta["max_seen_id"]
    new_pairs = pairs.map_batches(
        lambda b: b[np.maximum(b["id_a"].to_numpy(),
                               b["id_b"].to_numpy()) > max_seen],
        batch_format="pandas").materialize()
    n_pairs = new_pairs.count()
    stage_wall["lsh_s"] = round(time.perf_counter() - t1, 3)
    t2 = time.perf_counter()

    # 4. components over new pairs + stored member→rep edges of the old
    #    docs involved (keeps transitive chains through old members exact)
    remap = _load_remap(index_dir)
    extra_edges = None
    live_old: set = set()
    if n_pairs and old_ids is not None:
        pdf = new_pairs.to_pandas() if n_pairs <= driver_pair_limit else None
        if pdf is not None:
            involved = np.unique(np.concatenate(
                [pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy()]))
            involved = involved[involved <= max_seen]
            if len(involved):
                import ray.data
                inv = ray.data.from_pandas(
                    pd.DataFrame({"__keep_id": involved.astype(np.int64)}))
                rows = D._keep_id_semi_join(
                    checkpoint.read_tier(index_dir, "corpus")
                    .select_columns([id_col, "rep_id"]),
                    inv, id_col, BROADCAST_LIMIT).to_pandas()
                rows["rep_id"] = rows["rep_id"].map(
                    lambda r: remap.get(r, r)).astype(np.int64)
                same = rows["rep_id"] == rows[id_col]
                # involved old docs that ARE their own (resolved) rep —
                # only these need redirect rows if their cluster merges
                live_old.update(rows.loc[same, id_col])
                rows = rows[~same]
                if len(rows):
                    extra_edges = rows[[id_col, "rep_id"]]
        else:  # pair list beyond the driver: ship member→rep edges as a
            # Dataset via the corpus join inside the distributed components
            import ray.data
            corpus_edges = checkpoint.read_tier(index_dir, "corpus") \
                .select_columns([id_col, "rep_id"])
            inv_ids = new_pairs.map_batches(
                lambda b: pd.DataFrame({"__keep_id": np.unique(
                    np.concatenate([b["id_a"].to_numpy(),
                                    b["id_b"].to_numpy()]))}),
                batch_format="pandas")
            inv_ids = hash_aggregate(inv_ids, ["__keep_id"],
                                     {"m": ("__keep_id", "size")}) \
                .select_columns(["__keep_id"]).materialize()
            rows_ds = D._keep_id_semi_join(corpus_edges, inv_ids, id_col,
                                           BROADCAST_LIMIT)
            rmap = remap

            def fix(b: pd.DataFrame) -> pd.DataFrame:
                b = b.copy()
                b["rep_id"] = b["rep_id"].map(
                    lambda r: rmap.get(r, r)).astype(np.int64)
                return b[b["rep_id"] != b[id_col]].rename(
                    columns={id_col: "id_a", "rep_id": "id_b"})

            extra_edges_ds = rows_ds.map_batches(fix, batch_format="pandas")
            new_pairs = new_pairs.select_columns(["id_a", "id_b"]).union(
                extra_edges_ds).materialize()
            extra_edges = None

    rep_map, labels = _rep_mapping(new_pairs, extra_edges,
                                   driver_pair_limit=driver_pair_limit,
                                   num_partitions=num_partitions)

    # 5. representative bookkeeping: new docs get their component rep; an
    #    OLD rep that lost the min to a merge gets a redirect row
    remap_rows = []
    if rep_map is not None:
        new_rep_map = {}
        for doc, rep in rep_map.items():
            if doc > max_seen:
                new_rep_map[doc] = rep
            elif rep != doc and doc in live_old:
                # doc was a live rep until this merge → redirect row
                remap_rows.append((doc, rep))
        corpus_delta = _apply_rep(kept, new_rep_map, id_col)
    else:
        corpus_delta = _apply_rep_distributed(kept, labels, id_col,
                                              num_partitions)
        lab = labels.to_pandas()
        old_lab = lab[lab["doc_id"] <= max_seen]
        # scale path: liveness isn't collected driver-side; rows keyed by
        # non-rep member ids are inert (no rep_id ever equals them) and
        # bounded by pair participants, so over-appending is size-only
        for doc, rep in zip(old_lab["doc_id"], old_lab["rep_id"]):
            if rep != doc and remap.get(doc, doc) == doc:
                remap_rows.append((int(doc), int(rep)))
    remap_df = pd.DataFrame(remap_rows, columns=["old_rep", "new_rep"]) \
        if remap_rows else None
    stage_wall["components_s"] = round(time.perf_counter() - t2, 3)
    t3 = time.perf_counter()

    # 6. idempotent delta writes (shard-offset partition files — no
    #    read-merge-rewrite of stored partitions); meta (the commit
    #    point) last
    _write_tables(index_dir, corpus_delta, fresh_digests, new_bands,
                  remap_df, id_col, num_partitions,
                  shard_index=len(meta["shards"]), fail_after=fail_after)

    meta["max_seen_id"] = int(shard_ds.max(id_col) or meta["max_seen_id"])
    meta["shards"] = meta["shards"] + [shard_id]
    _write_meta(index_dir, meta)
    stage_wall["write_s"] = round(time.perf_counter() - t3, 3)
    return {"shard_docs": int(shard_ds.count()),
            "exact_survivors": int(n_exact),
            "old_docs_probed": int(n_subset - n_exact),
            "new_pairs": int(n_pairs),
            "rep_merges": len(remap_rows),
            "stage_wall_s": stage_wall,
            "wall_s": round(time.perf_counter() - t0, 3)}


def _anti_probe_digests(new_digests, index_dir: str, num_partitions: int,
                        max_id: int):
    """Drop new digests already present in the index (their stored keep_id
    is smaller under monotonic ids). Broadcast key-set below
    ``BROADCAST_LIMIT`` stored digests, distributed left-anti hash join
    above. Stored rows with ``keep_id > max_id`` are this same shard's
    residue from a crashed append — ignored so a retry doesn't anti-filter
    the shard against itself."""
    tier_dir = os.path.join(index_dir, "tier=digests")
    if not os.path.isdir(tier_dir) or not os.listdir(tier_dir):
        return new_digests
    stored = checkpoint.read_tier(index_dir, "digests").map_batches(
        lambda b: b.loc[b["keep_id"].to_numpy() <= max_id, ["digest"]],
        batch_format="pandas")
    if stored.count() <= BROADCAST_LIMIT:
        # EXACT anti-membership on the 32-hex digests as fixed-width S32
        # byte arrays + searchsorted (vectorized C) — unlike the bands
        # probe this filter may not use lossy hashes: a collision would
        # silently DROP a non-duplicate document
        import ray
        arr = np.sort(np.asarray(stored.to_pandas()["digest"], dtype="S32"))
        ref = ray.put(arr)

        def drop_hits(b: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(ref)
            if not len(ks):
                return b
            h = np.asarray(b["digest"], dtype="S32")
            idx = np.clip(np.searchsorted(ks, h), 0, len(ks) - 1)
            return b[ks[idx] != h]

        return new_digests.map_batches(drop_hits, batch_format="pandas")
    from forecastframe_ray.stages.join import hash_join
    marked = stored.map_batches(lambda b: b.assign(__hit=True),
                                batch_format="pandas")
    joined = hash_join(new_digests, marked, on=["digest"], how="left",
                       num_partitions=num_partitions)
    return joined.map_batches(
        lambda b: b[b["__hit"].isna()].drop(columns=["__hit"]),
        batch_format="pandas")


def _probe_bands(new_bands, index_dir: str, id_col: str, max_id: int):
    """Old docs sharing an LSH bucket with the shard: semi-join the stored
    band index on the shard's distinct (band, bucket) keys. Returns a
    Dataset of ``(band, bucket, doc_id)`` or None when the index is empty.
    Key-only both ways (12-byte rows); broadcast below ``BROADCAST_LIMIT``
    distinct shard buckets, hash join above. Rows with ``doc_id > max_id``
    (crash residue of this shard, see :func:`_anti_probe_digests`) are
    dropped."""
    import ray

    from forecastframe_ray import keys as K

    tier_dir = os.path.join(index_dir, "tier=bands")
    if not os.path.isdir(tier_dir) or not os.listdir(tier_dir):
        return None
    stored = checkpoint.read_tier(index_dir, "bands").map_batches(
        lambda b: b.loc[b[id_col].to_numpy() <= max_id,
                        ["band", "bucket", id_col]],
        batch_format="pandas")
    touched = new_bands.select_columns(["band", "bucket"])
    if touched.count() <= BROADCAST_LIMIT:
        # broadcast the shard's distinct bucket keys as ONE sorted uint64
        # hash array and probe with vectorized searchsorted — a
        # MultiIndex.isin over (band, bucket) tuples hashed per-row Python
        # objects and dominated the append wall (measured 70 s of a 90 s
        # append at a 5.8M-row stored index). Hash collisions can only
        # ADD old docs to the probed subset (their pairs are old-old and
        # filtered), never drop a true member — equivalence unaffected.
        keys = np.unique(K.hash_key_columns(touched.to_pandas(),
                                            ["band", "bucket"]))
        ref = ray.put(keys)

        def hit(b: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(ref)
            h = K.hash_key_columns(b, ["band", "bucket"])
            idx = np.clip(np.searchsorted(ks, h), 0, len(ks) - 1)
            return b[ks[idx] == h]

        return stored.map_batches(hit, batch_format="pandas")
    from forecastframe_ray.stages.agg import hash_aggregate
    from forecastframe_ray.stages.join import hash_join
    keys = hash_aggregate(touched, ["band", "bucket"],
                          {"m": ("band", "size")}) \
        .select_columns(["band", "bucket"]).materialize()
    return hash_join(stored, keys, on=["band", "bucket"], how="inner",
                     num_partitions=16)


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def final_corpus(index_dir: str):
    """The deduped corpus view: corpus tier with representative redirects
    resolved, filtered to rows that ARE their own (resolved)
    representative → ``(doc_id, text_clean)``. Streaming: the remap dict
    (collision-scale) broadcasts; the corpus never materializes."""
    import ray

    meta = _load_meta(index_dir)
    id_col = meta["id_col"]
    remap = _load_remap(index_dir)
    ref = ray.put(remap)

    def keep_reps(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        rep = b["rep_id"]
        if m:
            rep = rep.map(m).fillna(rep)
        return b[rep.to_numpy() == b[id_col].to_numpy()][[id_col,
                                                          "text_clean"]]

    return checkpoint.read_tier(index_dir, "corpus") \
        .map_batches(keep_reps, batch_format="pandas")


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------


def compact_index(index_dir: str, dest_dir: str,
                  num_partitions: int | None = None) -> dict:
    """Offline maintenance for long shard chains: rewrite the index into a
    FRESH directory with one consolidated file set per tier (partition ids
    back at offset 0), representative redirects resolved into the corpus
    rows, and the remap log cleared. Bounds reader fan-in — each append
    adds a file set per tier, and a chain of k shards makes every probe
    open ~k× the files.

    Copy-semantics for crash safety: ``dest_dir`` is only valid once its
    meta file (written last) exists; a crashed compaction leaves the
    source untouched and the destination resumable (the checkpoint
    manifest skips finished partitions). The caller switches directories
    afterwards; subsequent :func:`append_shard` calls on the compacted
    index keep working (their shard offsets continue past the shard log).
    """
    import ray

    meta = _load_meta(index_dir)
    id_col = meta["id_col"]
    n = num_partitions or int(meta["num_partitions"])
    t0 = time.perf_counter()

    remap = _load_remap(index_dir)
    ref = ray.put(remap)

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        if m:
            b = b.copy()
            rep = b["rep_id"]
            b["rep_id"] = rep.map(m).fillna(rep).astype(np.int64)
        return b

    corpus = checkpoint.read_tier(index_dir, "corpus") \
        .map_batches(resolve, batch_format="pandas")
    checkpoint.write_partitioned(corpus, dest_dir, "corpus", [id_col],
                                 num_partitions=n, sort_cols=[id_col])
    checkpoint.write_partitioned(
        checkpoint.read_tier(index_dir, "digests"), dest_dir, "digests",
        ["digest"], num_partitions=n, sort_cols=["digest"])
    checkpoint.write_partitioned(
        checkpoint.read_tier(index_dir, "bands"), dest_dir, "bands",
        ["band", "bucket"], num_partitions=n,
        sort_cols=["band", "bucket", id_col])

    _write_meta(dest_dir, {**{k: meta[k] for k in _PARAM_KEYS},
                           "id_col": id_col, "max_seen_id": meta["max_seen_id"],
                           "num_partitions": n, "shards": meta["shards"],
                           "compacted_from": index_dir})
    return {"resolved_remaps": len(remap),
            "wall_s": round(time.perf_counter() - t0, 3)}
