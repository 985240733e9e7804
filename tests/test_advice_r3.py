"""Regression tests for the round-3 ADVICE.md findings: giant-bucket star
path dropping intra-class pairs, categorical keys exploding the pandas-path
aggregates (observed=False), KMV prefilter on short docs, the hash_join
partition clamp, and multi-byte span bounding in minhash_batch."""

import logging

import numpy as np
import pandas as pd
import pytest

import ray.data

from forecastframe_ray.pipelines import dedup
from forecastframe_ray.stages import agg, window_ops
from forecastframe_ray.stages.join import hash_join


def test_verify_partition_giant_bucket_keeps_intra_class_pairs(monkeypatch):
    # ADVICE r3 (medium): in a giant (> CLASS_CAP classes) bucket the
    # partition kernel's star path emitted only (min-id-class, other) pairs
    # and lost intra-class exact-dup pairs — docs 3,4 are exact dups whose
    # ONLY colliding bucket is giant and must still come out as a pair
    monkeypatch.setattr(dedup, "CLASS_CAP", 3)
    texts = [
        "alpha bravo charlie delta echo foxtrot",
        "golf hotel india juliet kilo lima",
        "mike november oscar papa quebec romeo",
        "sierra tango uniform victor whiskey xray",
        "sierra tango uniform victor whiskey xray",  # exact dup of doc 3
    ]
    part = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": texts,
        "band": np.zeros(5, dtype=np.int32),
        "bucket": np.ones(5, dtype=np.uint64),
    })
    got = dedup.verify_lsh_partition(part, threshold=0.7)
    got_pairs = set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    assert (3, 4) in got_pairs
    ref = dedup.verify_lsh_bucket(part.drop(columns=["band", "bucket"]),
                                  threshold=0.7)
    ref_pairs = set(map(tuple, ref[["id_a", "id_b"]].to_numpy()))
    assert got_pairs == ref_pairs


def test_verify_partition_matches_bucket_reference_giant(monkeypatch):
    # the cross-kernel equality pin, re-run with the giant-bucket caps
    # forced on (CLASS_CAP/CLIQUE_CAP tiny) so the star paths are exercised
    monkeypatch.setattr(dedup, "CLASS_CAP", 2)
    monkeypatch.setattr(dedup, "CLIQUE_CAP", 2)
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    base = [" ".join(rng.choice(words, 12)) for _ in range(30)]
    texts = []
    for t in base:
        texts.append(t)
        if rng.random() < 0.6:
            texts.append(t)                               # exact dup
        if rng.random() < 0.6:
            texts.append(t)                               # another exact dup
        if rng.random() < 0.5:
            texts.append(t.replace("alpha", "ALPHA", 1))  # near dup
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    sig = dedup.minhash_batch(df, "text", 64, 5, 16)
    cand = sig[sig.duplicated(["band", "bucket"], keep=False)]
    cand = cand.merge(df, on="doc_id")

    def dedup_max(p):
        if len(p) == 0:
            return set()
        a = p.groupby(["id_a", "id_b"])["jaccard"].max().reset_index()
        return set(map(tuple, a.round(9).to_numpy()))

    ref_parts = [dedup.verify_lsh_bucket(g, threshold=0.4)
                 for _, g in cand.groupby(["band", "bucket"])]
    ref = dedup_max(pd.concat(ref_parts, ignore_index=True)
                    if ref_parts else pd.DataFrame())
    got = dedup_max(dedup.verify_lsh_partition(cand, threshold=0.4))
    assert got == ref and len(got) > 0


def test_hash_aggregate_categorical_keys():
    # ADVICE r3 (medium): categorical group keys (compress() output) under
    # the pandas-2.x observed=False default emitted one row per DICTIONARY
    # value per partition — a 4-key median came back as 12 rows with NaN
    # fillers. Median forces the pandas (non-Arrow) path.
    df = pd.DataFrame({
        "k": pd.Categorical([f"g{i % 4}" for i in range(40)]),
        "v": np.arange(40, dtype=np.float64),
    })
    out = agg.hash_aggregate(
        ray.data.from_pandas(df).repartition(4), ["k"],
        {"med": ("v", "median")}, num_partitions=8).to_pandas()
    assert len(out) == 4
    want = (df.groupby("k", observed=True)["v"].median()
            .reset_index().rename(columns={"v": "med"}))
    got = out.assign(k=out["k"].astype(str)).sort_values("k") \
        .reset_index(drop=True)
    want = want.assign(k=want["k"].astype(str)).sort_values("k") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_gap_fill_categorical_keys_unobserved():
    # op_gap_fill loops over groupby(keys); with a categorical key an
    # unobserved dictionary value produced an empty group whose
    # date_range(NaT, NaT) raises — observed=True must skip it
    df = pd.DataFrame({
        "k": pd.Categorical(["a", "a", "b"], categories=["a", "b", "zzz"]),
        "ts": pd.to_datetime(["2020-01-01", "2020-01-03", "2020-01-02"]),
        "v": [1.0, 2.0, 3.0],
    }).sort_values(["k", "ts"])
    out = window_ops.op_gap_fill(df, ["k"], "ts", freq="D")
    assert len(out) == 4  # a: 3 days, b: 1 day — no zzz rows
    assert set(out["k"].astype(str)) == {"a", "b"}


def test_kmv_prefilter_keeps_short_doc_pairs():
    # ADVICE r3 (low): k_eff = min(set sizes), so short docs got 0/1 KMV
    # estimates and true >=threshold pairs could be dropped before the
    # exact intersect. Pairs with min size < FILTER_K now skip the filter.
    sh_list = [np.array([5], dtype=np.uint64),
               np.array([1, 5], dtype=np.uint64)]
    # true jaccard = 1/2; KMV bottom-1 estimate = 0 (smallest distinct of
    # the merged sketches is 1, present only in the second set)
    a, b = dedup._filter_class_pairs(np.array([0]), np.array([1]),
                                     sh_list, threshold=0.5)
    assert len(a) == 1 and (a[0], b[0]) == (0, 1)


def test_verify_bucket_short_docs_exact():
    # end-to-end: two short docs (1-2 distinct windows) above threshold
    # must survive verification — the exact intersect decides, not the KMV
    g = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["abcdef", "abcdex"],
    })
    # windows(0) = {abcde, bcdef}, windows(1) = {abcde, bcdex} → j = 1/3
    pairs = dedup.verify_lsh_bucket(g, threshold=1 / 3)
    assert len(pairs) == 1
    assert pairs.iloc[0]["jaccard"] == pytest.approx(1 / 3)


def test_hash_join_overpartitioned_completes_and_warns(caplog):
    # VERDICT r3 #5 / ADVICE r3 (low): a join requested at 4x the CPU slots
    # must complete (clamp, not deadlock) and log the clamp
    left = ray.data.from_pandas(pd.DataFrame(
        {"k": np.arange(100, dtype=np.int64), "a": np.arange(100)}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": np.arange(0, 200, 2, dtype=np.int64), "b": np.arange(100)}))
    with caplog.at_level(logging.WARNING,
                         logger="forecastframe_ray.stages.join"):
        out = hash_join(left, right, on=["k"], how="inner",
                        num_partitions=16).to_pandas()  # 4 CPUs in tests
    assert len(out) == 50
    assert any("clamping num_partitions" in r.message for r in caplog.records)


def test_batch_shingle_windows_multibyte_and_bytes_passthrough():
    # ADVICE r3 (low): span bounding now uses true UTF-8 byte lengths and
    # passes pre-encoded bytes through — multi-byte docs must produce the
    # same per-doc shingle sets either way
    texts = ["héllo wörld", "日本語のテキストです", "ascii only", "慶長",
             "mixed 文字 and ascii"]
    flat, off, cnt = dedup.batch_shingle_windows(texts, 5)
    flat_b, off_b, cnt_b = dedup.batch_shingle_windows(
        [t.encode("utf-8") for t in texts], 5)
    np.testing.assert_array_equal(flat, flat_b)
    for i, t in enumerate(texts):
        got = np.unique(flat[off[i]: off[i] + cnt[i]])
        np.testing.assert_array_equal(got, dedup.shingle_hashes(t, 5))


def test_minhash_batch_multibyte_matches_per_doc_signature():
    texts = ["日本語のテキストですこれは長い文章", "héllo wörld wörld wörld",
             "plain ascii document body"]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": texts})
    out = dedup.minhash_batch(df, "text", 32, 5, 8)
    a, b = dedup._perm_params(32)
    for i, t in enumerate(texts):
        sig = dedup.minhash_signature(dedup.shingle_hashes(t, 5), a, b)
        # reconstruct the doc's band buckets from the reference signature
        from forecastframe_ray.keys import _mix_u64
        bands = sig[:32].reshape(8, 4)
        acc = np.full(8, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
        for r in range(4):
            acc = _mix_u64(acc ^ bands[:, r])
        acc = _mix_u64(acc ^ (np.arange(8, dtype=np.uint64) + np.uint64(1)))
        got = out[out["doc_id"] == i].sort_values("band")["bucket"].to_numpy()
        np.testing.assert_array_equal(got, acc)
