"""TF-IDF / unigram-LM scoring and stratified sampling: broadcast vs
forced distributed-join path equality, quota exactness, determinism."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from forecastframe_ray.pipelines.tfidf import (
    doc_term_freqs, tfidf_top_terms, unigram_doc_logprob)
from forecastframe_ray.stages.sample import stratified_sample


def _docs(n=40, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
             for _ in range(n)]
    texts[7] = ""  # zero-token doc must be omitted from LM scores
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _canon(df, by):
    return df.sort_values(by).reset_index(drop=True)


def test_doc_term_freqs_counts():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b a", "  b   c "]})
    out = doc_term_freqs(ray.data.from_pandas(df)).to_pandas()
    got = {(r.doc_id, r.token): r.tf for r in out.itertuples()}
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "b"): 1, (2, "c"): 1}


def test_tfidf_join_path_matches_broadcast():
    docs = ray.data.from_pandas(_docs()).repartition(4)
    a = tfidf_top_terms(docs, k=3).to_pandas()
    b = tfidf_top_terms(docs, k=3, broadcast_limit=0).to_pandas()
    cols = ["doc_id", "token", "tf", "tfidf"]
    pd.testing.assert_frame_equal(_canon(a[cols], ["doc_id", "token"]),
                                  _canon(b[cols], ["doc_id", "token"]))
    assert (a.groupby("doc_id").size() <= 3).all()


def test_unigram_join_path_matches_broadcast():
    docs = ray.data.from_pandas(_docs()).repartition(4)
    a = unigram_doc_logprob(docs).to_pandas()
    b = unigram_doc_logprob(docs, broadcast_limit=0).to_pandas()
    cols = ["doc_id", "n_tokens", "lm_logprob"]
    pd.testing.assert_frame_equal(_canon(a[cols], ["doc_id"]),
                                  _canon(b[cols], ["doc_id"]))
    assert 7 not in set(a["doc_id"])  # empty doc omitted
    assert (a["lm_logprob"] < 0).all()


def test_unigram_single_token_corpus():
    # degenerate: every token identical -> p=1, logprob exactly 0
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["x x x", "x"]}))
    out = unigram_doc_logprob(docs).to_pandas()
    assert out["lm_logprob"].tolist() == [0.0, 0.0]
    assert sorted(out["n_tokens"].tolist()) == [1, 3]


def test_stratified_sample_exact_quota_and_determinism():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": np.arange(500, dtype=np.int64),
        "grp": rng.choice(["a", "b", "c"], size=500),
        "v": rng.standard_normal(500),
    })
    # group "d" smaller than the quota keeps all its rows
    small = pd.DataFrame({"k": np.arange(500, 503, dtype=np.int64),
                          "grp": "d", "v": 0.0})
    full = pd.concat([df, small], ignore_index=True)
    ds = ray.data.from_pandas(full)
    out1 = stratified_sample(ds, ["grp"], "k", k=10).to_pandas()
    out2 = stratified_sample(ds.repartition(7), ["grp"], "k",
                             k=10, num_partitions=5).to_pandas()
    sizes = out1.groupby("grp").size().to_dict()
    assert sizes == {"a": 10, "b": 10, "c": 10, "d": 3}
    pd.testing.assert_frame_equal(_canon(out1, ["k"])[["k", "grp", "v"]],
                                  _canon(out2, ["k"])[["k", "grp", "v"]])


def test_stratified_sample_rejects_bad_k():
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "grp": ["a"]}))
    with pytest.raises(ValueError):
        stratified_sample(ds, ["grp"], "k", k=0)


def test_extract_json_int_missing_and_negative():
    from forecastframe_ray.functions.scalar import extract_json_int

    df = pd.DataFrame({"props": ['{"k": 7}', '{"k": -3, "z": 1}',
                                 '{"z": 9}', None, '{"k":42}']})
    out = extract_json_int(ray.data.from_pandas(df), "props", "k").to_pandas()
    got = out["k"].tolist()
    assert got[0] == 7 and got[1] == -3 and got[4] == 42
    assert pd.isna(got[2]) and pd.isna(got[3])


def test_label_centroids_matches_numpy():
    from forecastframe_ray.pipelines.similarity import label_centroids

    rng = np.random.default_rng(2)
    M = rng.standard_normal((40, 5))
    labels = rng.integers(0, 3, size=40)
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": list(M), "label": labels})
    out = (label_centroids(ray.data.from_pandas(df).repartition(4))
           .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True))
    for lab in range(3):
        want = np.round(M[labels == lab].mean(axis=0), 6)
        got = out.loc[out["label"] == lab, "centroid"].to_numpy()
        np.testing.assert_allclose(got, want, atol=1e-9)
        assert (out.loc[out["label"] == lab, "n"] == (labels == lab).sum()).all()


def test_bigram_join_path_matches_broadcast():
    from forecastframe_ray.pipelines.tfidf import bigram_doc_logprob

    docs = ray.data.from_pandas(_docs()).repartition(4)
    a = bigram_doc_logprob(docs).to_pandas()
    b = bigram_doc_logprob(docs, broadcast_limit=0).to_pandas()
    cols = ["doc_id", "n_bigrams", "lm_logprob", "perplexity"]
    pd.testing.assert_frame_equal(_canon(a[cols], ["doc_id"]),
                                  _canon(b[cols], ["doc_id"]))
    assert 7 not in set(a["doc_id"])  # empty doc has no bigrams
    # add-one smoothing keeps every probability < 1 → logprob < 0, ppl > 1
    assert (a["lm_logprob"] < 0).all()
    assert (a["perplexity"] > 1).all()


def test_bigram_freqs_adjacency():
    from forecastframe_ray.pipelines.tfidf import doc_bigram_freqs

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b a b", "c"]})
    out = doc_bigram_freqs(ray.data.from_pandas(df)).to_pandas()
    got = {(r.doc_id, r.w1, r.w2): r.tf for r in out.itertuples()}
    # doc 2 has a single token → no bigrams; doc boundaries never pair
    assert got == {(1, "a", "b"): 2, (1, "b", "a"): 1}
