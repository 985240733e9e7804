"""k-means E-step assignment (queries.q_kmeans_assign_embeddings)."""

import numpy as np
import pandas as pd


def _write_embeddings(tmp_path, vecs):
    pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
        "label": np.zeros(len(vecs), dtype=np.int32),
    }).to_parquet(tmp_path / "embeddings.parquet")


def test_kmeans_assign_nearest_and_tiebreak(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    d = 4
    # seeds: 8 well-separated unit-axis-ish vectors; then probes
    seeds = [np.eye(d)[i % d] * (1 + i // d) for i in range(8)]
    probes = [
        seeds[3] + 0.01,            # clearly nearest seed 3
        np.zeros(d),                # equidistant to several -> lowest wins
    ]
    _write_embeddings(tmp_path, seeds + probes)
    out = Q.q_kmeans_assign_embeddings(str(tmp_path)) \
        .set_index("vec_id")
    # each seed assigns to itself with dist2 == 0
    for i in range(8):
        assert out.loc[i, "cluster"] == i
        assert out.loc[i, "dist2"] == 0.0
    assert out.loc[8, "cluster"] == 3
    # zero vector: dist2 to seed i is ||seed_i||²; seeds 0..3 all norm 1 ->
    # tie -> lowest cluster index 0
    assert out.loc[9, "cluster"] == 0
    np.testing.assert_allclose(out.loc[9, "dist2"], 1.0)
