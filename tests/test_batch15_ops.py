"""Quantization / F1 sweep / forward as-of edges."""

import numpy as np
import pandas as pd


def test_quantization_error(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    vecs = [[127.0, -127.0, 0.0],    # exactly representable -> mse 0
            [0.0, 0.0, 0.0],         # all-zero -> scale 0, mse 0
            [1.0, 0.3, -0.6]]
    pd.DataFrame({"vec_id": range(3),
                  "embedding": [np.array(v, dtype=np.float32)
                                for v in vecs],
                  "label": np.zeros(3, dtype="int32")}) \
        .to_parquet(tmp_path / "embeddings.parquet")
    out = Q.q_quantization_error_embeddings(str(tmp_path)) \
        .set_index("vec_id")
    assert out.loc[0, "scale"] == 1.0
    assert out.loc[0, "mse"] == 0.0
    assert out.loc[1, "scale"] == 0.0 and out.loc[1, "mse"] == 0.0
    assert out.loc[2, "mse"] > 0


def test_best_f1_threshold(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    # en docs have long texts: threshold 100 separates perfectly
    pd.DataFrame({"doc_id": range(6),
                  "n_chars": [200, 150, 100, 50, 40, 30],
                  "lang": ["en", "en", "en", "de", "de", "fr"],
                  "text": ["x"] * 6, "source": ["s"] * 6}) \
        .to_parquet(tmp_path / "documents.parquet")
    out = Q.q_best_f1_threshold_documents(str(tmp_path))
    assert out.loc[0, "threshold"] == 100
    assert out.loc[0, "f1"] == 1.0
    assert out.loc[0, "precision"] == 1.0
    assert out.loc[0, "recall"] == 1.0


def test_asof_forward(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    ts = pd.to_datetime([
        "2024-01-01 10:00",   # purchase (user 1)
        "2024-01-01 09:00",   # click before -> not eligible
        "2024-01-01 11:00",   # click after  -> the match
        "2024-01-01 12:00",   # later click ignored
        "2024-01-02 10:00",   # purchase (user 2), no click -> sentinel
    ]).astype("datetime64[us]")
    pd.DataFrame({"event_id": range(5),
                  "user_id": [1, 1, 1, 1, 2], "ts": ts,
                  "event_type": ["purchase", "click", "click", "click",
                                 "purchase"],
                  "value": [0.0, 1.0, 2.0, 3.0, 0.0]}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_asof_forward_events(str(tmp_path)).set_index("event_id")
    assert out.loc[0, "click_value"] == 2.0
    assert out.loc[0, "click_ts"] == pd.Timestamp("2024-01-01 11:00")
    assert out.loc[4, "click_value"] == -999.0
    assert out.loc[4, "click_ts"] == pd.Timestamp("9999-12-31")
