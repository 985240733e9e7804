"""VWAP weighting and blocking-dedup kernel edges."""

import numpy as np
import pandas as pd


def test_vwap_weighting_and_zero_volume(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    ts = pd.to_datetime(["2024-01-01 01:00", "2024-01-01 02:00",
                         "2024-01-02 01:00"]).astype("datetime64[us]")
    pd.DataFrame({"event_type": ["e"] * 3, "ts": ts,
                  "value": [10.0, 20.0, 5.0],
                  "props": ['{"k": 1}', '{"k": 3}', '{"k": 0}'],
                  "user_id": [1, 1, 1]}) \
        .to_parquet(tmp_path / "events.parquet")
    out = Q.q_vwap_daily_events(str(tmp_path)).set_index("d")
    # day 1: (10*1 + 20*3) / 4 = 17.5
    assert out.loc[pd.Timestamp("2024-01-01"), "vwap"] == 17.5
    assert out.loc[pd.Timestamp("2024-01-01"), "vol"] == 4
    # day 2: zero total volume -> NULLF
    assert out.loc[pd.Timestamp("2024-01-02"), "vwap"] == -999.0


def test_char_shingles_match_sql_semantics():
    from forecastframe_ray.pipelines.queries import _char_shingles

    assert _char_shingles("abcdef") == {"abcde", "bcdef"}
    # short strings yield ONE truncated shingle (SQL greatest(len-4, 1))
    assert _char_shingles("abc") == {"abc"}
    assert _char_shingles("") == {""}


def test_blocking_dedup_pairs(ray_session, tmp_path):
    from forecastframe_ray.pipelines import queries as Q

    base = "the quick brown fox jumps over the lazy dog"
    near = "the quick brown fox jumps over the lazy cat"
    other = "completely different content that shares no prefix"
    pd.DataFrame({"doc_id": [0, 1, 2, 3],
                  "text": [base, near, base.upper(), other]}) \
        .to_parquet(tmp_path / "documents.parquet")
    out = Q.q_blocking_dedup_documents(str(tmp_path))
    pairs = set(zip(out["id_a"], out["id_b"]))
    # 0 and 2 normalize identically -> jaccard 1.0; 0-1 and 1-2 are near
    assert (0, 2) in pairs
    assert out.set_index(["id_a", "id_b"]).loc[(0, 2), "jaccard"] == 1.0
    assert (0, 1) in pairs and (1, 2) in pairs
    # doc 3 shares no block -> never compared
    assert not any(3 in p for p in pairs)
