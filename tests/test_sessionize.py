"""Gap-based sessionization (stages/window_ops.op_sessionize): session ids
are 1-based per group, increment only across gaps > gap_seconds, and the
distributed keyed-window-stage result equals the single-frame pandas kernel.
"""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.stages.keyed import keyed_window_stage
from forecastframe_ray.stages.window_ops import op_sessionize


def _clicks() -> pd.DataFrame:
    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: three sessions (gaps of 2h and 1h; threshold 30min)
    for off in [0, 60, 300, 7500, 7560, 11400]:
        rows.append((1, base + pd.Timedelta(seconds=off)))
    # user 2: one long session, every event 29min apart (never breaks)
    for i in range(5):
        rows.append((2, base + pd.Timedelta(seconds=i * 29 * 60)))
    # user 3: single event
    rows.append((3, base))
    return pd.DataFrame(rows, columns=["user_id", "ts"])


def test_sessionize_kernel_semantics():
    df = _clicks().sort_values(["user_id", "ts"]).reset_index(drop=True)
    out = op_sessionize(df.copy(), ["user_id"], "ts", gap_seconds=1800)
    u1 = out[out.user_id == 1]["session_id"].tolist()
    assert u1 == [1, 1, 1, 2, 2, 3]
    assert out[out.user_id == 2]["session_id"].tolist() == [1] * 5
    assert out[out.user_id == 3]["session_id"].tolist() == [1]


def test_sessionize_exact_gap_is_same_session():
    # boundary: delta == gap_seconds does NOT break (strict >)
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({"user_id": [1, 1],
                       "ts": [base, base + pd.Timedelta(seconds=1800)]})
    out = op_sessionize(df, ["user_id"], "ts", gap_seconds=1800)
    assert out["session_id"].tolist() == [1, 1]


def test_sessionize_distributed_matches_local(ray_session):
    df = _clicks()
    ds = ray.data.from_pandas(df).repartition(4)
    got = (keyed_window_stage(ds, ["user_id"], "ts",
                              [{"op": "sessionize", "gap_seconds": 1800}],
                              num_partitions=3)
           .to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True))
    want = op_sessionize(
        df.sort_values(["user_id", "ts"]).reset_index(drop=True),
        ["user_id"], "ts", gap_seconds=1800)
    assert (got["session_id"].to_numpy() ==
            want["session_id"].to_numpy()).all()
