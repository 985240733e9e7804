"""Gorilla codec micro-bench: regular gap-filled grid vs fully irregular
stream (the codec's worst case — every point changes with irregular deltas).

Pure numpy, no Ray. Run on an IDLE box: this VM's throughput swings 3-4x
between hypervisor windows (BASELINE.md), so only same-window numbers are
comparable. Prints one JSON line with min-of-5 per op in ms.

Usage: python tools/gorilla_microbench.py [n_points]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from forecastframe_ray.stages import gorilla as G  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rng = np.random.default_rng(7)
    cases = {
        # hourly grid, piecewise-constant values: the tier-pipeline design case
        "regular": (
            np.arange(n, dtype=np.int64) * 3_600_000_000,
            np.repeat(rng.integers(0, 50, n // 100 + 1).astype(np.float64),
                      100)[:n],
        ),
        # jittered second-scale deltas, random-walk floats: every point changes
        "irregular": (
            np.cumsum(rng.integers(1, 120_000_000, n).astype(np.int64)),
            np.cumsum(rng.normal(0, 1, n)),
        ),
    }
    out = {"n_points": n}
    for name, (ts, vals) in cases.items():
        tp = G.encode_timestamps(ts)
        vp = G.encode_values(vals)
        assert np.array_equal(G.decode_timestamps(tp, n), ts)
        assert np.array_equal(
            G.decode_values(vp, n).view(np.uint64),
            np.ascontiguousarray(vals, dtype=np.float64).view(np.uint64))
        r = {"enc_ts": [], "enc_val": [], "dec_ts": [], "dec_val": []}
        for _ in range(5):
            t0 = time.perf_counter(); G.encode_timestamps(ts)
            t1 = time.perf_counter(); G.encode_values(vals)
            t2 = time.perf_counter(); G.decode_timestamps(tp, n)
            t3 = time.perf_counter(); G.decode_values(vp, n)
            t4 = time.perf_counter()
            r["enc_ts"].append(t1 - t0); r["enc_val"].append(t2 - t1)
            r["dec_ts"].append(t3 - t2); r["dec_val"].append(t4 - t3)
        out[name] = {k: round(min(v) * 1e3, 1) for k, v in r.items()}
        out[name]["bytes"] = [len(tp), len(vp)]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
