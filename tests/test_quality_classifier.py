"""Trained quality/language classifier (textstats.fit_quality_logistic):
distributed IRLS pinned against an independent single-node numpy IRLS on
the same features, plus a separation sanity check on the sf0.001
documents corpus."""

import numpy as np
import pyarrow.parquet as pq
import ray.data

from forecastframe_ray.pipelines import textstats as T

SF = "/root/testdata/sf0.001"


def _features(df):
    q = T.quality_batch(df[["text"]].reset_index(drop=True))
    return np.column_stack([np.ones(len(df)),
                            q["stopword_frac"].to_numpy(np.float64),
                            q["alpha_ratio"].to_numpy(np.float64)])


def ref_irls(X, y, iters=2):
    beta = np.zeros(X.shape[1])
    for _ in range(iters):
        eta = X @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = np.maximum(mu * (1.0 - mu), 1e-12)
        z = eta + (y - mu) / w
        Xw = X * w[:, None]
        beta = np.linalg.solve(X.T @ Xw, Xw.T @ z)
    return beta


def test_fit_matches_single_node_irls():
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text", "lang"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ds = ray.data.from_pandas(df)
    state = T.fit_quality_logistic(
        ds, lambda b: (b["lang"] == "en").to_numpy())
    want = ref_irls(_features(df), (df["lang"] == "en").to_numpy(float))
    np.testing.assert_allclose(state["beta"], want, rtol=1e-9)


def test_classifier_separates_when_signal_exists():
    """On a corpus with a REAL stopword signal the fitted model separates
    the classes decisively. (The sf testdata's ``lang`` column does NOT
    carry such signal — its texts come from the same template pool for
    every tag — so the oracled driver entry pins the FIT exactly rather
    than claiming accuracy there.)"""
    import pandas as pd
    rng = np.random.default_rng(4)
    stopish = ("the of and to in a is that it for on with as was at by "
               "an be this have").split()
    rarew = ["zq%04dx" % i for i in range(400)]
    rows = []
    for i in range(120):
        if i % 2:  # stopword-rich "good" docs
            words = list(rng.choice(stopish, 30)) + \
                list(rng.choice(rarew, 10))
        else:      # stopword-free docs
            words = list(rng.choice(rarew, 40))
        rows.append((i, " ".join(words), "en" if i % 2 else "xx"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    ds = ray.data.from_pandas(df)
    state = T.fit_quality_logistic(
        ds, lambda b: (b["lang"] == "en").to_numpy())
    scored = T.score_quality_logistic(ds, state).to_pandas()
    p_en = scored.loc[scored["lang"] == "en", "p_quality"]
    p_other = scored.loc[scored["lang"] != "en", "p_quality"]
    assert p_en.min() > 0.9 and p_other.max() < 0.1
