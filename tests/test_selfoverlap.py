"""Cross-doc duplicate spans and CCNet quality buckets: broadcast vs
forced-distributed path equality, self-repetition exclusion, tercile
invariants."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.pipelines.decontaminate import self_overlap
from forecastframe_ray.pipelines.tfidf import quality_buckets


def _canon(df):
    return df.sort_values("doc_id").reset_index(drop=True)


def _corpus():
    span = "the quick brown fox jumps over the lazy dog tonight"
    uniq = [" ".join(f"u{i}w{j}" for j in range(12)) for i in range(6)]
    texts = [
        uniq[0] + " " + span,          # shares span with doc 1
        span + " " + uniq[1],
        uniq[2],                       # clean
        uniq[3] + " " + uniq[3],       # self-repeats only: must NOT flag
        uniq[4],
        uniq[5],
    ]
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})


def test_self_overlap_flags_shared_spans_not_self_repeats():
    ds = ray.data.from_pandas(_corpus())
    out = _canon(self_overlap(ds, n=8).to_pandas())
    flagged = out.loc[out["has_dup_span"], "doc_id"].tolist()
    assert flagged == [0, 1]
    # docs 0 and 1 share exactly the 3 distinct 8-grams of the 10-word span
    assert out.loc[out["doc_id"] == 0, "n_shared"].iloc[0] == 3
    # the self-repeating doc 3 contains repeated 8-grams but shares none
    assert out.loc[out["doc_id"] == 3, "n_shared"].iloc[0] == 0


def test_self_overlap_distributed_path_matches_broadcast():
    ds = ray.data.from_pandas(_corpus()).repartition(3)
    a = _canon(self_overlap(ds, n=8).to_pandas())
    b = _canon(self_overlap(ds, n=8, broadcast_threshold=0,
                            num_partitions=4).to_pandas())
    pd.testing.assert_frame_equal(
        a[["doc_id", "n_shared", "has_dup_span"]],
        b[["doc_id", "n_shared", "has_dup_span"]])


def test_quality_buckets_terciles():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(8, 40)))
             for _ in range(60)]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(60, dtype=np.int64), "text": texts}))
    out = quality_buckets(ds).to_pandas()
    sizes = out.groupby("bucket").size()
    assert set(sizes.index) == {"head", "middle", "tail"}
    assert sizes.max() - sizes.min() <= 1  # terciles of 60 docs
    # bucket order must follow the score order
    assert (out.loc[out["bucket"] == "tail", "lm_logprob"].max()
            <= out.loc[out["bucket"] == "middle", "lm_logprob"].min())
    assert (out.loc[out["bucket"] == "middle", "lm_logprob"].max()
            <= out.loc[out["bucket"] == "head", "lm_logprob"].min())
