"""CCNet-style perplexity filter: forced <unk>-fold path.

The sf0.01 driver oracle (``ccnet_perplexity_documents``) pins the full
train+score chain, but that corpus has no token under ``min_count`` — the
vocabulary-truncation fold never fires there. This corpus has singleton
tokens, so the fold, the <unk> unigram mass, and <unk>-containing bigrams
are all live; expectations come from the same DuckDB SQL as the driver
oracle, run in-test.
"""

import duckdb
import numpy as np
import pandas as pd

import ray.data


DOCS = pd.DataFrame({
    "doc_id": np.arange(6, dtype=np.int64),
    "text": [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat and the dog",
        "zyzzyva alone here",            # 3 singleton tokens -> all <unk>
        "the the the",
        "cat dog cat dog xylophone",     # 1 singleton among common words
    ],
})


def _oracle(df: pd.DataFrame, min_count: int) -> pd.DataFrame:
    from forecastframe_ray.pipelines.queries import SQL_CCNET_PERPLEXITY

    con = duckdb.connect()
    con.register("documents", df)
    sql = SQL_CCNET_PERPLEXITY.replace("c >= 2", f"c >= {min_count}")
    return con.execute(sql).fetchdf()


def _engine(df: pd.DataFrame, min_count: int) -> pd.DataFrame:
    from forecastframe_ray.pipelines.textstats import ccnet_perplexity

    out = ccnet_perplexity(ray.data.from_pandas(df),
                           min_count=min_count).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def test_unk_fold_matches_oracle(ray_session):
    got = _engine(DOCS, 2)
    want = _oracle(DOCS, 2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the fold actually fired: an all-singleton doc scores like pure <unk>
    assert (got["ppl"] > 0).all()


def test_min_count_one_keeps_full_vocab(ray_session):
    got = _engine(DOCS, 1)
    want = _oracle(DOCS, 1)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # truncation changes the model: singleton-heavy docs score differently
    folded = _engine(DOCS, 2)
    assert not np.allclose(got["ppl"], folded["ppl"])
