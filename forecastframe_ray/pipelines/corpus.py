"""Corpus-construction ops for LLM training data: vocabulary building and
fixed-size token chunking.

No analog in the reference (it holds no text columns); both are standard
pretraining-pipeline stages (tokenizer-training word counts; packing docs
into fixed-length training windows with overlap).

Scale shapes
------------
``token_vocabulary`` is combiner-first like the tier cascade: each batch
emits its own (token, partial-count) rows (a pandas ``value_counts`` —
the shuffle moves per-batch DISTINCT tokens, never the raw token stream),
one coarse-hash partition merge sums per token, and the global top-k is a
per-block local top-k cut (top-k is idempotent over unions of partial
top-ks once counts are final) followed by a ≤ blocks × k driver cut.

``chunk_documents`` is a stateless exploding map — zero shuffles; output
rows carry only (id, chunk_id, n_tokens, chunk_text).
"""

from __future__ import annotations

import pandas as pd

from forecastframe_ray.stages.agg import hash_aggregate


def token_vocabulary(ds, text_col: str = "text", top_k: int = 1000,
                     num_partitions: int = 64) -> pd.DataFrame:
    """Corpus-wide whitespace-token counts, top-``top_k`` by
    ``(count desc, token asc)`` — the deterministic tie-break makes the
    cutoff stable across block layouts and cluster shapes.

    Returns a small pandas DataFrame ``(token, n)`` (≤ top_k rows); the
    driver-side merge sees at most ``num_partitions × top_k`` rows.
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[text_col].str.split().explode().dropna().value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    counts = hash_aggregate(ds.map_batches(partial, batch_format="pandas"),
                            ["token"], {"n": ("n", "sum")},
                            num_partitions=num_partitions)

    def cut(b: pd.DataFrame) -> pd.DataFrame:
        # tokens are unique after the merge, so any local top-k contains
        # every global top-k row that falls in this block
        return (b.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").head(top_k))

    tops = counts.map_batches(cut, batch_size=None, batch_format="pandas")
    df = tops.to_pandas()
    df["n"] = df["n"].astype("int64")
    return (df.sort_values(["n", "token"], ascending=[False, True],
                           kind="mergesort").head(top_k)
              .reset_index(drop=True))


def chunk_batch(batch: pd.DataFrame, text_col: str, id_col: str,
                size: int, stride: int) -> pd.DataFrame:
    """One output row per (doc, chunk): chunk ``c`` covers tokens
    ``[c*stride, c*stride+size)``; starts run while ``start < n_tokens`` so
    tail chunks are shorter, token-less docs emit nothing.  Chunk text is
    the single-space join of its tokens (NOT a substring of the original —
    runs of whitespace collapse, the documented normalization)."""
    toks = batch[text_col].str.split()
    ids, cids, ns, texts = [], [], [], []
    for did, t in zip(batch[id_col].to_numpy(), toks):
        if not isinstance(t, list):
            continue
        for c, s in enumerate(range(0, len(t), stride)):
            piece = t[s:s + size]
            ids.append(did)
            cids.append(c)
            ns.append(len(piece))
            texts.append(" ".join(piece))
    return pd.DataFrame({
        id_col: pd.Series(ids, dtype="int64"),
        "chunk_id": pd.Series(cids, dtype="int64"),
        "n_tokens": pd.Series(ns, dtype="int64"),
        "chunk_text": pd.Series(texts, dtype="object"),
    })


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    size: int = 512, stride: int | None = None):
    """Split docs into fixed-token-count training chunks (``stride`` <
    ``size`` overlaps consecutive chunks; default no overlap)."""
    st = stride or size
    if st <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    return ds.map_batches(
        lambda b: chunk_batch(b, text_col, id_col, size, st),
        batch_format="pandas")
