"""GPT-style token-stream packing (corpus.pack_token_stream): invariants,
edge cases, and equality with a serial reference packer."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from forecastframe_ray.pipelines.corpus import pack_chunk_stats, pack_token_stream


def serial_pack(texts: dict[int, str], L: int, sep: int) -> pd.DataFrame:
    """Straight-line reference: walk the concatenated stream doc by doc."""
    rows, pos = [], 0
    for doc_id in sorted(texts):
        n = len(texts[doc_id].split())
        g0 = pos
        pos += n + sep
        if n == 0:
            continue
        for c in range(g0 // L, (g0 + n - 1) // L + 1):
            rows.append({"doc_id": doc_id, "chunk_id": c,
                         "tok_start": max(0, c * L - g0),
                         "tok_end": min(n, (c + 1) * L - g0)})
    return pd.DataFrame(rows, dtype="int64")


def _run(texts: dict[int, str], L: int, sep: int = 1, **kw) -> pd.DataFrame:
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ds = ray.data.from_pandas(df).repartition(3)
    out = pack_token_stream(ds, L, sep_tokens=sep, **kw).to_pandas()
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True) \
        .astype("int64")


def test_pack_matches_serial_reference():
    rng = np.random.default_rng(7)
    words = ["aa", "bb", "cc", "dd"]
    texts = {i: " ".join(rng.choice(words, rng.integers(0, 40)))
             for i in range(200)}
    got = _run(texts, L=64, sep=1, bucket_docs=32, num_partitions=4)
    want = serial_pack(texts, 64, 1).sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_pack_doc_spanning_many_chunks():
    texts = {0: "x " * 5, 1: "y " * 300, 2: "z"}  # doc 1 crosses 5 chunks
    got = _run(texts, L=64, sep=1, bucket_docs=2, num_partitions=2)
    want = serial_pack(texts, 64, 1)
    pd.testing.assert_frame_equal(got, want)
    assert (got[got.doc_id == 1]["chunk_id"].diff().dropna() == 1).all()


def test_pack_empty_and_whitespace_docs_advance_nothing_but_sep():
    texts = {0: "a b c", 1: "", 2: "   ", 3: "d e"}
    got = _run(texts, L=4, sep=1, bucket_docs=2)
    want = serial_pack(texts, 4, 1)
    pd.testing.assert_frame_equal(got, want)
    assert set(got["doc_id"]) == {0, 3}  # empty docs emit no spans


def test_pack_span_invariants_and_chunk_totals():
    rng = np.random.default_rng(9)
    texts = {i: " ".join(["w"] * rng.integers(1, 30)) for i in range(150)}
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ds = ray.data.from_pandas(df).repartition(4)
    spans = pack_token_stream(ds, 32, sep_tokens=2, bucket_docs=64,
                              num_partitions=4)
    out = spans.to_pandas()
    # every span non-empty, inside the doc, spans per doc partition the doc
    assert (out["tok_end"] > out["tok_start"]).all()
    per_doc = out.groupby("doc_id")["tok_end"].max()
    n_tok = {i: len(t.split()) for i, t in texts.items()}
    assert all(per_doc[i] == n_tok[i] for i in per_doc.index)
    covered = (out["tok_end"] - out["tok_start"]).groupby(out["doc_id"]).sum()
    assert all(covered[i] == n_tok[i] for i in covered.index)
    # chunk content totals never exceed the context length; all chunks but
    # the last hold exactly L stream positions (content + separators)
    stats = pack_chunk_stats(spans).to_pandas()
    assert (stats["n_content_tokens"] <= 32).all()
    total_stream = sum(n_tok.values()) + 2 * len(texts)
    assert stats["n_content_tokens"].sum() == sum(n_tok.values())
    assert stats["chunk_id"].max() == (total_stream - 1) // 32


def test_pack_rejects_bad_context_len():
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError):
        pack_token_stream(ds, 0)
