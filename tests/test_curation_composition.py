"""End-to-end curation composition: dedup funnel → temperature mixture →
deterministic split → fixed-context packing, chained over the real sf0.001
documents table — the full training-data preparation path one pipeline
invocation at a time, with per-stage invariants."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray.pipelines import dedup, llm
from forecastframe_ray.pipelines.corpus import pack_chunk_stats, pack_token_stream
from forecastframe_ray.stages.sample import hash_split, mixture_sample


def test_full_curation_composition(ray_session):
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"])
    n_in = docs.count()

    # 1. funnel (clean + exact + near-dup); the 50-doc sf0.001 synthetic
    # texts are single-line fragments, so relax the C4 line rules that
    # target real crawl pages
    final, funnel = llm.dedup_pipeline(docs, num_partitions=4,
                                       min_words_per_line=1,
                                       require_terminal=False)
    # the funnel projects to (doc_id, text); re-attach lang by id (tiny
    # broadcast lookup — at scale this is the usual metadata join-back)
    lang_map = dict(zip(*[docs.select_columns(["doc_id", "lang"])
                          .to_pandas()[c] for c in ("doc_id", "lang")]))

    def add_lang(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["lang"] = b["doc_id"].map(lang_map)
        return b

    final = final.map_batches(add_lang, batch_format="pandas").materialize()
    n_clean = final.count()
    assert 0 < n_clean < n_in

    # 2. temperature mixture over lang (T=0.5 concentrates on big langs)
    mixed = mixture_sample(final, "lang", "doc_id", budget_frac=0.6,
                           temperature=0.5).materialize()
    n_mixed = mixed.count()
    assert 0 < n_mixed < n_clean

    # 3. deterministic split
    tagged = hash_split(mixed, "doc_id",
                        {"train": 0.8, "val": 0.1, "test": 0.1})
    parts = tagged.to_pandas()
    assert set(parts["split"].unique()) <= {"train", "val", "test"}
    assert len(parts) == n_mixed

    # 4. pack the train split into 512-token chunks
    train = tagged.map_batches(lambda b: b[b["split"] == "train"],
                               batch_format="pandas")
    spans = pack_token_stream(train, 512, num_partitions=4).materialize()
    stats = pack_chunk_stats(spans).to_pandas()

    # invariants: every train doc's tokens fully covered, chunks bounded
    tdf = train.to_pandas()
    want_tokens = int(tdf["text"].str.count(r"\S+").sum())
    assert int(stats["n_content_tokens"].sum()) == want_tokens
    assert (stats["n_content_tokens"] <= 512).all()
    total_stream = want_tokens + len(tdf)
    assert stats["chunk_id"].max() == (total_stream - 1) // 512

    # determinism: the whole chain reproduces bit-identically
    mixed2 = mixture_sample(final, "lang", "doc_id", budget_frac=0.6,
                            temperature=0.5)
    assert set(mixed2.to_pandas()["doc_id"]) == set(parts["doc_id"])
