"""End-to-end LLM training-data pipeline (second flagship): boilerplate →
C4 clean → exact dedup → MinHash near-dup → cluster → representatives,
against an independent pandas oracle and the generator's ground truth."""

import numpy as np
import pandas as pd

import ray.data

from forecastframe_ray import synth
from forecastframe_ray.pipelines import llm
from forecastframe_ray.state import checkpoint

N_DOCS = 1200
# boilerplate threshold: between max dup-class line count (~12) and the
# boilerplate pool count (~N_DOCS/20 = 60) — see synth.docs_dataset contract
MAX_REPEATS = N_DOCS // 50


def _docs():
    tbl = synth.docs_table(N_DOCS, seed=42)
    return tbl.to_pandas(), ray.data.from_arrow(tbl)


def test_exact_funnel_matches_oracle(tmp_path):
    # minhash_threshold > 1 disables near-dup removal → the output is the
    # exact funnel, which the independent per-doc pandas oracle recomputes
    df, ds = _docs()
    out = str(tmp_path / "llm")
    m = llm.run(ds, out_dir=out, minhash_threshold=1.01,
                max_repeats=MAX_REPEATS)
    expect = llm.oracle_exact_funnel(df, max_repeats=MAX_REPEATS)
    got = checkpoint.read_tier(out, "docs").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert m["docs_final"] == len(expect)
    assert m["docs_after_exact_dedup"] == len(expect)
    pd.testing.assert_frame_equal(
        got[["doc_id", "text"]],
        expect.sort_values("doc_id").reset_index(drop=True)
        .rename(columns={"text": "text"}),
        check_dtype=False)
    # funnel is monotone and actually removes junk + exact dups
    assert m["docs_final"] <= m["docs_after_exact_dedup"] \
        <= m["docs_after_clean"] <= m["docs_in"] == N_DOCS
    assert m["docs_after_clean"] < N_DOCS          # junk docs dropped
    assert m["docs_after_exact_dedup"] < m["docs_after_clean"]  # exact dups


def test_near_dup_clusters_resolve_to_one_representative(tmp_path):
    df, ds = _docs()
    out = str(tmp_path / "llm_nd")
    m = llm.run(ds, out_dir=out, minhash_threshold=0.7,
                max_repeats=MAX_REPEATS)
    got = checkpoint.read_tier(out, "docs").to_pandas()
    survivors = set(got["doc_id"])
    assert m["near_dup_pairs"] > 0
    assert m["docs_final"] < m["docs_after_exact_dedup"]

    # ground truth: every pooled template whose exact/near-dup members
    # survived cleaning must keep EXACTLY one representative (the mutation
    # is one word — Jaccard far above 0.7, detection prob ~1 at 16 bands)
    cleaned = llm.oracle_exact_funnel(df, max_repeats=MAX_REPEATS)
    cleaned_ids = set(cleaned["doc_id"])
    grp = df[df["doc_id"].isin(cleaned_ids)].groupby("template")["doc_id"]
    multi = {t: set(ids) for t, ids in grp if len(ids) >= 2}
    assert multi, "fixture must contain multi-member templates"
    for t, ids in multi.items():
        n_alive = len(ids & survivors)
        assert n_alive == 1, (t, ids & survivors)

    # no two surviving docs share identical cleaned text
    texts = cleaned.set_index("doc_id")["text"].reindex(sorted(survivors))
    assert texts.notna().all()
    assert not texts.duplicated().any()


def test_llm_checkpoint_resume_no_new_work(tmp_path):
    _, ds = _docs()
    out = str(tmp_path / "llm_resume")
    m1 = llm.run(ds, out_dir=out, max_repeats=MAX_REPEATS)
    m2 = llm.run(ds, out_dir=out, max_repeats=MAX_REPEATS)
    assert m2["docs_written"] == 0          # resume = filter, not replay
    assert m2["docs_final"] == m1["docs_final"] == m1["docs_written"]


def test_docs_corpus_deterministic_and_batch_independent():
    a = synth.docs_table(300, seed=42).to_pandas()
    b = pd.concat([
        synth._make_docs_batch(np.arange(0, 120, dtype=np.int64), 42,
                               max(1, 300 // 12)).to_pandas(),
        synth._make_docs_batch(np.arange(120, 300, dtype=np.int64), 42,
                               max(1, 300 // 12)).to_pandas(),
    ], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    kinds = a["kind"].value_counts()
    assert set(kinds.index) == {synth.DOC_UNIQUE, synth.DOC_EXACT_DUP,
                                synth.DOC_NEAR_DUP, synth.DOC_JUNK}


def test_run_with_pack_stage(ray_session, tmp_path):
    # pack_context chains packing as the funnel's last stage: metrics gain
    # chunk/token counts that must equal a local recount of the survivors
    from forecastframe_ray.pipelines import llm
    from forecastframe_ray.synth import write_docs_corpus

    src = str(tmp_path / "docs")
    write_docs_corpus(src, 2000, seed=7)
    docs = ray.data.read_parquet(src)
    out = str(tmp_path / "ckpt")
    m = llm.run(docs, out_dir=out, num_partitions=8, pack_context=256)
    assert "pack" in m and m["pack"]["context_len"] == 256
    # recount content tokens over the written survivors
    import pyarrow.dataset as pads
    kept = pads.dataset(f"{out}/tier=docs").to_table().to_pandas()
    want_tokens = int(kept["text"].str.count(r"\S+").sum())
    assert m["pack"]["content_tokens"] == want_tokens
    total_stream = want_tokens + len(kept)   # +1 separator per doc
    assert m["pack"]["chunks"] == -(-total_stream // 256)
    # span table checkpointed next to the docs
    spans = pads.dataset(f"{out}/tier=pack_spans").to_table().to_pandas()
    assert (spans.groupby("doc_id")["tok_end"].max().sum()) == want_tokens
    assert m["stage_wall_s"]["pack_s"] > 0
