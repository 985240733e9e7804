"""Cluster entry point for the LLM training-data funnel — submit with:

    ray job submit --working-dir . -- python jobs/run_llm.py \\
        --input s3://bucket/docs/ --out s3://bucket/clean_docs/ \\
        --num-partitions 2048

Runs boilerplate removal → C4 clean → exact dedup → MinHash near-dup →
connected components → keep representatives, with checkpointed
partitioned output: re-submitting the same job after a failure skips
finished (docs, partition) pairs and writes only the remainder.

On the fixed-size cluster the same script runs unchanged at N and 4N
nodes; ``--num-partitions`` (≈2–4× total cluster cores) sizes every
shuffle and the output layout.

Local smoke (sandbox): ``python jobs/run_llm.py --synth-docs 50000
--out /tmp/llmrun``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running as a script puts jobs/ (not the repo root) on sys.path; under
# `ray job submit --working-dir .` the working dir is the root already
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet docs dir (doc_id, text, ...)")
    ap.add_argument("--synth-docs", type=int, default=0,
                    help="generate a deterministic synthetic corpus instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--minhash-threshold", type=float, default=0.7)
    ap.add_argument("--max-repeats", type=int, default=3,
                    help="boilerplate line corpus-frequency cutoff")
    ap.add_argument("--pack-context", type=int, default=0,
                    help="when > 0, pack survivors into fixed-context "
                         "training chunks and checkpoint the span table")
    args = ap.parse_args()

    import ray

    from forecastframe_ray.logutil import silence_schema_hash_warning
    silence_schema_hash_warning()
    if not ray.is_initialized():  # under `ray job submit` the cluster exists
        ray.init(address="auto" if args.input else "local",
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # see jobs/run_tiers.py: reservation starves the hot map stages in
    # combiner-reduced DAGs; every wide stage here pre-reduces its input
    ctx.op_resource_reservation_enabled = False

    from forecastframe_ray.pipelines import llm

    if args.synth_docs:
        # parquet-backed (not a materialized Dataset): the boilerplate
        # passes re-read the corpus from storage by design
        from forecastframe_ray import synth
        corpus = os.path.join(args.out, "_synth_input")
        if not os.path.isdir(corpus) or not os.listdir(corpus):
            synth.write_docs_corpus(corpus, args.synth_docs, seed=42)
        docs = ray.data.read_parquet(corpus, columns=["doc_id", "text"])
    else:
        docs = ray.data.read_parquet(args.input, columns=["doc_id", "text"])

    metrics = llm.run(docs, out_dir=args.out,
                      minhash_threshold=args.minhash_threshold,
                      max_repeats=args.max_repeats,
                      num_partitions=args.num_partitions,
                      pack_context=args.pack_context or None)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
