"""Cluster entry point for the flagship tier pipeline — submit with:

    ray job submit --working-dir . -- python jobs/run_tiers.py \\
        --input s3://bucket/pages/ --out s3://bucket/tiers/ \\
        --num-partitions 2048

On the fixed-size cluster the same script runs unchanged at N and 4N
nodes; partitioning is sized by ``--num-partitions`` (≈2–4× total cluster
cores), and the checkpoint manifest makes re-submission resume-only (a
failed run skips completed (tier, partition) pairs).

Local smoke (sandbox): ``python jobs/run_tiers.py --synth-pages 100000
--out /tmp/tiers``.
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
    ap.add_argument("--input", help="parquet pages dir (url, warc_ts, html, ...)")
    ap.add_argument("--synth-pages", type=int, default=0,
                    help="generate a deterministic synthetic corpus instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--series-keys", default="host")
    ap.add_argument("--no-compress", action="store_true")
    ap.add_argument("--append", metavar="DELTA_ID",
                    help="continuous-aggregate mode: fold the input batch "
                         "into the existing tier store at --out (exact "
                         "algebraic merge, idempotent per DELTA_ID) instead "
                         "of a full build")
    ap.add_argument("--expire-1h-before", type=int, default=None,
                    metavar="EPOCH_US",
                    help="retention sweep: drop 1h buckets older than this "
                         "epoch-microsecond cutoff (idempotent; footer-stats "
                         "skip makes repeat sweeps metadata-only)")
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
    # per-operator resource reservation starves the hot map stage in this
    # short combiner-reduced DAG (see bench.py _init_ray); upstream output
    # is pre-reduced so reservation's flood protection is moot here
    ctx.op_resource_reservation_enabled = False

    from forecastframe_ray import synth
    from forecastframe_ray.pipelines import web

    if args.expire_1h_before is not None and not args.synth_pages \
            and not args.input:
        from forecastframe_ray.state import checkpoint
        rows = checkpoint.expire_tier(args.out, "1h", args.expire_1h_before)
        print(json.dumps({"expired_partitions": len(rows)}))
        ray.shutdown()
        return 0

    if args.synth_pages:
        pages = synth.pages_dataset(args.synth_pages, seed=42, num_domains=2000)
    else:
        pages = ray.data.read_parquet(args.input)

    if args.append:
        rows = web.append_tiers(
            pages, args.out, delta_id=args.append,
            series_keys=tuple(args.series_keys.split(",")),
            num_partitions=args.num_partitions,
            refresh_compressed=not args.no_compress)
        metrics = {"mode": "append", "delta_id": args.append,
                   "merged_partitions": len(rows)}
    else:
        metrics = web.run(pages, out_dir=args.out,
                          series_keys=tuple(args.series_keys.split(",")),
                          num_partitions=args.num_partitions,
                          compress=not args.no_compress)
    if args.expire_1h_before is not None:
        from forecastframe_ray.state import checkpoint
        metrics["expired_partitions"] = len(
            checkpoint.expire_tier(args.out, "1h", args.expire_1h_before))
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
