"""Cluster job entry point for filter builds -- the `ray job submit` shape
of the north rule:

    ray job submit --working-dir . -- python scripts/build_job.py \
        --input /data/pages/*.parquet --key-col url \
        --kind sbbf --params '{"bits_per_key": 10}' \
        --checkpoint-dir /ckpt/run1 [--probe-self] [--self-check] \
        [--num-partitions N]

Resumable: the checkpoint dir holds one Parquet row per built partition
(payload + lineage metrics); a resubmitted job anti-joins finished
partition ids and rebuilds only the missing ones
(raysketch.pipeline.build_filter_table).  In this sandbox run it directly:

    python scripts/build_job.py --input /root/testdata/sf0.001 \
        --derive-pages --kind xorf --params '{"fp_bits":16,"arity":3}' \
        --checkpoint-dir /tmp/ckpt1 --probe-self
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet path/glob, or an sf dir with --derive-pages")
    ap.add_argument("--derive-pages", action="store_true",
                    help="treat --input as a testdata sf dir and derive the "
                         "CC-style pages table")
    ap.add_argument("--key-col", default="url")
    ap.add_argument("--kind", default="sbbf",
                    choices=["sbbf", "xorf", "ribbon"])
    ap.add_argument("--params", default="{}", help="json filter params")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--num-partitions", type=int, default=0,
                    help="0 = derive from corpus size (~1M keys/partition)")
    ap.add_argument("--probe-self", action="store_true",
                    help="probe all input keys after build and assert zero "
                         "false negatives")
    ap.add_argument("--self-check", action="store_true",
                    help="re-probe each partition's own keys INSIDE the "
                         "build task (distributed zero-FN verify; no "
                         "driver state, no extra shuffle)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():          # ray job submit initialises for us
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raysketch.pipeline import (build_filter_table,
                                    choose_num_partitions, probe)

    if args.derive_pages:
        from raysketch.pages import pages_dataset
        ds = pages_dataset(args.input)
    else:
        from raysketch.util import read_parquet_sized
        ds = read_parquet_sized(args.input, columns=[args.key_col])
    ds = ds.materialize()

    n = ds.count()
    P = args.num_partitions or choose_num_partitions(n, kind=args.kind)
    t0 = time.perf_counter()
    ft = build_filter_table(ds, args.key_col, args.kind,
                            json.loads(args.params), num_partitions=P,
                            checkpoint_dir=args.checkpoint_dir,
                            self_check=args.self_check).materialize()
    build_s = time.perf_counter() - t0
    pdf = ft.to_pandas()
    report = {
        "rows": int(n), "n_keys": int(pdf["n_keys"].sum()),
        "num_partitions": P, "built_partitions": len(pdf),
        "kind": args.kind, "wall_s": round(build_s, 3),
        "mem_bytes": int(pdf["mem_bytes"].sum()),
        "checkpoint_dir": args.checkpoint_dir,
    }
    failed = False
    if args.probe_self:
        hits = probe(ft, ds, args.key_col).sum("hit")
        report["self_probe_hits"] = int(hits)
        report["zero_false_negatives"] = bool(hits == n)
        failed = hits != n        # report prints first; -O-safe exit code
    print(json.dumps(report))
    if failed:
        print("ERROR: false negatives detected", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
