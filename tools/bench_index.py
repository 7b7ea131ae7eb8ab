#!/usr/bin/env python
"""Standalone index-build throughput probe at a fixed core count.

Usage: python tools/bench_index.py --cores 8 --pages 200000 [--runs 2]
Prints one JSON line with per-run seconds and the steady-state best.
Run in its own process per core count (one JVM = one master setting).
The first run includes JVM JIT warm-up; with --runs 2 the best (warm)
run is reported as steady-state throughput.
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--pages", type=int, default=200000)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--scale", type=int, default=3,
                    help="page size multiplier (realistic CC-ish pages)")
    args = ap.parse_args()

    from document_retrieval_system_spark.operators.index_build import build_index
    from document_retrieval_system_spark.session import get_spark
    from document_retrieval_system_spark.sources.corpus import pages_df

    extra = {}
    if os.path.isdir("/dev/shm"):  # keep shuffle/spill off the shared disk
        os.makedirs("/dev/shm/drs_spark_local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/drs_spark_local"
    spark = get_spark("drs-scaling", master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    # spin up Python workers / Arrow path before the measured window
    pages_df(spark, 200).count()

    # tmpfs keeps host-disk contention out of the measurement
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    times = []
    for _ in range(args.runs):
        idx = tempfile.mkdtemp(prefix="drs_scale_idx_", dir=tmp_root)
        try:
            t0 = time.time()
            build_index(spark, pages_df(spark, args.pages, size_scale=args.scale), idx,
                        n_shards=args.shards)
            times.append(round(time.time() - t0, 3))
        finally:
            shutil.rmtree(idx, ignore_errors=True)
    best = min(times)
    print(json.dumps({
        "cores": args.cores, "pages": args.pages, "scale": args.scale, "runs": times,
        "seconds": best, "docs_per_sec": round(args.pages / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
