#!/usr/bin/env python
"""Extra benchmark tooling for the optimization rounds (bench.py is the
frozen driver contract; this file hosts everything else).

Usage:
  python bench_extra.py [--sf DIR] [--passes N] [--explain DIR] [--noop] q1 q2 ...

Times each named query from entry_queries.QUERIES with the same
methodology as bench.py (best-of-N interleaved passes, .collect() sink
by default, ``--noop`` switches to the noop sink per guide §1.4), labels
jobs via setJobDescription, and optionally writes
``<explain-dir>/<query>.txt`` with the formatted physical plan.

Prints one JSON line: {"sf": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="directory for .explain('formatted') captures")
    ap.add_argument("--noop", action="store_true",
                    help="use the noop sink instead of collect()")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from document_retrieval_system_spark.entry_queries import QUERIES
    from document_retrieval_system_spark.session import get_spark

    spark = get_spark("drs-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries or list(QUERIES)

    # warm-up (same as bench.py)
    spark.read.parquet(os.path.join(args.sf, "documents.parquet")).count()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            builder, _sql = QUERIES[name]
            df = builder(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(plan)

    timings: dict[str, float] = {}
    for _ in range(args.passes):
        for name in names:
            builder, _sql = QUERIES[name]
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = builder(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            timings[name] = min(timings.get(name, float("inf")), dt)

    print(json.dumps({"sf": args.sf.rstrip("/").rsplit("sf", 1)[-1],
                      "passes": args.passes, "noop": args.noop,
                      "queries": timings,
                      "total": round(sum(timings.values()), 3)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
