#!/usr/bin/env python
"""Snapshot / compare declared-query results across code changes.

  python tools/snapshot_results.py save  OUT.pkl [--sf DIR] q1 q2 ...
  python tools/snapshot_results.py check OUT.pkl [--sf DIR] [q1 q2 ...]

``save`` collects each query's rows (sorted by their string form, so
order-insensitive) plus the schema simpleString and pickles them.
``check`` re-runs the queries on the current tree and reports any
mismatch — the proof that an optimization did not change what a query
computes (stronger than the sf0.01 oracle alone: it runs at any SF).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["save", "check"])
    ap.add_argument("path")
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from document_retrieval_system_spark.entry_queries import QUERIES
    from document_retrieval_system_spark.session import get_spark

    spark = get_spark("drs-snapshot", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "save":
        names = args.queries or list(QUERIES)
        out = {}
        for name in names:
            builder, _sql = QUERIES[name]
            df = builder(spark, args.sf)
            out[name] = {"schema": df.schema.simpleString(), "rows": _rows(df)}
            print(f"saved {name}: {len(out[name]['rows'])} rows", flush=True)
        with open(args.path, "wb") as f:
            pickle.dump(out, f)
    else:
        with open(args.path, "rb") as f:
            ref = pickle.load(f)
        names = args.queries or list(ref)
        bad = []
        for name in names:
            builder, _sql = QUERIES[name]
            df = builder(spark, args.sf)
            schema = df.schema.simpleString()
            rows = _rows(df)
            ok = schema == ref[name]["schema"] and rows == ref[name]["rows"]
            print(f"{'OK  ' if ok else 'FAIL'} {name}: {len(rows)} rows "
                  f"(ref {len(ref[name]['rows'])})", flush=True)
            if not ok:
                if schema != ref[name]["schema"]:
                    print(f"  schema: {schema}\n  ref:    {ref[name]['schema']}")
                for a, b in zip(rows[:5], ref[name]["rows"][:5]):
                    if a != b:
                        print(f"  first diff:\n    new {a}\n    ref {b}")
                        break
                bad.append(name)
        if bad:
            print("MISMATCH:", ",".join(bad))
            return 1
        print("all match")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
