#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule).

A real N -> 4N executor scaling run is impossible in this sandbox, so per
the driver instruction we run the SAME index-build job at local[8] and
local[32] (separate JVMs) on identical input and report throughput at
both plus scaling efficiency = (T8 / T32) / 4.  Results are appended to
BENCH/BASELINE.md and printed as JSON.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(cores: int, pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "bench_index.py"),
         "--cores", str(cores), "--pages", str(pages)],
        capture_output=True, text=True, check=True, cwd=HERE,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    pages = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "1000000"))
    lo = probe(4, pages)
    hi = probe(16, pages)
    eff = (lo["seconds"] / hi["seconds"]) / 4.0
    result = {
        "pages": pages,
        "local4": lo,
        "local16": hi,
        "speedup_4_to_16": round(lo["seconds"] / hi["seconds"], 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(result))
    md = os.path.join(HERE, "BENCH", "BASELINE.md")
    with open(md, "a") as fh:
        fh.write(
            f"\n| {pages} | {lo['docs_per_sec']} | {hi['docs_per_sec']} "
            f"| {result['speedup_4_to_16']}x | {result['scaling_efficiency']} |\n"
        )


if __name__ == "__main__":
    sys.exit(main())
