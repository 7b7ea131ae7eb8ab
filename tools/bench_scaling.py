#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule).

A real N -> 4N executor scaling run is impossible in this sandbox, so per
the driver instruction we run the SAME index-build job at local[4] and
local[16] (separate JVMs) on identical input and report steady-state
throughput at both plus scaling efficiency = (T_4 / T_16) / 4.

Why 4 vs 16 (not 8 vs 32): the box exposes 32 hyperthreads, not 32
physical cores — pure-Python multiprocessing itself only scales ~2.7x
from 8 to 32 procs, so 8->32 measures SMT contention, not the engine.
4 -> 16 stays within a regime where a process-parallel baseline scales
at ~0.85, making it the honest N -> 4N proxy.

Each core count runs the build twice in one JVM and reports the warm
(steady-state) run; results land in BENCH/BASELINE.md.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(cores: int, pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "bench_index.py"),
         "--cores", str(cores), "--pages", str(pages), "--runs", "2"],
        capture_output=True, text=True, check=True, cwd=HERE,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    pages = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "250000"))
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
            f"| {pages} | {lo['docs_per_sec']} | {hi['docs_per_sec']} "
            f"| {result['speedup_4_to_16']}x | {result['scaling_efficiency']} |\n"
        )


if __name__ == "__main__":
    sys.exit(main())
