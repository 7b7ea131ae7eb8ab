#!/usr/bin/env python
"""Posting-codec shoot-out: varbyte (on-disk default, BASELINE.json
mandate) vs Simple8b (word-aligned alternative) on REAL docID-delta
distributions from the sf corpus — not synthetic uniform noise.

Builds per-term sorted docID lists with DuckDB (fast, no Spark spin-up),
delta-encodes them, then measures bytes/posting and single-thread
encode/decode throughput over the concatenated delta stream.

Usage: python tools/bench_codec.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from document_retrieval_system_spark.operators.codec import (  # noqa: E402
    s8b_decode,
    s8b_encode,
    vb_decode,
    vb_encode,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    rows = con.sql(f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(regexp_replace(lower(text),
                     '[^a-z]', ' ', 'g'), ' '), t -> length(t) >= 2) AS toks
          FROM read_parquet('{sf_dir}/documents.parquet')
        ),
        pos AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks)
        SELECT term, list_sort(list(doc_id)) AS ids FROM pos GROUP BY term
    """).fetchall()

    deltas = []
    for _term, ids in rows:
        a = np.asarray(ids, dtype=np.uint64)
        d = np.empty_like(a)
        d[0] = a[0]
        np.subtract(a[1:], a[:-1], out=d[1:])
        deltas.append(d)
    stream = np.concatenate(deltas)
    n = int(stream.size)

    out: dict[str, dict[str, float]] = {}
    for name, enc, dec in [("varbyte", vb_encode, vb_decode),
                           ("simple8b", s8b_encode, s8b_decode)]:
        # encode/decode per term list (the real block granularity), best
        # of 3 passes for throughput; bytes summed across lists
        best_enc = best_dec = float("inf")
        total_bytes = 0
        for _ in range(3):
            t0 = time.time()
            bufs = [enc(d) for d in deltas]
            best_enc = min(best_enc, time.time() - t0)
            t0 = time.time()
            for b in bufs:
                dec(b)
            best_dec = min(best_dec, time.time() - t0)
            total_bytes = sum(len(b) for b in bufs)
        sample = deltas[0]
        assert np.array_equal(dec(enc(sample)), sample)
        out[name] = {
            "bytes_per_posting": round(total_bytes / n, 4),
            "encode_mvals_s": round(n / best_enc / 1e6, 2),
            "decode_mvals_s": round(n / best_dec / 1e6, 2),
        }

    print(json.dumps({
        "metric": "posting delta codec comparison",
        "sf_dir": sf_dir,
        "n_terms": len(deltas),
        "n_postings": n,
        "codecs": out,
    }))


if __name__ == "__main__":
    main()
