"""WAND pruning microbench: decoded-block fraction vs posting volume.

Synthesizes one shard's block table for a 4-term query at growing corpus
sizes and runs the kernel directly (no Spark).  A correct block-max WAND
decodes a SUB-LINEAR fraction of blocks as posting volume grows: theta
tightens after ~k segments, and everything below is skipped undecoded.

The generator models docID locality: rare (high-idf) terms concentrate
in topic clusters of the docID axis, as in a URL-sorted web corpus
(pages of one site share vocabulary and are adjacent).  This is the
structure block-max metadata exploits — on uniformly random postings
every segment carries the same bound and NO block-max scheme can prune
(verified: decoded_frac stays ~1.0 with the clustering disabled).

Run: python tools/bench_wand_pruning.py
Prints one JSON line per scale: {n_docs, total_blocks, decoded_blocks,
decoded_frac, kernel_sec}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from document_retrieval_system_spark.operators.codec import delta_encode, vb_encode
from document_retrieval_system_spark.operators.wand import _shard_kernel

BLOCK = 128
TERMS = ["alpha", "beta", "gamma", "delta"]
# idf-ish weights: one common term, others rarer
WEIGHTS = {"alpha": 0.8, "beta": 2.1, "gamma": 3.4, "delta": 5.2}
DENSITY = {"alpha": 0.5, "beta": 0.12, "gamma": 0.03, "delta": 0.008}


N_CLUSTERS = 24
CLUSTER_WIDTH_FRAC = 0.01  # each topic cluster spans 1% of the docID axis


def _hits(t: str, n_docs: int, rng) -> np.ndarray:
    """Posting docIDs for term t: common terms uniform, rare terms
    concentrated in topic clusters (docID locality)."""
    if DENSITY[t] >= 0.1:  # common vocabulary: everywhere
        return np.nonzero(rng.random(n_docs) < DENSITY[t])[0].astype(np.int64)
    n_post = max(1, int(DENSITY[t] * n_docs))
    width = max(64, int(CLUSTER_WIDTH_FRAC * n_docs))
    centers = rng.integers(0, max(1, n_docs - width), size=N_CLUSTERS)
    per = int(np.ceil(n_post / N_CLUSTERS))
    ids = np.concatenate([
        c + rng.integers(0, width, size=per) for c in centers
    ])
    return np.unique(ids[ids < n_docs]).astype(np.int64)


def synth_blocks(n_docs: int, seed: int = 42, gap_split: bool = True) -> pd.DataFrame:
    """Blocks laid out exactly as the index builder would: fixed-size
    slices, optionally broken at large docID gaps (the builder's
    gap-aligned boundaries — see index_build._gap_splits)."""
    from document_retrieval_system_spark.operators.index_build import _gap_splits

    rng = np.random.default_rng(seed)
    dls = rng.integers(40, 400, size=n_docs)
    rows = []
    for t in TERMS:
        hit = _hits(t, n_docs, rng)
        if hit.size == 0:
            continue
        tfs = 1 + rng.geometric(0.6, size=hit.size).astype(np.int64)
        bounds = [0] + (_gap_splits(hit) if gap_split else []) + [hit.size]
        slices = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            for b0 in range(lo, hi, BLOCK):
                slices.append(slice(b0, min(b0 + BLOCK, hi)))
        for sl in slices:
            d = hit[sl]
            f = tfs[sl]
            dl = dls[d]
            rows.append({
                "shard": 0, "term": t,
                "first_doc": int(d[0]), "last_doc": int(d[-1]),
                "max_tf": int(f.max()), "min_dl": int(dl.min()),
                "doc_bytes": vb_encode(delta_encode(d)),
                "tf_bytes": vb_encode(f),
                "dl_bytes": vb_encode(dl.astype(np.int64)),
            })
    return pd.DataFrame(rows)


def main() -> None:
    avgdl = 220.0
    out = []
    for n_docs in (10_000, 40_000, 160_000, 640_000):
        rec = {"n_docs": n_docs}
        for label, gap in (("", True), ("nogap_", False)):
            pdf = synth_blocks(n_docs, gap_split=gap)
            stats: dict = {}
            t0 = time.perf_counter()
            res = _shard_kernel(pdf, WEIGHTS, avgdl, k=20, min_score=0.0, stats=stats)
            dt = time.perf_counter() - t0
            rec.update({
                f"{label}total_blocks": stats["total_blocks"],
                f"{label}decoded_blocks": stats["decoded_blocks"],
                f"{label}decoded_frac": round(
                    stats["decoded_blocks"] / stats["total_blocks"], 4
                ),
                f"{label}kernel_sec": round(dt, 4),
            })
            rec["rows_out"] = len(res)
        out.append(rec)
        print(json.dumps(rec))
    # sub-linearity assertion: decoded fraction must fall as volume grows
    fracs = [r["decoded_frac"] for r in out]
    assert fracs[-1] < fracs[0], f"pruning not sub-linear: {fracs}"


if __name__ == "__main__":
    main()
