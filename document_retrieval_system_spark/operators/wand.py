"""Block-max WAND top-k BM25 — the pruned query path (north_star R3).

The reference scores exhaustively, term-at-a-time, over every posting
(search_engine.py:458-471).  This module implements document-at-a-time
top-k with **block-max pruning** per index shard:

1. Per query term, read only that term's posting blocks (Parquet scan
   with ``term IN (...)`` pushdown + ``shard`` partition pruning).
2. Each block carries (first_doc, last_doc, max_tf, min_dl); its score
   upper bound is ``w_t * tf_norm(max_tf, min_dl, avgdl)`` — valid for
   any avgdl because tf_norm is increasing in tf and decreasing in dl.
3. A boundary sweep over block doc-ranges yields segments of the docID
   axis with a constant sum of active block upper bounds.  Segments are
   processed in descending upper-bound order; once the running top-k
   threshold theta exceeds a segment's bound, all remaining segments —
   and every block and posting inside them — are skipped WITHOUT being
   decoded.  theta starts at min_score (:476) and tightens as the heap
   fills, exactly WAND's adaptive threshold.
4. Exact scores for surviving docs are computed vectorized (numpy
   searchsorted into decoded blocks), preserving the reference formula
   bit-for-bit.

The kernel runs inside ``applyInPandas`` grouped by shard — shards are
independent (document-sharded index), so a 1000-executor cluster runs
1000 kernels in parallel with no cross-talk; the only shuffle is the
final k-row-per-shard merge.

Correctness contract (tested metamorphically in
tests/test_wand.py): identical (doc_id, score) top-k as the exhaustive
scorer, including duplicate-document score ties, which are retained
per-shard (everything scoring >= the kth score survives) and resolved
globally by (score desc, doc_id asc).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_retrieval_system_spark.functions.analyzer import process_text
from document_retrieval_system_spark.operators.codec import delta_decode, vb_decode
from document_retrieval_system_spark.oracle import (
    BM25_B,
    BM25_K1,
    DEFAULT_MAX_RESULTS,
    DEFAULT_MIN_SCORE,
)

WAND_OUT_SCHEMA = "shard int, local_no long, score double"


def _tf_norm_scalar(tf: float, dl: float, avgdl: float) -> float:
    return tf / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))


def _shard_kernel(pdf: pd.DataFrame, weights: dict[str, float], avgdl: float,
                  k: int, min_score: float) -> pd.DataFrame:
    """Block-max WAND over one shard's blocks for the query terms."""
    if pdf.empty:
        return pd.DataFrame({"shard": [], "local_no": [], "score": []})
    shard = int(pdf["shard"].iloc[0])

    # Block table: arrays over all (term, block) rows
    terms = pdf["term"].to_numpy()
    firsts = pdf["first_doc"].to_numpy(dtype=np.int64)
    lasts = pdf["last_doc"].to_numpy(dtype=np.int64)
    w_arr = np.array([weights[t] for t in terms], dtype=np.float64)
    ub = w_arr * (
        pdf["max_tf"].to_numpy(dtype=np.float64)
        / (
            pdf["max_tf"].to_numpy(dtype=np.float64)
            + BM25_K1 * (1.0 - BM25_B + BM25_B * pdf["min_dl"].to_numpy(np.float64) / avgdl)
        )
    )

    # Boundary sweep: piecewise-constant sum of active block bounds.
    bounds = np.unique(np.concatenate([firsts, lasts + 1]))
    seg_starts = bounds[:-1]
    seg_ends = bounds[1:] - 1  # inclusive
    delta = np.zeros(bounds.size, dtype=np.float64)
    np.add.at(delta, np.searchsorted(bounds, firsts), ub)
    np.add.at(delta, np.searchsorted(bounds, lasts + 1), -ub)
    seg_ub = np.cumsum(delta)[:-1]

    order = np.argsort(-seg_ub, kind="mergesort")  # process best segments first

    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # block row -> (docs, scores)

    def block_scores(i: int) -> tuple[np.ndarray, np.ndarray]:
        got = decoded.get(i)
        if got is None:
            row = pdf.iloc[i]
            docs = delta_decode(vb_decode(row["doc_bytes"])).astype(np.int64)
            tfs = vb_decode(row["tf_bytes"]).astype(np.float64)
            dls = vb_decode(row["dl_bytes"]).astype(np.float64)
            scores = w_arr[i] * (
                tfs / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl))
            )
            got = (docs, scores)
            decoded[i] = got
        return got

    theta = min_score
    acc_docs: list[np.ndarray] = []
    acc_scores: list[np.ndarray] = []
    kth_tracker: list[float] = []  # running candidate scores for theta

    for si in order:
        if seg_ub[si] < min_score:
            break  # no doc in any remaining segment can reach min_score
        if seg_ub[si] < theta and len(kth_tracker) >= k:
            break  # all remaining segments are provably below threshold
        s, e = seg_starts[si], seg_ends[si]
        # blocks overlapping this segment
        hit = np.nonzero((firsts <= e) & (lasts >= s))[0]
        if hit.size == 0:
            continue
        part_docs: list[np.ndarray] = []
        part_scores: list[np.ndarray] = []
        for bi in hit:
            docs, scores = block_scores(int(bi))
            lo = np.searchsorted(docs, s, side="left")
            hi = np.searchsorted(docs, e, side="right")
            if hi > lo:
                part_docs.append(docs[lo:hi])
                part_scores.append(scores[lo:hi])
        if not part_docs:
            continue
        seg_docs = np.concatenate(part_docs)
        seg_part = np.concatenate(part_scores)
        d_arr, inv = np.unique(seg_docs, return_inverse=True)
        s_arr = np.zeros(d_arr.size, dtype=np.float64)
        np.add.at(s_arr, inv, seg_part)
        keep = s_arr >= min_score
        if keep.any():
            acc_docs.append(d_arr[keep])
            acc_scores.append(s_arr[keep])
            kth_tracker.extend(s_arr[keep].tolist())
            if len(kth_tracker) > 4 * k:  # keep tracker bounded
                kth_tracker.sort(reverse=True)
                del kth_tracker[2 * k:]
            if len(kth_tracker) >= k:
                theta = max(
                    theta, sorted(kth_tracker, reverse=True)[k - 1]
                )

    if not acc_docs:
        return pd.DataFrame({"shard": pd.Series(dtype="int32"),
                             "local_no": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    docs = np.concatenate(acc_docs)
    scores = np.concatenate(acc_scores)
    # per-shard cut: keep top-k AND everything tying the kth score, so the
    # global (score desc, doc_id asc) tiebreak sees all contenders.
    if docs.size > k:
        kth = np.sort(scores)[-k]
        keep = scores >= kth
        docs, scores = docs[keep], scores[keep]
    return pd.DataFrame(
        {"shard": np.full(docs.size, shard, dtype=np.int32),
         "local_no": docs, "score": scores}
    )


def bm25_wand_search(
    reader,
    query: str,
    lang: str = "zh",
    max_results: int = DEFAULT_MAX_RESULTS,
    min_score: float = DEFAULT_MIN_SCORE,
    analyzer=process_text,
) -> DataFrame:
    """Block-max WAND BM25 top-k; same contract as search.bm25_search."""
    spark = reader.spark
    query_terms = analyzer(query, lang)
    if not query_terms:
        from document_retrieval_system_spark.operators.search import _empty_result

        return _empty_result(spark)
    corpus = reader.corpus()
    n, avgdl = corpus["total_docs"], corpus["avg_doc_length"]
    stats = (
        reader.term_stats().filter(F.col("term").isin(list(set(query_terms)))).collect()
    )
    dfs = {r["term"]: r["df"] for r in stats}
    weights: dict[str, float] = {}
    for t in query_terms:  # per-occurrence accumulation, as in the reference
        df = dfs.get(t, 0)
        if df <= 0:
            continue
        weights[t] = weights.get(t, 0.0) + math.log((n - df + 0.5) / (df + 0.5) + 1)
    if not weights:
        from document_retrieval_system_spark.operators.search import _empty_result

        return _empty_result(spark)

    blocks = reader.postings().filter(F.col("term").isin(list(weights))).select(
        "shard", "term", "first_doc", "last_doc", "max_tf", "min_dl",
        "doc_bytes", "tf_bytes", "dl_bytes",
    )
    k, ms = int(max_results), float(min_score)
    w, a = dict(weights), float(avgdl)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _shard_kernel(pdf, w, a, k, ms)

    scored = blocks.groupBy("shard").applyInPandas(kernel, WAND_OUT_SCHEMA)
    docs = reader.docs().select("shard", "local_no", "doc_id", "url")
    return (
        scored.join(docs, ["shard", "local_no"])
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "url", "score", "shard", "local_no")
    )
