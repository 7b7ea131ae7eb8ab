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
   axis with a constant sum of active block upper bounds.  One cursor
   pass per term's doc-ordered block list materializes, per segment,
   the <= n_terms blocks active there (CSR index) — bound work is
   O(segments x query_terms), independent of blocks-per-shard.
   Segments are processed in descending upper-bound order; once the
   running top-k threshold theta (size-k min-heap) exceeds a segment's
   bound, all remaining segments — and every block and posting inside
   them — are skipped WITHOUT being decoded.  theta starts at
   min_score (:476) and tightens as the heap fills, exactly WAND's
   adaptive threshold.
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
                  k: int, min_score: float,
                  stats: dict | None = None,
                  raw_cache: dict | None = None) -> pd.DataFrame:
    """Block-max WAND over one shard's blocks for the query terms.

    Complexity: one cursor pass per term's (doc-sorted, disjoint) block
    list builds a CSR segment->active-blocks index, so segment
    processing touches only the <= n_query_terms blocks actually alive
    in that segment — O(segments x terms) bound work total, not the
    r1 kernel's O(segments x blocks) rescan (quadratic in blocks per
    shard for long posting lists).  theta is maintained with a size-k
    min-heap (O(log k) per candidate).
    """
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
    n_seg = bounds.size - 1
    seg_starts = bounds[:-1]
    seg_ends = bounds[1:] - 1  # inclusive
    delta = np.zeros(bounds.size, dtype=np.float64)
    np.add.at(delta, np.searchsorted(bounds, firsts), ub)
    np.add.at(delta, np.searchsorted(bounds, lasts + 1), -ub)
    seg_ub = np.cumsum(delta)[:-1]

    # Per-term block cursors, materialized: every block boundary is in
    # `bounds`, so block i is active in the contiguous segment range
    # [blk_lo[i], blk_hi[i]].  One vectorized pass over each term's
    # doc-ordered blocks emits the memberships; grouping them by segment
    # (CSR) replaces the per-segment all-blocks mask.  Per segment at
    # most one block per term is active (a term's blocks are disjoint),
    # so total memberships <= n_seg * n_terms.
    blk_lo = np.searchsorted(bounds, firsts)
    blk_hi = np.searchsorted(bounds, lasts + 1) - 1
    counts = blk_hi - blk_lo + 1
    offs = np.concatenate([[0], np.cumsum(counts)])
    blk_mem = np.repeat(np.arange(counts.size), counts)
    seg_mem = np.arange(offs[-1]) - np.repeat(offs[:-1], counts) + np.repeat(blk_lo, counts)
    m_order = np.argsort(seg_mem, kind="stable")
    seg_sorted = seg_mem[m_order]
    blk_sorted = blk_mem[m_order]
    csr_lo = np.searchsorted(seg_sorted, np.arange(n_seg), side="left")
    csr_hi = np.searchsorted(seg_sorted, np.arange(n_seg), side="right")

    order = np.argsort(-seg_ub, kind="mergesort")  # process best segments first

    # column extraction once (pdf.iloc per block is pathologically slow)
    doc_bytes = pdf["doc_bytes"].tolist()
    tf_bytes = pdf["tf_bytes"].tolist()
    dl_bytes = pdf["dl_bytes"].tolist()
    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # block row -> (docs, scores)

    def block_scores(i: int) -> tuple[np.ndarray, np.ndarray]:
        got = decoded.get(i)
        if got is None:
            # ``raw_cache`` shares the varbyte decode across the queries
            # of a batched call; the per-query weight math stays
            # per-call.  The key is the block's LOGICAL identity —
            # blocks of one term hold disjoint doc sets, so (term,
            # first_doc, last_doc) is unique within a shard.  (id() of
            # the payload bytes is NOT a sound key: the objects are
            # re-materialized per kernel call and a freed id can be
            # reused, silently serving another block's postings.)
            key = (terms[i], int(firsts[i]), int(lasts[i]))
            raw = raw_cache.get(key) if raw_cache is not None else None
            if raw is None:
                raw = (
                    delta_decode(vb_decode(doc_bytes[i])).astype(np.int64),
                    vb_decode(tf_bytes[i]).astype(np.float64),
                    vb_decode(dl_bytes[i]).astype(np.float64),
                )
                if raw_cache is not None:
                    raw_cache[key] = raw
            docs, tfs, dls = raw
            scores = w_arr[i] * (
                tfs / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl))
            )
            got = (docs, scores)
            decoded[i] = got
        return got

    import heapq

    theta = min_score
    acc_docs: list[np.ndarray] = []
    acc_scores: list[np.ndarray] = []
    heap: list[float] = []  # size-k min-heap of the best candidate scores

    for si in order:
        if seg_ub[si] < min_score:
            break  # no doc in any remaining segment can reach min_score
        if seg_ub[si] < theta and len(heap) >= k:
            break  # all remaining segments are provably below threshold
        hit = blk_sorted[csr_lo[si]:csr_hi[si]]
        if hit.size == 0:
            continue
        s, e = seg_starts[si], seg_ends[si]

        # WAND essential lists at block granularity: sort the segment's
        # active blocks by UB ascending; the maximal prefix with
        # cumsum(UB) < theta is non-essential — a doc appearing ONLY in
        # non-essential blocks is bounded below theta and can never
        # enter the top-k, so candidates are generated from essential
        # blocks alone.  Crucial when a rare term's block straddles a
        # docID gap (its huge UB keeps seg_ub high although the segment
        # holds no posting of it): the segment dies on an empty
        # candidate set after decoding ONE block, instead of decoding
        # every common-term block under it.  Sound because theta only
        # grows and (kth of seen) <= (kth of all); excluded docs score
        # strictly under theta so they cannot even tie the kth.
        hub = ub[hit]
        hs = np.argsort(hub, kind="stable")
        cut = theta if len(heap) >= k else min_score
        n_non = int(np.searchsorted(np.cumsum(hub[hs]), cut, side="left"))
        ess = hit[hs[n_non:]]
        non = hit[hs[:n_non]]
        if ess.size == 0:
            continue  # whole segment provably below threshold

        cand_parts: list[np.ndarray] = []
        for bi in ess:
            docs, _ = block_scores(int(bi))
            lo = np.searchsorted(docs, s, side="left")
            hi = np.searchsorted(docs, e, side="right")
            if hi > lo:
                cand_parts.append(docs[lo:hi])
        if not cand_parts:
            continue  # no candidate: non-essential blocks stay undecoded
        cand = np.unique(np.concatenate(cand_parts))
        c_min, c_max = int(cand[0]), int(cand[-1])
        probe = [
            int(bi) for bi in non
            if firsts[bi] <= c_max and lasts[bi] >= c_min  # else skip decode
        ]
        # contributions accumulate in ascending block-row order so the
        # per-doc float summation order is bit-identical to the
        # exhaustive scorer (pruning must not move scores even 1 ulp)
        part_docs: list[np.ndarray] = []
        part_scores: list[np.ndarray] = []
        for bi in sorted(probe + [int(b) for b in ess]):
            docs, scores = block_scores(bi)
            lo = np.searchsorted(docs, s, side="left")
            hi = np.searchsorted(docs, e, side="right")
            if hi > lo:
                part_docs.append(docs[lo:hi])
                part_scores.append(scores[lo:hi])
        seg_docs = np.concatenate(part_docs)
        seg_part = np.concatenate(part_scores)
        d_arr, inv = np.unique(seg_docs, return_inverse=True)
        s_arr = np.zeros(d_arr.size, dtype=np.float64)
        np.add.at(s_arr, inv, seg_part)
        keep = (s_arr >= min_score) & np.isin(d_arr, cand, assume_unique=True)
        if keep.any():
            kept = s_arr[keep]
            acc_docs.append(d_arr[keep])
            acc_scores.append(kept)
            for v in kept.tolist():
                if len(heap) < k:
                    heapq.heappush(heap, v)
                elif v > heap[0]:
                    heapq.heapreplace(heap, v)
            if len(heap) >= k:
                theta = max(theta, heap[0])

    if stats is not None:
        stats["total_blocks"] = int(counts.size)
        stats["decoded_blocks"] = len(decoded)

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
    counters: dict | None = None,
) -> DataFrame:
    """Block-max WAND BM25 top-k; same contract as search.bm25_search.

    ``counters``: optional {"total_blocks": Accumulator, "decoded_blocks":
    Accumulator} — each shard kernel adds its block totals, so a bench can
    report the decoded fraction (the pruning effectiveness) without
    touching the result schema."""
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
        if counters is None:
            return _shard_kernel(pdf, w, a, k, ms)
        st: dict = {}
        out = _shard_kernel(pdf, w, a, k, ms, stats=st)
        counters["total_blocks"].add(st.get("total_blocks", 0))
        counters["decoded_blocks"].add(st.get("decoded_blocks", 0))
        return out

    scored = blocks.groupBy("shard").applyInPandas(kernel, WAND_OUT_SCHEMA)
    docs = reader.docs().select("shard", "local_no", "doc_id", "url")
    return (
        scored.join(docs, ["shard", "local_no"])
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "url", "score", "shard", "local_no")
    )


def bm25_wand_search_many(
    reader,
    queries: list[str],
    lang: str = "zh",
    max_results: int = DEFAULT_MAX_RESULTS,
    min_score: float = DEFAULT_MIN_SCORE,
    analyzer=process_text,
) -> DataFrame:
    """Batched WAND: score N queries in ONE pass — one term-stats lookup,
    one term-pushdown block scan over the union of query terms, and one
    per-shard kernel job that runs every query against the shard's
    already-fetched blocks.  Amortizes the per-job scheduling overhead
    that dominates single-query latency (p50 ~0.6 s of which the kernel
    is milliseconds) into throughput: a serving tier evaluates a batch
    at near-single-query wall time.

    Returns (qid, doc_id, url, score, shard, local_no) — per-query
    top-``max_results`` with the engine's (score desc, doc_id asc)
    tie-break; ``qid`` is the index into ``queries``."""
    spark = reader.spark
    corpus = reader.corpus()
    n, avgdl = corpus["total_docs"], corpus["avg_doc_length"]
    per_q_terms = {qid: analyzer(q, lang) for qid, q in enumerate(queries)}
    all_terms = sorted({t for ts in per_q_terms.values() for t in ts})
    from document_retrieval_system_spark.operators.search import _empty_result

    def _empty_batch():
        # same column ORDER and types as the live path (qid first, int)
        return spark.createDataFrame(
            [], "qid int, doc_id string, url string, score double, "
                "shard int, local_no long"
        )

    if not all_terms:
        return _empty_batch()
    stats = (
        reader.term_stats().filter(F.col("term").isin(all_terms)).collect()
    )
    dfs = {r["term"]: r["df"] for r in stats}
    wq: dict[int, dict[str, float]] = {}
    for qid, terms in per_q_terms.items():
        w: dict[str, float] = {}
        for t in terms:  # per-occurrence accumulation, as in the reference
            df = dfs.get(t, 0)
            if df <= 0:
                continue
            w[t] = w.get(t, 0.0) + math.log((n - df + 0.5) / (df + 0.5) + 1)
        if w:
            wq[qid] = w
    if not wq:
        return _empty_batch()
    live_terms = sorted({t for w in wq.values() for t in w})
    blocks = reader.postings().filter(F.col("term").isin(live_terms)).select(
        "shard", "term", "first_doc", "last_doc", "max_tf", "min_dl",
        "doc_bytes", "tf_bytes", "dl_bytes",
    )
    k, ms, a = int(max_results), float(min_score), float(avgdl)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        raw_cache: dict = {}  # share block decodes across the batch
        for qid, w in wq.items():
            sub = pdf[pdf["term"].isin(w)]
            if len(sub) == 0:
                continue
            out = _shard_kernel(sub, w, a, k, ms, raw_cache=raw_cache)
            if len(out):
                out.insert(0, "qid", np.int32(qid))
                outs.append(out)
        if not outs:
            return pd.DataFrame(
                {"qid": pd.Series(dtype="int32"),
                 "shard": pd.Series(dtype="int32"),
                 "local_no": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")}
            )
        return pd.concat(outs, ignore_index=True)

    scored = blocks.groupBy("shard").applyInPandas(
        kernel, "qid int, " + WAND_OUT_SCHEMA
    )
    docs = reader.docs().select("shard", "local_no", "doc_id", "url")
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return (
        scored.join(docs, ["shard", "local_no"])
        .withColumn("_rn", rank)
        .filter(F.col("_rn") <= k)
        .select("qid", "doc_id", "url", "score", "shard", "local_no")
    )
