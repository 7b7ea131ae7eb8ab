"""Proximity-boosted ranking: term closeness as a BM25 score component.

Bag-of-words BM25 cannot distinguish a page that mentions the query
terms in one phrase from a page that scatters them across sections.
The standard fix (Metzler & Croft's sequential-dependence family, and
the proximity heuristics production engines bolt onto BM25) adds a
boost that decays with the smallest window holding two distinct query
terms.  This module is that leg in relational form:

    min_gap(doc)  = min over pairs of DISTINCT query terms (a, b),
                    both present, of min |pos_a - pos_b|
    score'(doc)   = bm25(doc) + w / (1 + min_gap)

Documents containing fewer than two distinct query terms keep their
bare BM25 score.

Scale shape: the position join touches ONLY the query terms' posting
positions — the same rows a phrase/NEAR query decodes, pruned the same
way (the index path pre-intersects doc sets before decoding positions;
see `search.phrase_search`).  The within-doc pair join is bounded by
per-doc query-term occurrences, and the reduction to one min per doc is
a single hash agg with map-side combine.  The stopword-query blowup
case is identical to phrase search's and shares its mitigation (WAND's
threshold already demotes such terms; a production config also length-
caps per-doc position lists for proximity purposes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_pair_gap(pos: DataFrame, query_terms: list[str]) -> DataFrame:
    """(doc_id, min_gap) for every document holding at least two
    DISTINCT query terms; ``pos`` is (doc_id, term, pos) 1-based."""
    qp = pos.filter(F.col("term").isin(list(query_terms))).select(
        "doc_id", "term", "pos"
    )
    a = qp.alias("a")
    b = qp.alias("b")
    return (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
               & (F.col("a.term") < F.col("b.term")))
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.min(F.abs(F.col("a.pos") - F.col("b.pos")))
             .cast("long").alias("min_gap"))
    )


def best_passage(pos: DataFrame, term_idf: DataFrame,
                 width: int = 50,
                 round_to: int | None = None) -> DataFrame:
    """Passage retrieval: per document, the best idf-weighted window of
    `width` token positions over the query-term hits — the snippet-
    selection / passage-ranking primitive (Callan, SIGIR 1994) behind
    "jump to the best passage" UIs and passage-level rerankers.

    A candidate window starts at each hit (the optimal window always
    starts AT a hit); its score sums the idf of every query-term hit
    within [start, start + width).  Per doc the winner is the highest
    score with the smallest start as tie-break.

    Shape: `pos` is pre-filtered to query terms by the caller (the same
    rows phrase/NEAR decode), `term_idf` is O(|query|) and broadcast.
    The window sum is a RANGE-frame window over (doc, pos) — a single
    sort per doc partition, O(hits) via the engine's sliding frame, no
    O(hits^2) self-join.  Output: (doc_id, start, end, score)."""
    from pyspark.sql import Window

    hits = pos.join(F.broadcast(term_idf), "term")
    frame = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rangeBetween(Window.currentRow, width - 1)
    )
    score = F.sum("idf").over(frame)
    if round_to is not None:
        # rounding BEFORE the per-doc argmax makes the winner stable to
        # last-ulp float-sum-order differences between engines
        score = F.round(score, round_to)
    windows = hits.select(
        "doc_id",
        F.col("pos").alias("start"),
        score.alias("score"),
    )
    pick = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("start"))
    return (
        windows.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            "start",
            (F.col("start") + width - 1).alias("end"),
            "score",
        )
    )


def proximity_boosted(base: DataFrame, gaps: DataFrame,
                      weight: float = 0.5) -> DataFrame:
    """BM25 + w/(1 + min_gap): ``base`` is (doc_id, score), ``gaps``
    from `min_pair_gap`; docs without a gap row keep the bare score.
    Output (doc_id, score, min_gap) — min_gap NULL when unboosted."""
    return base.join(gaps, "doc_id", "left").select(
        "doc_id",
        (F.col("score")
         + F.when(F.col("min_gap").isNotNull(),
                  F.lit(weight) / (F.lit(1) + F.col("min_gap")))
         .otherwise(F.lit(0.0))).alias("score"),
        "min_gap",
    )
