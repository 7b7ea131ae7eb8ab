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
