"""Pseudo-relevance feedback (RM3-style query expansion).

The third member of the engine's relevance-feedback family:
`operators/mlt.py` turns a DOCUMENT into a query (item→item),
`operators/fuzzy.py` repairs the query's SPELLING — PRF improves the
query's VOCABULARY: run the original query, treat the top-k results as
pseudo-relevant, harvest the terms that characterize them, and re-score
with the expanded, weighted term set (Lavrenko & Croft 2001 relevance
models; the RM3 interpolation popularized by Indri/Galago).

Expansion weight of term w over the feedback set R:

    ew(w) = Σ_{d ∈ R} tf(w, d) / |d| · score(d)

— the relevance-model estimate with document weights taken from the
first-pass scores.  The final query keeps original terms at weight 1
and adds the top-m expansion terms at ``beta · ew / max(ew)``.

Determinism contract (the repo's cross-engine bar): first-pass scores
are rounded to 6 dp BEFORE selecting/weighting the feedback set, ew is
rounded before the top-m cut, ties break on the term, and the final
weights are rounded again — so both engines pick the identical
expansion set with identical weights, and the re-score inherits the
BM25 path's rounding discipline.

Scale shape: the feedback set is k rows (broadcast), so harvesting
touches only the top docs' term rows — one broadcast join + one tiny
aggregate; the expanded term set (|q| + m rows) broadcasts into the
standard scorer exactly like a fuzzy expansion.  Nothing here scales
with the corpus beyond the two BM25 passes themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rm3_expansion_terms(tfs: DataFrame, feedback: DataFrame,
                        query_terms: list[str], m_terms: int = 8,
                        beta: float = 0.5) -> DataFrame:
    """Build the weighted expanded term table: (term, weight).

    ``tfs``: (doc_id, term, tf, dl) rows; ``feedback``: (doc_id, w)
    top-k first-pass results with ROUNDED scores.  Original query terms
    come back at weight 1.0; the m best expansion terms (excluding the
    originals) at ``beta * ew / max(ew)``."""
    exp = (
        tfs.join(F.broadcast(feedback), "doc_id")
        .filter(~F.col("term").isin(list(query_terms)))
        .groupBy("term")
        .agg(F.round(F.sum(F.col("tf") * F.col("w") / F.col("dl")), 6)
             .alias("ew"))
        .orderBy(F.desc("ew"), F.asc("term"))
        .limit(m_terms)
    )
    # materialize the m-row expansion once: `mx` and `weighted` both
    # reference it, and without truncation the whole first-pass lineage
    # (corpus tokenize -> tfs -> bm25 -> top-k) would execute twice just
    # to read max(ew) off m rows
    exp = exp.localCheckpoint(eager=True)
    mx = exp.agg(F.max("ew").alias("_mx"))
    weighted = exp.crossJoin(F.broadcast(mx)).select(
        "term",
        F.round(F.lit(beta) * F.col("ew") / F.col("_mx"), 6).alias("weight"),
    )
    orig = (
        weighted.sparkSession.createDataFrame(
            [(t,) for t in query_terms], "term string")
        .select("term", F.lit(1.0).alias("weight"))
    )
    return orig.unionByName(weighted)
