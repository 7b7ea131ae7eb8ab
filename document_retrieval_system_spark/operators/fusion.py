"""Rank fusion and keyset pagination — the serving-layer glue operators.

``rrf_fuse`` is reciprocal-rank fusion (Cormack et al. 2009), the
standard way hybrid search combines heterogenous rankings (lexical
BM25 + vector ANN, or any scorer pair) without score calibration:

    rrf(doc) = sum over rankings r of 1 / (k + rank_r(doc))

Only the RANKS enter, so wildly different score scales fuse cleanly.

``search_after`` is keyset (cursor) pagination: page N+1 is "rows
strictly after (score_c, id_c) in (score desc, id asc) order".  At
10^12 documents OFFSET pagination re-scores and discards every earlier
page; the keyset predicate instead pushes a score ceiling into the
scan — for a WAND-served ranking, the cursor score IS the entry
threshold, so deep pages get cheaper, not more expensive.

Both are tiny-result operators: inputs are top-k lists (k rows per
ranking), so every join here is a broadcast of k rows regardless of
corpus size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked(scored: DataFrame, id_col: str = "doc_id",
           score_col: str = "score") -> DataFrame:
    """(id, rank) with rank = row_number by (score desc, id asc) — the
    deterministic tie order used engine-wide."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return scored.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def static_rank_blend(scored: DataFrame, prior: DataFrame,
                      weight: float = 0.2, id_col: str = "doc_id",
                      score_col: str = "score",
                      prior_col: str = "prior") -> DataFrame:
    """Blend a query-dependent score with a query-INDEPENDENT document
    prior (PageRank, host trust, freshness) the way web rankers do:

        blended = score * (1 + weight * ln(1 + prior))

    Multiplicative-log, not additive: an additive prior would dominate
    low-scoring tail queries and vanish on high-scoring ones; the log
    keeps a 1000x authority gap worth a bounded boost.  `prior` should
    be pre-scaled so a typical document sits near 1 (for PageRank:
    pr * N, since pr averages 1/N).

    The join is an equi-join on the doc id; `scored` is a top-k or
    matched-docs set (small), `prior` is corpus-wide — Spark/AQE
    broadcasts the scored side.  Docs missing a prior keep their raw
    score (left join + coalesce 0): a ranker must not drop a document
    because the link graph has not seen it yet.
    """
    p = prior.select(F.col(id_col), F.col(prior_col).alias("_prior"))
    return (
        scored.join(p, id_col, "left")
        .select(
            id_col,
            (F.col(score_col)
             * (1 + F.lit(float(weight))
                * F.log(1 + F.coalesce(F.col("_prior"), F.lit(0.0)))))
            .alias(score_col),
        )
    )


def rrf_fuse(rankings: list[DataFrame], k_rrf: int = 60,
             id_col: str = "doc_id") -> DataFrame:
    """Fuse top-k lists: each input is (id, rank); output
    (id, rrf_score, n_lists) ordered by (rrf_score desc, id).  A doc
    absent from a list contributes nothing for it (the standard RRF
    convention for fusing truncated lists)."""
    tagged = [
        r.select(F.col(id_col),
                 (F.lit(1.0) / (F.lit(k_rrf) + F.col("rank"))).alias("part"))
        for r in rankings
    ]
    allparts = reduce(DataFrame.unionByName, tagged)
    return (
        allparts.groupBy(id_col)
        .agg(F.sum("part").alias("rrf_score"),
             F.count("*").cast("long").alias("n_lists"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
    )


def search_after(scored: DataFrame, cursor_score, cursor_id,
                 page_size: int, id_col: str = "doc_id",
                 score_col: str = "score") -> DataFrame:
    """The page strictly after cursor (score_c, id_c) in
    (score desc, id asc) order.  ``cursor_score``/``cursor_id`` may be
    literals or one-row-DataFrame columns joined in by the caller."""
    after = (F.col(score_col) < cursor_score) | (
        (F.col(score_col) == cursor_score) & (F.col(id_col) > cursor_id)
    )
    return (
        scored.filter(after)
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .limit(page_size)
    )


def diversify_topk(scored: DataFrame, group_col: str, per_group: int,
                   k: int, id_col: str = "doc_id",
                   score_col: str = "score") -> DataFrame:
    """Result diversification: the top-k restricted to at most
    ``per_group`` results per ``group_col`` value (host, source,
    domain) — the standard serving-side guard against one site
    monopolizing a result page.  Two deterministic row_numbers: rank
    within group by (score desc, id asc), keep <= per_group, then the
    global top-k in the same order.  Output keeps ``grp_rank`` so the
    caller can see which results displaced an over-cap sibling.

    The input is a scored MATCH SET (already bounded by query terms),
    not the corpus: the within-group window shuffles match-set rows
    only, and the final top-k is a TakeOrdered.  Scores must already be
    rounded to the engine's comparison precision — ordering on raw
    doubles would make the cut ulp-sensitive across engines."""
    wg = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc())
    return (
        scored.withColumn("grp_rank", F.row_number().over(wg))
        .filter(F.col("grp_rank") <= per_group)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .limit(k)
    )
