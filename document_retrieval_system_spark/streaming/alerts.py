"""Streaming percolation: standing-query alerts at the crawl frontier.

`operators/percolate.py` is the relational form — right for a LARGE
stored-query corpus (the query store itself joins and shuffles).  At
the frontier the store is small (an alerting deployment holds
thousands of queries, not billions), and the right streaming shape is
the opposite one: compile the store into literal term arrays and
evaluate every query against each arriving page with JVM higher-order
functions.  That makes percolation a MAP-ONLY, STATELESS streaming
operator — no shuffle, no aggregation state, no watermark needed
(each page is self-contained) — so it composes with any trigger and
never grows state, the only alerting shape that survives an unbounded
stream untended.

The same function runs on a batch DataFrame unchanged (backfill ==
live, like streaming/dedup.py), and its batch output is pinned equal
to the relational operator's in tests/test_streaming_alerts.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.percolate import (
    normalize_stored_queries,
)
from document_retrieval_system_spark.operators.textstats import simple_tokens


def percolate_stream(pages: DataFrame, queries: list[dict],
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, text) pages -> (query_id, <id_col>) alert rows.

    ``queries`` is the stored-query list of `operators/percolate.py`
    ({"query_id", "terms", "neg_terms"?}); a page fires a query when
    every positive term occurs in its token set and no negative term
    does.  Evaluation is one column expression per stored query —
    ``array_except(pos, tokens)`` empty and ``arrays_overlap(tokens,
    neg)`` false — fused by codegen into a single pass over the token
    array; the only generated rows are the fired alerts."""
    fired = []
    for qid, pos, neg in normalize_stored_queries(queries):
        cond = F.size(F.array_except(
            F.array(*[F.lit(t) for t in pos]), F.col("_toks"))) == 0
        if neg:
            cond = cond & ~F.arrays_overlap(
                F.col("_toks"), F.array(*[F.lit(t) for t in neg]))
        fired.append(F.when(cond, F.lit(qid)))
    return (
        pages.withColumn(
            "_toks", simple_tokens(F.coalesce(F.col(text_col), F.lit(""))))
        .withColumn(
            "query_id",
            F.explode(F.filter(F.array(*fired), lambda x: x.isNotNull())),
        )
        .select("query_id", id_col)
    )
