"""More-like-this retrieval: turn a document into a query.

The classic relevance-feedback operator (Lucene's ``MoreLikeThis``,
Elasticsearch ``more_like_this``): extract the source document's most
characteristic terms by tf x idf, then run ordinary BM25 retrieval with
those terms as the query, excluding the source document itself.  The
reference engine exposes only string queries (search_engine.py takes a
query string); this operator is the standard IR extension that makes
"find documents similar to this one" a first-class query type over the
same index and scorer.

Scale shape: the source document's term list is O(|doc|) rows reduced to
the top-m — a driver-free computation whose result is a tiny one-column
DataFrame, broadcast into the BM25 scorer exactly like a typed query's
term set.  Nothing about the corpus side changes: the retrieval is the
same posting-join + per-doc sum the engine already runs, so the operator
inherits WAND/batched serving unchanged.  No collect, no new shuffle
beyond the one BM25 already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_top_terms(tfs: DataFrame, stats: DataFrame, corpus: DataFrame,
                  src_id, m: int = 8) -> DataFrame:
    """The top-``m`` most characteristic terms of document ``src_id``:
    rank by tf x BM25-idf (ln((n - df + 0.5)/(df + 0.5) + 1)), ties by
    term ascending — the deterministic tie order that keeps the Spark
    and oracle term sets identical even when weights collide exactly.

    ``tfs``: (doc_id, term, tf[, dl]); ``stats``: (term, df);
    ``corpus``: one row with (n, ...).  Returns one column ``term``.
    """
    src = tfs.filter(F.col("doc_id") == F.lit(src_id))
    weighted = (
        src.join(stats, "term")
        .crossJoin(F.broadcast(corpus.select("n")))
        .withColumn(
            "w",
            F.col("tf")
            * F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1),
        )
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("w").desc(), F.col("term"))
    )
    return (
        weighted.withColumn("_rk", rk)
        .filter(F.col("_rk") <= F.lit(m))
        .select("term")
    )
