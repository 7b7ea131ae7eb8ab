"""BM25F — fielded BM25 ranking (Robertson, Zaragoza & Taylor, CIKM
2004, "Simple BM25 extension to multiple weighted fields").

Web pages are not flat bags of words: a query term in the <title> (or
in anchor text pointing at the page) is worth more than the same term
buried in the body.  BM25F folds per-field term frequencies into one
pseudo-frequency BEFORE saturation — the theoretically sound version —
rather than summing independent per-field BM25 scores (which
over-counts a term that merely appears in many fields):

    tf~(t, d) = sum_f  w_f * tf_{t,f} / (1 - b_f + b_f * len_f/avglen_f)
    score(d)  = sum_{t in q}  idf(t) * tf~ / (k1 + tf~)

with the same idf as the unfielded engine (``entry_queries.K1/B``
conventions; reference scoring anchor: search_engine.py:427-482 — the
reference itself is single-field, this is the fielded generalization).

Scale shape: one explode + groupBy (doc, field, term) with map-side
partial agg, a broadcast join against the O(#fields) parameter table
and the O(#fields) average-length table, then a groupBy (doc, term)
that collapses at most #fields rows per key, and a final per-doc agg
over the matched query terms only (the query-term filter is pushed
below every join).  No shuffle is wider than the unfielded BM25 path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25f_scores(fields: DataFrame, query_terms: list[str],
                 field_weights: dict[str, float],
                 field_b: dict[str, float] | None = None,
                 k1: float = 1.2, id_col: str = "doc_id",
                 field_col: str = "field",
                 toks_col: str = "toks") -> DataFrame:
    """Score docs for `query_terms` over a (id, field, toks) frame ->
    (id, score), unrounded.

    `fields` must carry one row per (doc, field) INCLUDING empty-token
    fields — per-field average lengths are defined over all documents,
    and dropping empty rows would inflate them.  N (corpus size) is the
    distinct doc count of `fields` for the same reason.
    """
    unknown = set(field_b or {}) - set(field_weights)
    if unknown:
        raise ValueError(f"field_b for unknown fields: {sorted(unknown)}")
    field_b = {f: (field_b or {}).get(f, 0.75) for f in field_weights}
    spark = fields.sparkSession
    params = spark.createDataFrame(
        [(f, float(field_weights[f]), float(field_b[f]))
         for f in sorted(field_weights)],
        f"{field_col} string, w double, b double",
    )
    fl = fields.withColumn("flen", F.size(F.col(toks_col)))
    avgf = fl.groupBy(field_col).agg(F.avg("flen").alias("avgfl"))
    n_docs = fields.select(id_col).distinct().count()
    tf = (
        fl.select(id_col, field_col, "flen",
                  F.explode(toks_col).alias("term"))
        .groupBy(id_col, field_col, "flen", "term")
        .agg(F.count("*").alias("tf"))
    )
    tft = (
        tf.join(F.broadcast(params), field_col)
        .join(F.broadcast(avgf), field_col)
        .withColumn(
            "part",
            F.col("w") * F.col("tf")
            / (1 - F.col("b")
               + F.col("b") * F.col("flen") / F.col("avgfl")),
        )
        .groupBy(id_col, "term")
        .agg(F.sum("part").alias("tft"))
    )
    dfreq = tft.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tft.filter(F.col("term").isin(list(query_terms)))
        .join(dfreq, "term")
        .withColumn(
            "s",
            F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1)
            * F.col("tft") / (F.col("tft") + F.lit(float(k1))),
        )
        .groupBy(id_col)
        .agg(F.sum("s").alias("score"))
    )
