"""Percolation: reverse search — match DOCUMENTS against STORED queries.

The alerting/monitoring primitive (Elasticsearch calls it the
percolator): users register standing queries ("notify me when a page
matching `spark AND merge NOT slow` arrives"), and every ingested
document is evaluated against ALL stored queries at once.  Forward
search asks "which docs match this query"; percolation asks "which
queries match this doc" — and at crawl scale it must be one relational
pass, not a per-document loop over the query store.

Supported query form: conjunctive with negations — ``terms`` must ALL
be present, ``neg_terms`` must ALL be absent (the reference's B2
AND/NOT semantics, search_engine.py boolean path, restricted to the
conjunctive queries an alerting store actually holds).  Each query_id
is exactly ONE conjunction — duplicate ids are rejected, because the
hit-count verify would silently mix their term sets; a caller wanting
OR semantics registers each disjunct under its own id and ORs the
fired ids downstream (an alias table), which keeps every engine —
relational, streaming, SQL twin — on identical semantics.

Scale shape (the Elasticsearch design, relationally): the stored-query
store is TINY next to the corpus, so both its positive and negative
term tables broadcast.  The corpus side is pre-filtered to the stored
vocabulary — ``term IN (vocab)`` prunes the (doc, term) stream to
near-nothing before any join — then:

- candidates: doc_terms ⋈ positive terms, counted per (doc, query);
  a doc matches a query's positive part iff its DISTINCT hit count
  equals the query's term count (set semantics — duplicate terms in a
  doc count once);
- negations: doc_terms ⋈ negative terms, LEFT ANTI-joined away.

No shuffle moves more than the vocabulary-filtered (doc, term) pairs;
the per-(doc, query) aggregate is the only wide stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_stored_queries(
    queries: list[dict],
) -> list[tuple[int, list[str], list[str]]]:
    """Validate and normalize the stored-query list into
    (query_id, sorted positive terms, sorted negative terms) triples:
    duplicate terms collapse (matching is set-based), every query needs
    at least one positive term, and query_ids must be unique (one id ==
    one conjunction; see module docstring for OR composition)."""
    seen: set[int] = set()
    out = []
    for q in queries:
        qid = int(q["query_id"])
        if qid in seen:
            raise ValueError(
                f"stored query {qid}: duplicate query_id — register each "
                "OR-disjunct under its own id"
            )
        seen.add(qid)
        pos = sorted(set(q["terms"]))
        if not pos:
            raise ValueError(f"stored query {qid}: needs >=1 positive term")
        out.append((qid, pos, sorted(set(q.get("neg_terms", [])))))
    return out


def stored_queries_df(spark: SparkSession,
                      queries: list[dict]) -> tuple[DataFrame, DataFrame]:
    """Normalize a stored-query list (``{"query_id", "terms",
    "neg_terms"?}``) into two term tables: positives with the query's
    required count attached, and negatives."""
    rows_pos, rows_neg = [], []
    for qid, pos, neg in normalize_stored_queries(queries):
        for t in pos:
            rows_pos.append((qid, t, len(pos)))
        for t in neg:
            rows_neg.append((qid, t))
    pos_df = spark.createDataFrame(
        rows_pos, "query_id long, term string, n_terms int")
    neg_df = spark.createDataFrame(
        rows_neg or [(None, None)], "query_id long, term string"
    )
    if not rows_neg:
        neg_df = neg_df.filter(F.lit(False))
    return pos_df, neg_df


def percolate(doc_terms: DataFrame, pos_df: DataFrame,
              neg_df: DataFrame) -> DataFrame:
    """(doc_id, term) pairs x stored queries -> (query_id, doc_id)
    matches.  ``doc_terms`` may carry duplicates; they are collapsed
    here so callers can feed raw token explosions."""
    vocab = [r["term"] for r in
             pos_df.select("term").union(neg_df.select("term"))
             .distinct().collect()]
    dt = (
        doc_terms.filter(F.col("term").isin(vocab))
        .select("doc_id", "term").distinct()
    )
    cand = (
        dt.join(F.broadcast(pos_df), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count("*").alias("_hits"), F.max("n_terms").alias("_need"))
        .filter(F.col("_hits") == F.col("_need"))
        .select("doc_id", "query_id")
    )
    neg_hits = dt.join(F.broadcast(neg_df), "term").select(
        "doc_id", "query_id").distinct()
    return cand.join(neg_hits, ["doc_id", "query_id"], "left_anti").select(
        "query_id", "doc_id")
