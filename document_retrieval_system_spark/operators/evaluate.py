"""Ranking-quality evaluation: nDCG@k, MRR, precision@k, recall@k.

A retrieval engine without an evaluation harness can't tell whether a
ranking change (proximity boost, fuzzy expansion, fusion weights)
helped — the reference ships none (its tests assert plumbing, not
ranking quality), so this is a first-class addition: the standard
graded-relevance metrics computed relationally over (query, doc, score)
ranking output and a (query, doc, rel) judgment table.

Definitions (Järvelin & Kekäläinen 2002 graded nDCG; TREC conventions):

- ``DCG@k   = Σ_{i≤k} (2^rel_i - 1) / log2(i + 1)`` over the ranking's
  top k by (score desc, doc_id asc) — the engine-wide deterministic
  tie-break.
- ``IDCG@k`` = the same sum over the judgments ranked by (rel desc,
  doc_id asc); nDCG = DCG/IDCG.
- ``MRR`` = 1 / rank of the first relevant (rel > 0) hit in the top k,
  0 if none.
- ``precision@k`` = relevant hits in top k / k; ``recall@k`` = hits /
  total relevant.

Scale shape: metrics are per-query aggregates over top-k rows — the
input is k rows per query regardless of corpus size, so the whole
evaluation costs O(queries × k) after retrieval and every join here is
broadcast-sized.  The judgment join is a left join (unjudged docs score
rel 0, the standard pooling assumption).  All ratios are exact integer
divisions in doubles; the log-discount sums round to 6 for cross-engine
hashing (same convention as the BM25 scorers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(ranked: DataFrame, qrels: DataFrame,
                    k: int = 10) -> DataFrame:
    """Per-query metrics over ``ranked`` (qid, doc_id, score) judged by
    ``qrels`` (qid, doc_id, rel).  Returns (qid, ndcg, mrr, precision,
    recall); queries with no judged-relevant documents are dropped
    (their nDCG/recall are undefined — 0/0)."""
    qrels = qrels.filter(F.col("rel") > 0).select("qid", "doc_id", "rel")
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    topk = ranked.select("qid", "doc_id", "score").withColumn(
        "rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    judged = topk.join(qrels, ["qid", "doc_id"], "left").withColumn(
        "rel", F.coalesce(F.col("rel"), F.lit(0)))
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("rank") + 1)
    got = judged.groupBy("qid").agg(
        F.sum(gain).alias("_dcg"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("_hits"),
        F.max(F.when(F.col("rel") > 0, 1.0 / F.col("rank"))).alias("_mrr"),
    )
    wi = Window.partitionBy("qid").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc())
    igain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("_ir") + 1)
    ideal = (
        qrels.withColumn("_ir", F.row_number().over(wi))
        .groupBy("qid")
        .agg(
            F.sum(F.when(F.col("_ir") <= k, igain)).alias("_idcg"),
            F.count("*").cast("long").alias("_n_rel"),
        )
    )
    return got.join(ideal, "qid").select(
        "qid",
        F.round(F.col("_dcg") / F.col("_idcg"), 6).alias("ndcg"),
        F.round(F.coalesce(F.col("_mrr"), F.lit(0.0)), 6).alias("mrr"),
        F.round(F.col("_hits") / F.lit(float(k)), 6).alias("precision"),
        F.round(F.col("_hits") / F.col("_n_rel"), 6).alias("recall"),
    )
