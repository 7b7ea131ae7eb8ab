"""Ranking metrics (operators/evaluate.py): hand-computed nDCG/MRR/
precision/recall on fixtures covering graded gains, k-cutoff, unjudged
docs, no-hit queries, and perfect rankings."""

from __future__ import annotations

import math

import pytest


def _metrics(spark, ranked, qrels, k):
    from document_retrieval_system_spark.operators.evaluate import (
        ranking_metrics,
    )

    r = spark.createDataFrame(ranked, "qid long, doc_id long, score double")
    j = spark.createDataFrame(qrels, "qid long, doc_id long, rel long")
    return {row["qid"]: (row["ndcg"], row["mrr"], row["precision"],
                         row["recall"])
            for row in ranking_metrics(r, j, k=k).collect()}


def test_hand_computed_graded_ndcg(spark):
    # ranking: d1 (rel 1), d2 (rel 0), d3 (rel 2) at ranks 1, 2, 3
    ranked = [(0, 1, 9.0), (0, 2, 8.0), (0, 3, 7.0)]
    qrels = [(0, 1, 1), (0, 3, 2), (0, 9, 1)]  # d9 relevant, not retrieved
    got = _metrics(spark, ranked, qrels, k=3)
    dcg = (2 ** 1 - 1) / math.log2(2) + (2 ** 2 - 1) / math.log2(4)
    idcg = (2 ** 2 - 1) / math.log2(2) + (2 ** 1 - 1) / math.log2(3) \
        + (2 ** 1 - 1) / math.log2(4)
    assert got[0] == (round(dcg / idcg, 6), 1.0, round(2 / 3, 6),
                      round(2 / 3, 6))


def test_k_cutoff_and_mrr(spark):
    # first relevant at rank 3; k=2 must miss it entirely
    ranked = [(0, 1, 9.0), (0, 2, 8.0), (0, 3, 7.0)]
    qrels = [(0, 3, 1)]
    assert _metrics(spark, ranked, qrels, k=2)[0] == (0.0, 0.0, 0.0, 0.0)
    got3 = _metrics(spark, ranked, qrels, k=3)[0]
    assert got3 == (round((1 / math.log2(4)) / 1.0, 6), round(1 / 3, 6),
                    round(1 / 3, 6), 1.0)


def test_perfect_ranking_is_one(spark):
    ranked = [(0, 1, 9.0), (0, 2, 8.0)]
    qrels = [(0, 1, 2), (0, 2, 1)]
    assert _metrics(spark, ranked, qrels, k=2)[0] == (1.0, 1.0, 1.0, 1.0)


def test_unjudged_docs_count_as_irrelevant_and_rel0_rows_ignored(spark):
    ranked = [(0, 1, 9.0), (0, 2, 8.0)]
    qrels = [(0, 2, 1), (0, 1, 0)]  # explicit rel=0 row must not count
    got = _metrics(spark, ranked, qrels, k=2)[0]
    assert got == (round((1 / math.log2(3)) / 1.0, 6), 0.5, 0.5, 1.0)


def test_query_without_judgments_dropped(spark):
    ranked = [(0, 1, 9.0), (1, 1, 9.0)]
    qrels = [(0, 1, 1)]
    got = _metrics(spark, ranked, qrels, k=1)
    assert set(got) == {0}


def test_score_tie_breaks_by_doc_id(spark):
    # equal scores: doc 1 outranks doc 2, deterministically
    ranked = [(0, 2, 9.0), (0, 1, 9.0)]
    qrels = [(0, 1, 1)]
    got = _metrics(spark, ranked, qrels, k=1)[0]
    assert got == (1.0, 1.0, 1.0, 1.0)


@pytest.mark.parametrize("k", [1, 2, 5])
def test_recall_precision_consistency(spark, k):
    ranked = [(0, d, 10.0 - d) for d in range(1, 6)]
    qrels = [(0, d, 1) for d in (2, 4)]
    (ndcg, mrr, prec, rec) = _metrics(spark, ranked, qrels, k=k)[0]
    hits = len([d for d in (2, 4) if d <= k])
    assert prec == round(hits / k, 6)
    assert rec == round(hits / 2, 6)
