"""Proximity-boosted ranking operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.proximity import (
    min_pair_gap,
    proximity_boosted,
)


def _pos(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, term string, pos long")


def test_min_pair_gap_hand_computed(spark):
    rows = [
        # doc 1: aa@1, bb@5, aa@8 -> min |gap| = min(4, 3) = 3
        (1, "aa", 1), (1, "bb", 5), (1, "aa", 8),
        # doc 2: only aa twice -> no DISTINCT pair, no row
        (2, "aa", 2), (2, "aa", 9),
        # doc 3: adjacent aa bb -> 1
        (3, "bb", 4), (3, "aa", 5),
        # doc 4: non-query term ignored
        (4, "aa", 1), (4, "zz", 2),
    ]
    got = {r["doc_id"]: r["min_gap"] for r in
           min_pair_gap(_pos(spark, rows), ["aa", "bb"]).collect()}
    assert got == {1: 3, 3: 1}


def test_proximity_boosted_scores_and_nulls(spark):
    base = spark.createDataFrame(
        [(1, 2.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    gaps = spark.createDataFrame([(1, 1)], "doc_id long, min_gap long")
    out = {r["doc_id"]: (r["score"], r["min_gap"]) for r in
           proximity_boosted(base, gaps, weight=0.5).collect()}
    # doc 1 boosted by 0.5/(1+1); docs 2-3 keep bare scores, NULL gap
    assert out[1] == (2.25, 1)
    assert out[2] == (2.0, None) and out[3] == (1.0, None)


def test_proximity_flips_equal_bm25_tie(spark):
    """Two docs with identical BM25: the one whose query terms sit in a
    tight window must outrank the scattered one."""
    base = spark.createDataFrame(
        [(1, 3.0), (2, 3.0)], "doc_id long, score double"
    )
    gaps = spark.createDataFrame(
        [(1, 1), (2, 40)], "doc_id long, min_gap long"
    )
    ranked = [r["doc_id"] for r in
              proximity_boosted(base, gaps)
              .orderBy(F.desc("score"), "doc_id").collect()]
    assert ranked == [1, 2]
