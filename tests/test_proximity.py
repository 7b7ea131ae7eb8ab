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


def test_best_passage_hand_corpus(spark):
    from document_retrieval_system_spark.operators.proximity import (
        best_passage,
    )

    # doc 1: two hits clustered (pos 10, 12) + one far hit (pos 200)
    # doc 2: three hits spread past the width -> best window holds 1..2
    pos = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 12), (1, "a", 200),
         (2, "a", 1), (2, "b", 80), (2, "a", 160)],
        "doc_id long, term string, pos long")
    idf = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "term string, idf double")
    got = {r["doc_id"]: r for r in
           best_passage(pos, idf, width=50).collect()}
    assert (got[1]["start"], got[1]["end"], got[1]["score"]) == (10, 59, 3.0)
    # doc 2: no 50-window holds two hits; best is the highest-idf hit,
    # smallest start on ties
    assert (got[2]["start"], got[2]["score"]) == (80, 2.0)


def test_best_passage_tie_breaks_on_smallest_start(spark):
    from document_retrieval_system_spark.operators.proximity import (
        best_passage,
    )

    pos = spark.createDataFrame(
        [(1, "a", 5), (1, "a", 300)], "doc_id long, term string, pos long")
    idf = spark.createDataFrame([("a", 1.0)], "term string, idf double")
    got = best_passage(pos, idf, width=50).collect()
    assert len(got) == 1 and got[0]["start"] == 5


def test_best_passage_window_is_inclusive_of_width(spark):
    from document_retrieval_system_spark.operators.proximity import (
        best_passage,
    )

    # hits at pos 1 and pos width: exactly inside [1, 1+width-1]
    pos = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 50), (1, "a", 51)],
        "doc_id long, term string, pos long")
    idf = spark.createDataFrame([("a", 1.0)], "term string, idf double")
    got = best_passage(pos, idf, width=50).collect()[0]
    # window starting at 1 covers pos 50 but not 51; window at 50
    # covers 50+51 -> ties at 2.0, earliest start wins... both hold 2
    assert got["score"] == 2.0
    assert got["start"] == 1
