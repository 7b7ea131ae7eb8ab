"""Rank-fusion and keyset-pagination operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.fusion import (
    ranked,
    rrf_fuse,
    search_after,
)


def test_ranked_orders_score_desc_id_asc(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 3.0), (3, 2.0)], "doc_id long, score double"
    )
    got = {r["doc_id"]: r["rank"] for r in ranked(df).collect()}
    assert got == {2: 1, 1: 2, 3: 3}  # tie 1 vs 3 -> lower id first


def test_rrf_fuse_hand_computed(spark):
    ra = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    rb = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: (r["rrf_score"], r["n_lists"]) for r in
           rrf_fuse([ra, rb], k_rrf=60).collect()}
    assert abs(out[1][0] - 1 / 61) < 1e-12 and out[1][1] == 1
    assert abs(out[2][0] - (1 / 62 + 1 / 61)) < 1e-12 and out[2][1] == 2
    assert abs(out[3][0] - 1 / 62) < 1e-12 and out[3][1] == 1
    # doc in both lists outranks docs in one
    order = [r["doc_id"] for r in rrf_fuse([ra, rb]).collect()]
    assert order[0] == 2


def test_search_after_equals_offset_page(spark):
    """Keyset page == rank-window page on the same deterministic order
    (the whole point: same rows, no offset scan)."""
    rows = [(i, float(100 - (i % 7))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    full = df.orderBy(F.desc("score"), "doc_id").collect()
    cursor = full[9]  # rank-10 row
    page = search_after(df, F.lit(cursor["score"]), F.lit(cursor["doc_id"]),
                        10).collect()
    want = [(r["doc_id"], r["score"]) for r in full[10:20]]
    assert [(r["doc_id"], r["score"]) for r in page] == want


def test_search_after_tie_straddling_cursor(spark):
    """Cursor inside a tie group: only higher-id members of the tie
    appear on the next page."""
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(6)] + [(10, 4.0)],
        "doc_id long, score double",
    )
    page = search_after(df, F.lit(5.0), F.lit(2), 10).collect()
    assert [r["doc_id"] for r in page] == [3, 4, 5, 10]


def test_static_rank_blend_hand_computed(spark):
    import math

    from document_retrieval_system_spark.operators.fusion import (
        static_rank_blend,
    )

    scored = spark.createDataFrame(
        [(1, 2.0), (2, 2.0), (3, 1.0)], "doc_id long, score double")
    prior = spark.createDataFrame(
        [(1, 1.0), (2, 4.0)], "doc_id long, prior double")
    got = {r["doc_id"]: r["score"] for r in
           static_rank_blend(scored, prior, weight=0.5).collect()}
    assert got[1] == pytest.approx(2.0 * (1 + 0.5 * math.log(2.0)))
    assert got[2] == pytest.approx(2.0 * (1 + 0.5 * math.log(5.0)))
    # doc 3 has NO prior: kept with its raw score, not dropped
    assert got[3] == pytest.approx(1.0)
    assert got[2] > got[1] > got[3]
