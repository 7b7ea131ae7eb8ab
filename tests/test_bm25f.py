"""BM25F fielded scoring (operators/bm25f.py)."""

from __future__ import annotations

import math

import pytest

from document_retrieval_system_spark.operators.bm25f import bm25f_scores


def _fields(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, field string, toks array<string>")


def test_title_hit_outranks_body_hit(spark):
    # same tf, same lengths — only the field differs.
    fields = _fields(spark, [
        (0, "title", ["cat", "dog"]), (0, "body", ["bird", "fish", "ant"]),
        (1, "title", ["dog", "bird"]), (1, "body", ["cat", "fish", "ant"]),
    ])
    got = {r["doc_id"]: r["score"] for r in
           bm25f_scores(fields, ["cat"], {"title": 2.0, "body": 1.0})
           .collect()}
    assert got[0] > got[1] > 0


def test_fold_before_saturation(spark):
    # BM25F folds per-field tf into one pseudo-frequency BEFORE the
    # k1 saturation; verify against a hand-computed value with b=0 so
    # length normalization drops out.
    fields = _fields(spark, [
        (0, "title", ["x"]), (0, "body", ["x", "x", "y"]),
        (1, "title", ["y"]), (1, "body", ["y"]),
    ])
    got = {r["doc_id"]: r["score"] for r in
           bm25f_scores(fields, ["x"], {"title": 3.0, "body": 1.0},
                        field_b={"title": 0.0, "body": 0.0},
                        k1=1.2).collect()}
    tft = 3.0 * 1 + 1.0 * 2          # w_f * tf_f, no length norm
    idf = math.log((2 - 1 + 0.5) / (1 + 0.5) + 1)  # N=2, df=1
    assert got[0] == pytest.approx(idf * tft / (tft + 1.2), rel=1e-12)
    assert 1 not in got              # no query term -> no row


def test_empty_field_rows_shape_avg_lengths(spark):
    # doc 1's empty title must pull avg title length down to 0.5;
    # with b=1 doc 0's title tf norm becomes flen/avgfl = 2.0.
    fields = _fields(spark, [
        (0, "title", ["x"]), (0, "body", []),
        (1, "title", []), (1, "body", ["x"]),
    ])
    got = {r["doc_id"]: r["score"] for r in
           bm25f_scores(fields, ["x"], {"title": 1.0, "body": 1.0},
                        field_b={"title": 1.0, "body": 1.0},
                        k1=1.2).collect()}
    idf = math.log((2 - 2 + 0.5) / (2 + 0.5) + 1)
    tft = 1.0 * 1 / (1 / 0.5)        # flen=1, avgfl=0.5
    assert got[0] == pytest.approx(idf * tft / (tft + 1.2), rel=1e-12)
    assert got[0] == pytest.approx(got[1], rel=1e-12)  # symmetric corpus


def test_unknown_field_b_rejected(spark):
    fields = _fields(spark, [(0, "title", ["x"])])
    with pytest.raises(ValueError, match="unknown fields"):
        bm25f_scores(fields, ["x"], {"title": 1.0}, field_b={"nope": 0.5})


def test_broadcast_param_join_in_plan(spark):
    fields = _fields(spark, [(0, "title", ["x"]), (0, "body", ["y"])])
    plan = (bm25f_scores(fields, ["x"], {"title": 2.0, "body": 1.0})
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
