"""Static impact-ordered index pruning (operators/prune.py)."""

from __future__ import annotations

import math

import pytest

from document_retrieval_system_spark.operators.prune import impact_prune_tfs


def _tfs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, term string, tf long, dl long")


def test_keeps_top_frac_by_tf_then_docid(spark):
    # term "a": df=10, keep ceil(0.3*10)=3 -> top tfs 10,9,8
    rows = [(d, "a", 10 - d, 50) for d in range(10)]
    rows += [(0, "rare", 1, 50)]          # df=1 -> keep_min floor
    out = impact_prune_tfs(_tfs(spark, rows), keep_frac=0.3,
                           keep_min=2).collect()
    kept = {(r["term"], r["doc_id"]) for r in out}
    assert kept == {("a", 0), ("a", 1), ("a", 2), ("rare", 0)}


def test_docid_tiebreak_is_deterministic(spark):
    rows = [(d, "t", 5, 50) for d in range(6)]   # all tied on tf
    out = impact_prune_tfs(_tfs(spark, rows), keep_frac=0.5,
                           keep_min=1).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]


def test_keep_min_floor_preserves_rare_terms(spark):
    rows = [(d, "t", d + 1, 50) for d in range(4)]  # df=4, 0.1*4 -> ceil=1
    out = impact_prune_tfs(_tfs(spark, rows), keep_frac=0.1,
                           keep_min=3).collect()
    assert len(out) == 3
    assert sorted(r["tf"] for r in out) == [2, 3, 4]  # highest impacts


def test_columns_pass_through_unchanged(spark):
    rows = [(1, "t", 7, 42)]
    out = impact_prune_tfs(_tfs(spark, rows)).collect()
    assert out[0].asDict() == {"doc_id": 1, "term": "t", "tf": 7, "dl": 42}


def test_invalid_frac_rejected(spark):
    with pytest.raises(ValueError, match="keep_frac"):
        impact_prune_tfs(_tfs(spark, [(1, "t", 1, 1)]), keep_frac=0.0)
    with pytest.raises(ValueError, match="keep_frac"):
        impact_prune_tfs(_tfs(spark, [(1, "t", 1, 1)]), keep_frac=1.5)


def test_global_reduction_matches_per_term_ceil(spark):
    rows = [(d, f"t{t}", (d * 7 + t) % 11 + 1, 50)
            for t in range(5) for d in range(20)]
    frame = _tfs(spark, rows)
    out = impact_prune_tfs(frame, keep_frac=0.25, keep_min=2)
    assert out.count() == 5 * max(2, math.ceil(0.25 * 20))
