"""Percolation (operators/percolate.py): brute-force equivalence on a
planted corpus plus the set-semantics and negation edge cases."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.percolate import (
    percolate,
    stored_queries_df,
)

VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]
QUERIES = [
    {"query_id": 1, "terms": ["aa", "bb"]},
    {"query_id": 2, "terms": ["cc"], "neg_terms": ["dd"]},
    {"query_id": 3, "terms": ["ee", "ff", "aa"], "neg_terms": ["bb", "cc"]},
    {"query_id": 4, "terms": ["dd", "dd", "aa"]},  # dup term collapses
]


def _brute(doc_sets):
    out = set()
    for did, terms in doc_sets.items():
        for q in QUERIES:
            if set(q["terms"]) <= terms and not (
                set(q.get("neg_terms", [])) & terms
            ):
                out.add((q["query_id"], did))
    return out


def test_percolate_bruteforce(spark):
    rng = random.Random(7)
    doc_sets = {
        d: {t for t in VOCAB if rng.random() < 0.45} | {"zz"}
        for d in range(200)
    }
    # duplicates in the raw stream must not double-count
    rows = [
        (d, t) for d, ts in doc_sets.items() for t in ts for _ in range(2)
    ]
    dt = spark.createDataFrame(rows, "doc_id long, term string")
    pos_df, neg_df = stored_queries_df(spark, QUERIES)
    got = {
        (r["query_id"], r["doc_id"])
        for r in percolate(dt, pos_df, neg_df).collect()
    }
    assert got == _brute(doc_sets)
    assert got  # non-vacuous


def test_percolate_no_negations_anywhere(spark):
    """A query store with zero negative terms exercises the empty
    neg_df path."""
    qs = [{"query_id": 9, "terms": ["aa"]}]
    dt = spark.createDataFrame(
        [(1, "aa"), (2, "bb")], "doc_id long, term string")
    pos_df, neg_df = stored_queries_df(spark, qs)
    got = percolate(dt, pos_df, neg_df).collect()
    assert [(r["query_id"], r["doc_id"]) for r in got] == [(9, 1)]


def test_percolate_broadcasts_query_store(spark):
    from document_retrieval_system_spark.entry_queries import (
        PERCOLATE_QUERIES,
    )

    dt = spark.createDataFrame(
        [(1, "data"), (1, "join"), (1, "filter")], "doc_id long, term string")
    pos_df, neg_df = stored_queries_df(spark, PERCOLATE_QUERIES)
    plan = percolate(dt, pos_df, neg_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_percolate_rejects_duplicate_query_ids(spark):
    import pytest as _pytest

    from document_retrieval_system_spark.streaming.alerts import (
        percolate_stream,
    )

    dup = [{"query_id": 1, "terms": ["aa"]},
           {"query_id": 1, "terms": ["bb"]}]
    with _pytest.raises(ValueError, match="duplicate query_id"):
        stored_queries_df(spark, dup)
    docs = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="duplicate query_id"):
        percolate_stream(docs, dup)
