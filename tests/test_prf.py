"""RM3 pseudo-relevance feedback (operators/prf.py): expansion-term
selection, weight normalization, and the end-to-end property that
feedback promotes vocabulary-related docs the original query misses."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.prf import rm3_expansion_terms


def _tfs(spark, docs):
    rows = []
    for did, text in docs:
        toks = text.split()
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        rows += [(did, t, c, len(toks)) for t, c in tf.items()]
    return spark.createDataFrame(
        rows, "doc_id long, term string, tf long, dl long")


def test_expansion_terms_weights_and_exclusions(spark):
    docs = [
        (1, "query apple banana banana"),
        (2, "query banana cherry"),
        (3, "noise noise noise"),
    ]
    feedback = spark.createDataFrame(
        [(1, 2.0), (2, 1.0)], "doc_id long, w double")
    out = rm3_expansion_terms(
        _tfs(spark, docs), feedback, ["query"], m_terms=2, beta=0.5
    ).collect()
    got = {r["term"]: r["weight"] for r in out}
    # original term at 1.0; 'query' never reappears as expansion
    assert got["query"] == 1.0
    # banana: 2/4*2 + 1/3*1 = 1.333333; cherry: 1/3; apple: 1/4*2 = 0.5
    # top-2 by ew = banana, apple; weights beta-normalized by max
    assert set(got) == {"query", "banana", "apple"}
    assert got["banana"] == 0.5                      # beta * ew/max = beta
    assert 0 < got["apple"] < 0.5
    # doc 3's vocabulary (not in feedback) contributes nothing
    assert "noise" not in got


def test_prf_promotes_cooccurring_vocabulary(spark, tmp_path):
    """A doc sharing NO original query term but rich in the feedback
    set's companion vocabulary enters the re-scored results."""
    import os

    from document_retrieval_system_spark.entry_queries import (
        QUERIES,
        q_r3_bm25_topk,
    )

    # corpus: 'data' docs all carry companion term 'zebra'; doc 100 has
    # ONLY 'zebra' (invisible to the original query), filler docs pad
    rows = [(i, "data zebra common filler" + " pad" * (i % 3))
            for i in range(10)]
    rows.append((100, "zebra zebra zebra zebra"))
    rows += [(200 + i, "common filler pad other words here")
             for i in range(10)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")).withColumn(
        "n_chars", F.length("text")).coalesce(1).write.parquet(
        os.path.join(sf, "documents.parquet"))

    plain = {r["doc_id"] for r in q_r3_bm25_topk(spark, sf).collect()}
    prf = {r["doc_id"]
           for r in QUERIES["search_prf_rm3"][0](spark, sf).collect()}
    assert 100 not in plain     # no original term in doc 100
    assert 100 in prf           # expansion vocabulary found it
