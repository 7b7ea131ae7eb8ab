"""Streaming percolation (streaming/alerts.py): the map-only HOF form
matches the relational operator on batch input, fires incrementally
across availableNow cycles, and keeps a shuffle-free stateless plan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.percolate import (
    percolate,
    stored_queries_df,
)
from document_retrieval_system_spark.operators.textstats import simple_tokens
from document_retrieval_system_spark.streaming.alerts import percolate_stream

QUERIES = [
    {"query_id": 1, "terms": ["spark", "merge"]},
    {"query_id": 2, "terms": ["alert"], "neg_terms": ["noise"]},
    {"query_id": 3, "terms": ["data"]},
]

DOCS_DDL = "doc_id long, text string"


def test_batch_equivalence_with_relational_percolate(spark):
    rows = [
        (1, "spark merge compaction spark"),
        (2, "alert fired loud"),
        (3, "alert but noise too"),
        (4, "data data data"),
        (5, None),
        (6, "spark only"),
    ]
    docs = spark.createDataFrame(rows, DOCS_DDL)
    got = {
        (r["query_id"], r["doc_id"])
        for r in percolate_stream(docs, QUERIES).collect()
    }
    dt = docs.select(
        "doc_id",
        F.explode(simple_tokens(F.coalesce("text", F.lit("")))).alias("term"),
    )
    pos_df, neg_df = stored_queries_df(spark, QUERIES)
    rel = {
        (r["query_id"], r["doc_id"])
        for r in percolate(dt, pos_df, neg_df).collect()
    }
    assert got == rel == {(1, 1), (2, 2), (3, 4)}


def test_stream_alerts_incremental_cycles(spark, tmp_path):
    incoming, checkpoint = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(incoming)

    def cycle(rows, file_no):
        spark.createDataFrame(rows, DOCS_DDL).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(incoming, f"f{file_no}"))
        captured: list = []
        q = (
            percolate_stream(
                spark.readStream.schema(DOCS_DDL)
                .option("recursiveFileLookup", "true").parquet(incoming),
                QUERIES,
            )
            .writeStream.foreachBatch(
                lambda bdf, bid: captured.extend(bdf.collect()))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r["query_id"], r["doc_id"]) for r in captured}

    assert cycle([(1, "spark merge now"), (2, "nothing here")], 1) == {(1, 1)}
    # second cycle sees ONLY the new file's alerts (no reprocessing, no
    # state needed for exactly-once-per-page alerting)
    assert cycle([(3, "data alert"), (4, "alert noise")], 2) == {
        (2, 3), (3, 3)}


def test_stream_alert_plan_is_stateless_and_shuffle_free(spark):
    docs = spark.createDataFrame([(1, "spark merge")], DOCS_DDL)
    plan = percolate_stream(docs, QUERIES)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "StateStore" not in plan
