"""Structured-Streaming incremental index maintenance: new page batches
appended as delta segments must be query-visible and upsert-guarded."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.index_build import (
    IndexReader,
    build_index,
)
from document_retrieval_system_spark.operators.search import bm25_search
from document_retrieval_system_spark.sources.corpus import PAGES_DDL, gen_pages_pandas
from document_retrieval_system_spark.streaming.incremental import run_incremental

SHARDS = 4


@pytest.fixture(scope="module")
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"drs_stream_{k}_") for k in
         ("index", "incoming", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def test_incremental_append_and_upsert_guard(spark, dirs):
    # base index: pages 0..79
    base = spark.createDataFrame(gen_pages_pandas(80), PAGES_DDL)
    build_index(spark, base, dirs["index"], n_shards=SHARDS)
    r = IndexReader(spark, dirs["index"])
    n_base = r.docs().count()
    assert n_base == 80

    # stream in: 40 new pages + 10 re-sent old pages (same warc_ts ->
    # must be skipped by the I6 upsert guard)
    new = gen_pages_pandas(40, start=80)
    resent = gen_pages_pandas(10, start=0)
    spark.createDataFrame(new, PAGES_DDL).write.mode("overwrite").parquet(
        dirs["incoming"] + "/b1"
    )
    spark.createDataFrame(resent, PAGES_DDL).write.mode("append").parquet(
        dirs["incoming"] + "/b1"
    )
    run_incremental(spark, dirs["incoming"] + "/b1", dirs["index"],
                    dirs["ckpt"], n_shards=SHARDS)

    r2 = IndexReader(spark, dirs["index"])
    assert r2.docs().count() == 120  # 80 base + 40 new, 10 resends skipped
    # no duplicate doc_ids
    assert r2.docs().groupBy("doc_id").count().filter("count > 1").count() == 0
    # local_no stays unique per shard (delta segment numbering continues)
    assert (
        r2.docs().groupBy("shard", "local_no").count().filter("count > 1").count() == 0
    )

    # streamed docs are searchable with correct global stats
    oneshot_dir = tempfile.mkdtemp(prefix="drs_stream_oneshot_")
    try:
        allpages = spark.createDataFrame(gen_pages_pandas(120), PAGES_DDL)
        build_index(spark, allpages, oneshot_dir, n_shards=SHARDS)
        a = {(row["doc_id"], round(row["score"], 9))
             for row in bm25_search(r2, "数据 算法", "zh", 200, 0.0).collect()}
        b = {(row["doc_id"], round(row["score"], 9))
             for row in bm25_search(IndexReader(spark, oneshot_dir),
                                    "数据 算法", "zh", 200, 0.0).collect()}
        assert {d for d, _ in a} == {d for d, _ in b}
        assert a == b  # identical scores: streaming append == batch rebuild
    finally:
        shutil.rmtree(oneshot_dir, ignore_errors=True)
