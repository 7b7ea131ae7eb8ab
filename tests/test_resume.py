"""Checkpoint/resume (SURVEY.md §5.6): a build interrupted between waves
resumes from the manifest and yields an index identical to a one-shot
build, without recomputing completed shards."""

import shutil
import tempfile

from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.index_build import (
    IndexReader,
    build_index,
)
from document_retrieval_system_spark.operators.search import bm25_search, flat_postings
from document_retrieval_system_spark.sources.corpus import pages_df

N = 120
SHARDS = 6


def _flat_set(reader):
    rows = flat_postings(reader.postings(), with_positions=True).collect()
    return {
        (r["shard"], r["term"], r["local_no"], r["tf"], tuple(r["positions"]))
        for r in rows
    }


def test_partial_build_then_resume_matches_oneshot(spark):
    pages = pages_df(spark, N)
    one = tempfile.mkdtemp(prefix="drs_one_")
    two = tempfile.mkdtemp(prefix="drs_two_")
    try:
        build_index(spark, pages, one, n_shards=SHARDS)

        # interrupted build: first wave only (2 of 6 shards), no finalize
        build_index(
            spark, pages.filter(F.pmod(F.xxhash64(F.md5("url")), F.lit(SHARDS)) < 2),
            two, n_shards=SHARDS, wave_size=2, finalize=False,
        )
        partial = IndexReader(spark, two)
        done_before = {r["shard"] for r in partial.manifest().select("shard").collect()}
        assert 0 < len(done_before) < SHARDS

        # resume: completed shards are skipped (their manifest rows survive
        # unchanged), remaining shards are appended, then finalize.
        build_index(spark, pages, two, n_shards=SHARDS, wave_size=2, resume=True)
        resumed = IndexReader(spark, two)
        assert {r["shard"] for r in resumed.manifest().select("shard").collect()} == set(
            range(SHARDS)
        )
        # resumed manifest keeps exactly one row per shard — completed
        # shards were NOT rebuilt
        assert resumed.manifest().groupBy("shard").count().filter("count > 1").count() == 0

        assert _flat_set(IndexReader(spark, one)) == _flat_set(resumed)

        # and the resumed index answers queries identically
        a = [(r["doc_id"], r["score"]) for r in
             bm25_search(IndexReader(spark, one), "数据 算法", "zh", 10, 0.0).collect()]
        b = [(r["doc_id"], r["score"]) for r in
             bm25_search(resumed, "数据 算法", "zh", 10, 0.0).collect()]
        assert a == b
    finally:
        shutil.rmtree(one, ignore_errors=True)
        shutil.rmtree(two, ignore_errors=True)
