"""Lineage time travel: manifest_stats_asof + index_history."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.index_build import (
    IndexReader,
    index_history,
    manifest_stats,
    manifest_stats_asof,
)


@pytest.fixture()
def mutable_index(spark, index_dir):
    tmp = tempfile.mkdtemp(prefix="drs_tt_")
    shutil.rmtree(tmp)
    shutil.copytree(index_dir, tmp)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_asof_reproduces_pre_maintenance_totals(spark, mutable_index):
    from document_retrieval_system_spark.sources.tables import (
        delete_documents,
    )

    reader = IndexReader(spark, mutable_index)
    stats0 = manifest_stats(reader.manifest())
    t0 = reader.manifest().agg(F.max("committed_at")).collect()[0][0]

    victims = [r["url"] for r in
               reader.docs().select("url").orderBy("url").limit(3).collect()]
    delete_documents(spark, mutable_index, victims)

    stats_now = manifest_stats(reader.manifest())
    assert stats_now["postings"] < stats0["postings"]

    # replaying only events <= t0 recovers the pre-delete totals exactly
    assert manifest_stats_asof(reader.manifest(), t0) == stats0
    # and an as-of in the future equals the present
    t1 = reader.manifest().agg(F.max("committed_at")).collect()[0][0]
    assert manifest_stats_asof(reader.manifest(), t1) == stats_now


def test_index_history_versions_are_dense_and_ordered(spark, mutable_index):
    from document_retrieval_system_spark.sources.tables import (
        delete_documents,
    )

    reader = IndexReader(spark, mutable_index)
    n0 = reader.manifest().count()
    victims = [r["url"] for r in
               reader.docs().select("url").orderBy("url").limit(2).collect()]
    delete_documents(spark, mutable_index, victims)

    hist = index_history(reader.manifest()).collect()
    assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
    assert len(hist) > n0
    ts = [r["committed_at"] for r in hist]
    assert ts == sorted(ts)
    # the delete's shard rewrite is visible as snapshot events after the
    # initial build's appends
    kinds = [r["kind"] for r in hist]
    assert "snapshot" in kinds
    assert kinds.index("snapshot") > 0


def test_asof_accepts_iso_string(spark, mutable_index):
    reader = IndexReader(spark, mutable_index)
    stats = manifest_stats(reader.manifest())
    assert manifest_stats_asof(reader.manifest(), "2099-01-01") == stats
    empty = manifest_stats_asof(reader.manifest(), "2000-01-01")
    assert empty["postings"] is None  # no events yet at that time
