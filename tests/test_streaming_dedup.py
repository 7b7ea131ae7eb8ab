"""Streaming dedup: watermark-bounded exact-content and canonical-URL
duplicate suppression, driven through availableNow cycles sharing one
checkpoint (the watermark advances between cycles as it does between
micro-batches of a live stream)."""

from __future__ import annotations

import os
from datetime import datetime

from document_retrieval_system_spark.streaming.dedup import (
    dedup_stream_exact,
    dedup_stream_url,
)

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def _row(url: str, ts: datetime, html: bytes):
    return (url, ts, html, None, "en")


def _run_cycle(spark, build_stream, incoming, checkpoint, rows, file_no):
    df = spark.createDataFrame(rows, PAGES_DDL)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(incoming, f"f{file_no}")
    )
    captured: list = []
    q = (
        build_stream(spark.readStream.schema(PAGES_DDL)
                     .option("recursiveFileLookup", "true").parquet(incoming))
        .writeStream.foreachBatch(lambda bdf, bid: captured.extend(bdf.collect()))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return captured


def test_stream_exact_dedup_within_watermark(spark, tmp_path):
    incoming = str(tmp_path / "in")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(incoming)
    t = lambda m, s=0: datetime(2024, 1, 1, 10, m, s)  # noqa: E731
    build = lambda s: dedup_stream_exact(s, watermark="5 minutes")  # noqa: E731

    # cycle 1: A, B, and an in-batch duplicate of A -> A emits once
    got1 = _run_cycle(spark, build, incoming, checkpoint, [
        _row("u1", t(0), b"content-A"),
        _row("u2", t(0, 30), b"content-B"),
        _row("u3", t(1), b"content-A"),
    ], 1)
    assert sorted(r["html"] for r in got1) == [b"content-A", b"content-B"]
    assert len(got1) == 2

    # cycle 2: cross-batch duplicate of B within the horizon -> dropped;
    # fresh C passes
    got2 = _run_cycle(spark, build, incoming, checkpoint, [
        _row("u4", t(2), b"content-B"),
        _row("u5", t(2, 30), b"content-C"),
    ], 2)
    assert [r["html"] for r in got2] == [b"content-C"]

    # cycle 3: advance the watermark far past every seen key's horizon
    # (eviction applies at the END of the batch that moves the
    # watermark, so the advancer and the re-sent duplicate must be in
    # different cycles)
    got3 = _run_cycle(spark, build, incoming, checkpoint, [
        _row("u6", t(30), b"content-D"),
    ], 3)
    assert [r["html"] for r in got3] == [b"content-D"]

    # cycle 4: the same content far beyond the watermark horizon is
    # state-evicted -> passes again (bounded state, documented contract)
    got4 = _run_cycle(spark, build, incoming, checkpoint, [
        _row("u7", t(31), b"content-A"),
    ], 4)
    assert [r["html"] for r in got4] == [b"content-A"]


def test_stream_exact_dedup_batch_equivalence(spark):
    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    df = spark.createDataFrame(
        [_row("u1", t(0), b"content-A"), _row("u2", t(1), b"content-A"),
         _row("u3", t(2), b"content-B")],
        PAGES_DDL,
    )
    out = dedup_stream_exact(df).collect()
    assert sorted(r["html"] for r in out) == [b"content-A", b"content-B"]
    assert all(len(r["content_key"]) == 32 for r in out)


def test_stream_url_dedup_canonicalizes(spark, tmp_path):
    """Tracking-param / fragment / trailing-slash variants of one URL
    collapse to a single emitted page across batches."""
    incoming = str(tmp_path / "in")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(incoming)
    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    build = lambda s: dedup_stream_url(s, watermark="5 minutes")  # noqa: E731

    got1 = _run_cycle(spark, build, incoming, checkpoint, [
        _row("https://ex.com/a?utm_source=x", t(0), b"p1"),
        _row("https://ex.com/b", t(0), b"p2"),
    ], 1)
    assert len(got1) == 2

    got2 = _run_cycle(spark, build, incoming, checkpoint, [
        _row("https://ex.com/a#frag", t(1), b"p1-refetch"),
        _row("https://ex.com/b/", t(1), b"p2-refetch"),
        _row("https://ex.com/c", t(2), b"p3"),
    ], 2)
    assert [r["url"] for r in got2] == ["https://ex.com/c"]
    assert got2[0]["canon_url"] == "https://ex.com/c"
