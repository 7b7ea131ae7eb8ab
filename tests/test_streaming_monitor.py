"""Streaming monitor operators: watermarked windowed aggregation
(late-data drop, once-per-window append emission) and stateful
sessionization via applyInPandasWithState (event-time timeouts).

Each test drives a real file-source stream through several
``availableNow`` cycles sharing one checkpoint, so the watermark
advances BETWEEN cycles exactly as it does between micro-batches of a
long-running stream; emitted rows are captured with a foreachBatch
collector (the memory sink cannot recover from a checkpoint)."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from document_retrieval_system_spark.streaming.monitor import (
    crawl_rate,
    sessionize_hosts,
)

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def _page(host: str, ts: datetime, n_bytes: int = 10):
    return (f"https://{host}/p{ts.minute}{ts.second}", ts, b"x" * n_bytes, "t", "en")


def _run_cycle(spark, build_stream, incoming, checkpoint, rows, file_no):
    """Write one parquet file of rows, then drain the stream once."""
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


def test_crawl_rate_watermark_drops_late_rows(spark, tmp_path):
    incoming = str(tmp_path / "in")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(incoming)
    t = lambda m, s: datetime(2024, 1, 1, 10, m, s)  # noqa: E731

    build = lambda stream: crawl_rate(stream, "1 minute", "2 minutes")  # noqa: E731

    # cycle 1: two hosts in two windows; nothing can emit yet (the
    # watermark is still before every window end)
    got1 = _run_cycle(spark, build, incoming, checkpoint, [
        _page("a.com", t(0, 10)), _page("a.com", t(0, 20), 30),
        _page("b.com", t(1, 10)),
    ], 1)
    assert got1 == []

    # cycle 2: a late row (09:57, behind the watermark 09:59:10) must be
    # DROPPED, and the 10:05 row advances the watermark past both open
    # windows so they emit exactly once
    got2 = _run_cycle(spark, build, incoming, checkpoint, [
        _page("a.com", datetime(2024, 1, 1, 9, 57, 0)),
        _page("b.com", t(5, 0)),
    ], 2)
    emitted = {(r["win_start"], r["host"]): (r["n_pages"], r["html_bytes"])
               for r in got2}
    assert emitted == {
        (t(0, 0), "a.com"): (2, 40),
        (t(1, 0), "b.com"): (1, 10),
    }
    # the late row's window ([09:57, 09:58)) must never appear
    assert not any(r["win_start"].minute == 57 for r in got2)

    # cycle 3: an advancer flushes the 10:05 window — count is 1, the
    # late row did not sneak into any window
    got3 = _run_cycle(spark, build, incoming, checkpoint, [
        _page("c.com", datetime(2024, 1, 1, 10, 20, 0)),
    ], 3)
    emitted3 = {(r["win_start"], r["host"]): r["n_pages"] for r in got3}
    assert emitted3 == {(t(5, 0), "b.com"): 1}


def test_crawl_rate_batch_equivalence(spark):
    """The same function runs on a batch DataFrame (watermark is a
    no-op) — backfill and live stream share one metric definition."""
    t = lambda m, s: datetime(2024, 1, 1, 10, m, s)  # noqa: E731
    df = spark.createDataFrame(
        [_page("a.com", t(0, 10)), _page("a.com", t(0, 20), 30),
         _page("b.com", t(1, 10)), _page("a.com", t(5, 0))],
        PAGES_DDL,
    )
    rows = {(r["win_start"], r["host"]): (r["n_pages"], r["html_bytes"])
            for r in crawl_rate(df).collect()}
    assert rows == {
        (t(0, 0), "a.com"): (2, 40),
        (t(1, 0), "b.com"): (1, 10),
        (t(5, 0), "a.com"): (1, 10),
    }


def test_sessionize_hosts_stateful_timeouts(spark, tmp_path):
    incoming = str(tmp_path / "in")
    checkpoint = str(tmp_path / "ckpt")
    os.makedirs(incoming)
    h = lambda m: datetime(2024, 1, 1, 10, m, 0)  # noqa: E731

    build = lambda stream: sessionize_hosts(stream, gap_minutes=30,  # noqa: E731
                                            watermark="10 minutes")

    # cycle 1: open sessions for a (2 pages) and b (1 page); none closed
    got1 = _run_cycle(spark, build, incoming, checkpoint, [
        _page("a.com", h(0)), _page("a.com", h(5)), _page("b.com", h(0)),
    ], 1)
    assert got1 == []

    # cycle 2: a's 11:00 page exceeds the 30-min gap -> closes the first
    # session in-line; b goes quiet past its event-time timeout
    # (10:00 + 30 min < watermark 10:50) -> emitted by timeout
    got2 = _run_cycle(spark, build, incoming, checkpoint, [
        _page("a.com", datetime(2024, 1, 1, 11, 0, 0)),
    ], 2)
    sess = {(r["host"], r["session_start"]): (r["session_end"], r["n_pages"])
            for r in got2}
    assert sess == {
        ("a.com", h(0)): (h(5), 2),
        ("b.com", h(0)): (h(0), 1),
    }

    # cycle 3: advancer pushes the watermark past a's open-session
    # timeout (11:30) -> the last session flushes with the right span
    got3 = _run_cycle(spark, build, incoming, checkpoint, [
        _page("c.com", datetime(2024, 1, 1, 12, 0, 0)),
    ], 3)
    sess3 = {(r["host"], r["session_start"]): r["n_pages"] for r in got3}
    assert sess3 == {("a.com", datetime(2024, 1, 1, 11, 0, 0)): 1}


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


def test_trending_terms_windowed_counts_and_min_count(spark, tmp_path):
    from document_retrieval_system_spark.streaming.monitor import (
        trending_terms,
    )

    incoming = str(tmp_path / "tin")
    checkpoint = str(tmp_path / "tckpt")
    os.makedirs(incoming)
    t = lambda m, s: datetime(2024, 1, 1, 10, m, s)  # noqa: E731
    build = lambda st: trending_terms(st, "1 minute", "2 minutes", 2)  # noqa: E731

    def page(ts, text):
        return (f"https://a.com/{ts.second}", ts, b"", text, "en")

    # cycle 1: window 10:00 sees 'data' x3 pages, 'spark' x2, 'rare' x1;
    # no window can emit yet
    got1 = _run_cycle(spark, build, incoming, checkpoint, [
        page(t(0, 5), "data spark"), page(t(0, 15), "data spark"),
        page(t(0, 25), "data rare"),
    ], 0)
    assert got1 == []

    # cycle 2: advancer far ahead -> watermark passes 10:01, the window
    # emits once; 'rare' (count 1) is suppressed by min_count
    got2 = _run_cycle(spark, build, incoming, checkpoint, [
        page(t(10, 0), "later page"),
    ], 1)
    emitted = {(r["term"], r["n"]) for r in got2
               if r["win_start"] == t(0, 0)}
    assert emitted == {("data", 3), ("spark", 2)}

    # cycle 3: a too-late arrival for the closed window is dropped
    got3 = _run_cycle(spark, build, incoming, checkpoint, [
        page(t(0, 45), "data data"),
    ], 2)
    assert all(r["win_start"] != t(0, 0) for r in got3)

    # batch equivalence: the same function over a batch frame counts
    # everything (watermark is a no-op)
    batch = spark.createDataFrame(
        [page(t(0, 5), "data spark"), page(t(0, 15), "data spark"),
         page(t(0, 25), "data rare")], PAGES_DDL)
    rows = {(r["term"], r["n"]) for r in
            trending_terms(batch, "1 minute", "2 minutes", 2).collect()}
    assert rows == {("data", 3), ("spark", 2)}
