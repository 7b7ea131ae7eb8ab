"""Streaming crawl monitoring: event-time windowed aggregation with
watermarked late-data handling, plus a stateful per-host sessionizer.

The ingest path (`incremental.py`) is foreachBatch micro-batching; this
module is the OTHER Structured Streaming contract a crawl pipeline
needs — continuous observability over the page stream itself:

- `crawl_rate` — tumbling event-time windows over ``warc_ts`` per host,
  bounded by a watermark so state for old windows is dropped and
  too-late arrivals are discarded (exactly the 100 TB concern: without
  the watermark, per-window state grows without bound on an unbounded
  crawl).  The same function works on a batch DataFrame (where the
  watermark is a no-op) — one code path, testable both ways.
- `sessionize_hosts` — custom stateful operator via
  ``applyInPandasWithState``: groups a host's page timestamps into
  crawl sessions split at `gap` minutes of silence, emitting closed
  sessions as state times out.  This is the pattern for any
  reference-free stateful stream logic the built-in window operators
  can't express.

Reference parity note: the reference engine is batch-only (no streaming
surface); these operators back the SURVEY §2.7 streaming mandate's
monitoring leg.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/?#]+)"


def crawl_rate(pages: DataFrame, window: str = "1 minute",
               watermark: str = "2 minutes") -> DataFrame:
    """Per-(window, host) page counts + byte volume over event time.

    On a streaming DataFrame the watermark bounds aggregation state and
    drops events later than `watermark` behind the max seen event time;
    in append output mode a window emits exactly once, when the
    watermark passes its end.  On a batch DataFrame the same plan runs
    with the watermark ignored (Spark semantics), so batch backfill and
    the live stream share one definition of the metric."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("win"),
            F.regexp_extract(F.col("url"), HOST_RE, 1).alias("host"),
        )
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.octet_length(F.coalesce(F.col("html"), F.lit(b"")))).alias("html_bytes"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host", "n_pages", "html_bytes",
        )
    )


SESSION_SCHEMA = (
    "host string, session_start timestamp, session_end timestamp, n_pages long"
)
_STATE_SCHEMA = "start_us long, last_us long, n long"


def _sessionize_fn(gap_minutes: int):
    gap_us = gap_minutes * 60_000_000

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        host = key[0]
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"host": [host],
                 "session_start": [pd.Timestamp(start_us, unit="us")],
                 "session_end": [pd.Timestamp(last_us, unit="us")],
                 "n_pages": [n]}
            )
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["warc_ts"]))
        ts.sort()
        if not ts:
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts[0], ts[0], 0
        out = []
        for t in ts:
            if t - last_us > gap_us:
                out.append((host, start_us, last_us, n))
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + gap_minutes * 60_000)
        if out:
            yield pd.DataFrame(
                {"host": [o[0] for o in out],
                 "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                 "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                 "n_pages": [o[3] for o in out]}
            )

    return fn


def sessionize_hosts(pages: DataFrame, gap_minutes: int = 30,
                     watermark: str = "10 minutes") -> DataFrame:
    """Stateful sessionization: one state row per host (first/last event
    time + count); a batch's timestamps extend or split the open
    session, closed sessions emit immediately, and the open session
    emits when the host goes quiet for `gap_minutes` (event-time
    timeout driven by the watermark).  State is O(active hosts) — the
    watermark is what keeps it from growing with stream length."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .select(F.regexp_extract(F.col("url"), HOST_RE, 1).alias("host"), "warc_ts")
        .groupBy("host")
        .applyInPandasWithState(
            _sessionize_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def trending_terms(pages: DataFrame, window: str = "1 minute",
                   watermark: str = "2 minutes",
                   min_count: int = 2) -> DataFrame:
    """Windowed term-frequency trending over the page stream: per
    event-time window, each token's page-stream count — the live
    "what is the crawl seeing" feed (query-log trending uses the same
    plan over a query stream).

    One explode + one windowed count.  The watermark bounds state to
    the active windows' vocabulary: closed windows emit once (append
    mode) and their per-term state is dropped, so an unbounded stream
    holds state only for |active windows| x |window vocabulary| keys.
    ``min_count`` suppresses the singleton tail — on webtext the term
    histogram is Zipfian, so the tail dominates row count but never
    trends.  Top-k per window is a batch-side rank over this output
    (streaming sinks see the counts; rank is the reader's cheap step),
    keeping the streaming agg a pure mergeable count.

    Batch DataFrames run the same plan (watermark ignored) — backfill
    and live trending share one definition."""
    from document_retrieval_system_spark.operators.textstats import (
        simple_tokens,
    )

    toks = simple_tokens(F.coalesce(F.col("text"), F.lit("")))
    return (
        pages.withWatermark("warc_ts", watermark)
        .select("warc_ts", F.explode(toks).alias("term"))
        .groupBy(F.window("warc_ts", window).alias("win"), "term")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= F.lit(min_count))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "term", "n",
        )
    )
