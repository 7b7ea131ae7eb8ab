"""Batch sessionization and multi-granularity rollups over event streams.

A crawl/search deployment emits an event log (the ``events`` table
here: clicks, views, queries per user with timestamps and values).
Two canonical batch analytics shapes over such a log:

- ``sessionize``: gap-based sessions — a new session starts whenever a
  user's inter-event gap exceeds ``gap_us`` microseconds.  This is the
  batch twin of ``streaming/monitor.sessionize_hosts`` (which computes
  the same sessions incrementally with ``applyInPandasWithState``):
  one window partitioned by user and ordered by (ts, event_id), a lag
  to flag session starts, a running sum to number sessions, then one
  aggregation per session.  No Python, no collect.

- ``event_rollup``: counts / distinct users / value sums at
  (event_type, day), (event_type,) and grand-total granularities in
  ONE pass via ``rollup`` — Spark expands the grouping sets inside a
  single shuffle (Expand + one hash aggregate), the plan a 100 TB
  hypertable rollup wants.  Value sums are kept exact by summing
  integer cents (``round(value * 100)``) instead of doubles, so the
  output hashes bit-identically across engines and cluster sizes
  (double summation order is nondeterministic under parallelism).

Exactness: all timestamp arithmetic is in epoch-microsecond LONGs
supplied by the caller — ``unix_timestamp`` truncates sub-seconds and
would silently merge events within the same second, and tz-naive
micros conversions shift with the session timezone (see
``entry_queries._ntz_micros``).  The operator never touches a
timestamp type.

Scale notes: sessionization at 100 TB is one shuffle on the user key;
a skewed user (a bot with millions of events) stays within one
partition but both window functions are streaming frames (running
lag/sum, no buffering), and the per-session aggregate reuses the same
hash partitioning — (user, session_no) groups are co-located under a
user-keyed exchange, so Catalyst plans exactly ONE Exchange for the
whole pipeline (pinned in tests/test_sessions.py).  Determinism: the
order within a user is total — (us, event_id) — so session numbering
is reproducible across engines and parallelism levels.

Reference anchor: the reference has no event-analytics path (its
``events`` usage is limited to search-time sorting,
search_engine.py:425ff); these operators extend the engine the way
its corpus statistics (I4) extend per-document stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_us: int,
               user_col: str = "user_id", us_col: str = "us",
               id_col: str = "event_id") -> DataFrame:
    """Assign gap-based sessions; one output row per session.

    ``events`` must carry a LONG epoch-micros column ``us_col`` (exact;
    see module docstring) and a tie-breaking id column.  Output:
    (user, session_no, n_events, start_us, end_us, duration_us), with
    ``session_no`` numbered 1.. per user in (us, id) order — all LONGs,
    so the result hashes exactly across engines.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(us_col).asc(), F.col(id_col).asc())
    ev = (
        events.select(user_col, us_col, id_col)
        .withColumn("_prev_us", F.lag(us_col).over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev_us").isNull()
                | (F.col(us_col) - F.col("_prev_us") > F.lit(gap_us)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_no",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        ev.groupBy(F.col(user_col), F.col("session_no").cast("long").alias("session_no"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(us_col).cast("long").alias("start_us"),
            F.max(us_col).cast("long").alias("end_us"),
        )
        .withColumn("duration_us",
                    (F.col("end_us") - F.col("start_us")).cast("long"))
    )


def event_rollup(events: DataFrame, type_col: str = "event_type",
                 ts_col: str = "ts", value_col: str = "value",
                 user_col: str = "user_id") -> DataFrame:
    """One-pass (type, day) / (type,) / () rollup over an event log.

    Output: (event_type, day, gid, n_events, n_users, sum_cents) where
    the rolled-up rows carry NULL in the aggregated dimension and
    ``gid`` is the standard grouping id (0 = leaf, 1 = per-type,
    3 = grand total — same bit convention as ANSI ``GROUPING()``).
    ``n_users`` is exact distinct (swap in an approximate sketch at
    scales where exactness stops paying for its shuffle); ``sum_cents``
    sums ``round(value * 100)`` as LONG so the total is order-independent
    and engine-exact.
    """
    base = events.select(
        F.col(type_col).alias("event_type"),
        F.to_date(ts_col).cast("string").alias("day"),
        F.col(user_col).alias("_user"),
        F.round(F.col(value_col) * 100).cast("long").alias("_cents"),
    )
    return (
        base.rollup("event_type", "day")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("_user").cast("long").alias("n_users"),
            F.sum("_cents").cast("long").alias("sum_cents"),
        )
        .select("event_type", "day", "gid", "n_events", "n_users",
                "sum_cents")
    )
