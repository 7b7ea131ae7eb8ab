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


def label_sessions(events: DataFrame, gap_us: int,
                   user_col: str = "user_id", us_col: str = "us",
                   id_col: str = "event_id") -> DataFrame:
    """Tag every event with its gap-based ``session_no`` (1.. per user
    in (us, id) order), keeping all input columns.  The building block
    under ``sessionize`` and ``funnel_counts``."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(us_col).asc(), F.col(id_col).asc())
    return (
        events
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
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .drop("_prev_us", "_new")
    )


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
    ev = label_sessions(events.select(user_col, us_col, id_col), gap_us,
                        user_col=user_col, us_col=us_col, id_col=id_col)
    return (
        ev.groupBy(F.col(user_col), F.col("session_no"))
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


def funnel_counts(events: DataFrame, steps, gap_us: int,
                  user_col: str = "user_id", us_col: str = "us",
                  id_col: str = "event_id",
                  type_col: str = "event_type") -> DataFrame:
    """Strict sequential funnel over gap-based sessions: how many
    sessions reach step 1, step 2 after step 1, ... — each step's event
    must occur strictly AFTER the previous step's earliest qualifying
    event (the classic product-analytics funnel, evaluated exactly).

    Output: (step, event_type, n_sessions, frac) where ``frac`` is the
    step's session count over step 1's.  The step chain is evaluated as
    |steps| per-session min-aggregations, all sharing the (user,
    session_no) clustering of the labeling window — at 100 TB this is
    the one user-keyed shuffle plus |steps| co-partitioned aggregates,
    never an events×events self-join.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    lab = label_sessions(
        events.select(user_col, us_col, id_col, type_col), gap_us,
        user_col=user_col, us_col=us_col, id_col=id_col)
    key = [user_col, "session_no"]
    step_counts = []
    prev = None
    for i, st in enumerate(steps):
        cur = lab.filter(F.col(type_col) == st)
        if prev is not None:
            cur = cur.join(prev, key).filter(F.col(us_col) > F.col(f"_t{i - 1}"))
        reached = cur.groupBy(*key).agg(F.min(us_col).alias(f"_t{i}"))
        step_counts.append(
            reached.agg(F.count("*").cast("long").alias("n_sessions"))
            .select(F.lit(i + 1).cast("long").alias("step"),
                    F.lit(st).alias("event_type"), "n_sessions")
        )
        prev = reached
    out = step_counts[0]
    for df in step_counts[1:]:
        out = out.unionByName(df)
    first = out.filter(F.col("step") == 1).select(
        F.col("n_sessions").alias("_n1"))
    return out.crossJoin(first).select(
        "step", "event_type", "n_sessions",
        F.round(F.col("n_sessions") / F.col("_n1"), 6).alias("frac"),
    )


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    are cohorted by the ISO week of their FIRST event; each cell
    (cohort_week, week_offset) counts the cohort's users active in
    that later week.

    Exactness discipline: both the cohort and the activity timestamp
    truncate to Monday week starts, so the offset is an EXACT integer
    (datediff is a multiple of 7 by construction — integer div, no
    float date math).  n_users needs no countDistinct: the activity
    rows are pre-distinct on (user, week) and a user has exactly one
    cohort, so count(*) per cell is the distinct user count.

    Scale shape: one distinct on (user, week) — the only corpus-sized
    shuffle, map-side-combining; the per-user cohort table joins on
    the user key it was grouped by; the final cell agg is tiny
    (weeks x offsets)."""
    wk = F.date_trunc("week", F.col(ts_col))
    act = events.select(F.col(user_col).alias("u"),
                        wk.alias("wk")).distinct()
    first = act.groupBy("u").agg(F.min("wk").alias("cohort"))
    return (
        act.join(first, "u")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("datediff(wk, cohort) div 7").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def group_quantiles(df: DataFrame, group_col: str, value_col: str,
                    qs=(0.5, 0.95, 0.99)) -> DataFrame:
    """Exact per-group quantiles by the nearest-rank definition: the
    value at rank ``ceil(q * n)`` of the group's ascending sort — a
    member of the data, no interpolation, so the result is engine-exact
    (Spark's ``percentile_approx`` is neither exact nor portable).

    Output: (group, q, value).  One sort per group partition serves all
    quantiles (the rank join is against a literal q-table).  Exact
    quantiles at 100 TB cost a per-group sort — that is the honest
    price of exactness; when an approximation is acceptable the KMV
    pattern (operators/sketch.py) extends to rank sketches.
    """
    qs = sorted(set(float(q) for q in qs))
    if not qs or qs[0] <= 0 or qs[-1] > 1:
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(group_col, value_col).withColumn(
        "_rn", F.row_number().over(w)
    ).withColumn("_n", F.count("*").over(Window.partitionBy(group_col)))
    qdf = ranked.sparkSession.createDataFrame(
        [(q,) for q in qs], "q double")
    return (
        ranked.crossJoin(F.broadcast(qdf))
        .filter(F.col("_rn") == F.ceil(F.col("q") * F.col("_n")))
        .select(group_col, "q", F.col(value_col).alias("value"))
    )


def resample_counts(events: DataFrame, bucket_us: int,
                    type_col: str = "event_type",
                    us_col: str = "us") -> DataFrame:
    """Fixed-width time-bucket counts with gap filling (hypertable
    resample): per (type, bucket) event counts, INCLUDING zero rows for
    empty buckets between each type's first and last event — the shape
    a downstream rate monitor or anomaly detector needs (a missing
    bucket and a zero bucket mean different things only if zeros are
    materialized).

    Bucket index is exact LONG floor division (``(us - pmod(us, W)) / W``
    — correct at negative timestamps too, unlike ``div``'s
    truncate-toward-zero).  The dense axis comes from one
    ``sequence(min, max)`` per type: its size is the time span over the
    bucket width — independent of event volume, so the gap-fill join is
    a broadcast against a tiny axis even at 100 TB of events.  Output:
    (type, bucket, n_events), all exact.
    """
    b = F.expr(
        f"({us_col} - ((({us_col} % {bucket_us}) + {bucket_us})"
        f" % {bucket_us})) div {bucket_us}"
    )
    counts = (
        events.select(F.col(type_col).alias("event_type"),
                      b.cast("long").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").cast("long").alias("_n"))
    )
    axis = (
        counts.groupBy("event_type")
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select("event_type",
                F.explode(F.sequence("_mn", "_mx")).alias("bucket"))
    )
    return (
        axis.join(counts, ["event_type", "bucket"], "left")
        .select("event_type", "bucket",
                F.coalesce(F.col("_n"), F.lit(0)).cast("long")
                .alias("n_events"))
    )


def anomaly_buckets(events: DataFrame, bucket_us: int, z_threshold: float,
                    type_col: str = "event_type",
                    us_col: str = "us") -> DataFrame:
    """Volume-anomaly detection over the event log: buckets whose count
    deviates from their type's mean by ``z_threshold`` standard
    deviations or more — the alerting query a crawl/search operations
    deployment runs over its own telemetry (traffic spikes, outage
    troughs; the gap-filled zeros from ``resample_counts`` are what
    make a dead hour DETECTABLE rather than merely absent).

    Exactness contract: the per-type moments are LONG sums (n buckets,
    Σc, Σc²) — exact integers — and z is ONE fixed double expression
    over them, ``(c - S/n) / sqrt((SS - S*S/n) / (n-1))``.  IEEE 754
    division and sqrt are correctly rounded, so identical integer
    inputs give bit-identical z on every engine and cluster size; the
    threshold compares the unrounded z, the output rounds to 6 dp.
    Degenerate groups (one bucket, or zero variance, where z is
    NaN/±inf — and NaN orders ABOVE thresholds on some engines) are
    excluded by an exact integer predicate ``SS*n > S*S``, never by a
    float comparison.  LONG headroom: SS*n overflows only past ~3e9
    events per type per bucket-width — document-scale, not event-scale.

    Scale shape: one (type, bucket) hash aggregate over the events →
    tiny per-type moment rows broadcast back onto the dense axis.  No
    window over the raw events, no second pass.
    """
    dense = resample_counts(events, bucket_us, type_col=type_col,
                            us_col=us_col)
    s = dense.groupBy("event_type").agg(
        F.count("*").cast("long").alias("_nb"),
        F.sum("n_events").cast("long").alias("_sx"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("_sxx"),
    )
    nb = F.col("_nb").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    c = F.col("n_events").cast("double")
    z = (c - sx / nb) / F.sqrt((sxx - sx * sx / nb) / (nb - 1))
    return (
        dense.join(F.broadcast(s), "event_type")
        .filter((F.col("_nb") > 1)
                & (F.col("_sxx") * F.col("_nb") > F.col("_sx") * F.col("_sx")))
        .withColumn("_z", z)
        .filter(F.abs(F.col("_z")) >= z_threshold)
        .select("event_type", "bucket", "n_events",
                F.round("_z", 6).alias("z"))
    )
