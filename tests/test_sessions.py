"""Batch sessionization + event rollup (operators/sessions.py):
brute-force equivalence on random event logs, exact boundary
semantics, and the one-Exchange plan guarantee."""

from __future__ import annotations

import random
import re


def _brute_sessions(events, gap_us):
    """(user, us, event_id) rows -> {(user, session_no, n, start, end)}."""
    by_user = {}
    for (u, us, eid) in events:
        by_user.setdefault(u, []).append((us, eid))
    out = set()
    for u, evs in by_user.items():
        evs.sort()
        sno, n, start = 0, 0, None
        prev = None
        sessions = []
        for (us, _eid) in evs:
            if prev is None or us - prev > gap_us:
                if n:
                    sessions.append((sno, n, start, prev))
                sno, n, start = sno + 1, 0, us
            n += 1
            prev = us
        sessions.append((sno, n, start, prev))
        for (s, n, a, b) in sessions:
            out.add((u, s, n, a, b, b - a))
    return out


def test_sessionize_bruteforce(spark):
    from document_retrieval_system_spark.operators.sessions import sessionize

    rng = random.Random(11)
    rows = []
    t = 0
    for eid in range(400):
        t += rng.randint(0, 200)
        rows.append((rng.randint(0, 7), t, eid))
    df = spark.createDataFrame(rows, "user_id long, us long, event_id long")
    got = {tuple(r) for r in sessionize(df, gap_us=60).collect()}
    assert got == _brute_sessions(rows, 60)


def test_sessionize_boundary_and_ties(spark):
    """A gap of exactly gap_us does NOT split (strict >); simultaneous
    events (same us) never split regardless of id order."""
    from document_retrieval_system_spark.operators.sessions import sessionize

    rows = [
        (1, 0, 0), (1, 100, 1),            # exactly gap -> same session
        (1, 201, 2),                        # gap 101 > 100 -> new session
        (2, 50, 4), (2, 50, 3), (2, 50, 5)  # ties: one session of 3
    ]
    df = spark.createDataFrame(rows, "user_id long, us long, event_id long")
    got = {(r["user_id"], r["session_no"], r["n_events"]) for r in
           sessionize(df, gap_us=100).collect()}
    assert got == {(1, 1, 2), (1, 2, 1), (2, 1, 3)}


def test_sessionize_single_exchange(spark):
    """The user-key window and the (user, session_no) aggregate share
    one hash partitioning: exactly ONE Exchange in the whole plan."""
    from document_retrieval_system_spark.operators.sessions import sessionize
    from document_retrieval_system_spark.plans.explain import formatted_plan

    df = spark.createDataFrame(
        [(1, 10, 1)], "user_id long, us long, event_id long")
    plan = formatted_plan(sessionize(df, gap_us=60))
    # formatted_plan lists each node twice (tree + details): count the
    # details form '(N) Exchange' only.
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1


def test_event_rollup_exact(spark):
    from document_retrieval_system_spark.operators.sessions import event_rollup

    rows = [
        (0, "2024-01-01 00:00:00.000001", 1, "click", 1.25),
        (1, "2024-01-01 23:59:59.999999", 2, "click", 2.50),
        (2, "2024-01-02 00:00:00.000000", 1, "click", 0.10),
        (3, "2024-01-01 12:00:00.500000", 1, "view", 7.07),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr("event_id", "cast(ts as timestamp_ntz) ts", "user_id",
                 "event_type", "value")
    got = {tuple(r) for r in event_rollup(df).collect()}
    assert got == {
        ("click", "2024-01-01", 0, 2, 2, 375),
        ("click", "2024-01-02", 0, 1, 1, 10),
        ("view", "2024-01-01", 0, 1, 1, 707),
        ("click", None, 1, 3, 2, 385),
        ("view", None, 1, 1, 1, 707),
        (None, None, 3, 4, 2, 1092),
    }


def test_event_rollup_one_shuffle(spark):
    """All three granularities come from ONE grouping-sets pass: a
    single Expand node and no more Exchanges than a plain aggregate
    (partial + final around one shuffle; countDistinct adds its own
    expand-free second aggregate but no extra scan)."""
    from document_retrieval_system_spark.operators.sessions import event_rollup
    from document_retrieval_system_spark.plans.explain import formatted_plan

    df = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", 1, "click", 1.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).selectExpr("event_id", "cast(ts as timestamp_ntz) ts", "user_id",
                 "event_type", "value")
    plan = formatted_plan(event_rollup(df))
    assert len(re.findall(r"\(\d+\) Expand\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) Scan\b", plan)) <= 1


def test_resample_gapfill_and_negatives(spark):
    """Zero buckets materialize between each type's first and last
    event; bucket assignment floor-divides correctly below zero."""
    from document_retrieval_system_spark.operators.sessions import (
        resample_counts,
    )

    rows = [("a", 0), ("a", 5), ("a", 25),        # buckets 0, 0, 2 (gap at 1)
            ("b", -1), ("b", 11)]                 # buckets -1, 1 (gap at 0)
    df = spark.createDataFrame(rows, "event_type string, us long")
    got = {tuple(r) for r in resample_counts(df, bucket_us=10).collect()}
    assert got == {
        ("a", 0, 2), ("a", 1, 0), ("a", 2, 1),
        ("b", -1, 1), ("b", 0, 0), ("b", 1, 1),
    }


def test_funnel_strict_sequencing(spark):
    """Step k counts only when it occurs strictly AFTER the earliest
    qualifying step k-1 event of the SAME session."""
    from document_retrieval_system_spark.operators.sessions import (
        funnel_counts,
    )

    rows = [
        # user 1, one session: view(10) -> click(20) -> purchase(30): full
        (1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "purchase", 30),
        # user 2: click BEFORE the view -> stops at step 1
        (2, 4, "click", 10), (2, 5, "view", 20),
        # user 3: view and click in session 1, purchase in a LATER
        # session -> stops at step 2
        (3, 6, "view", 10), (3, 7, "click", 20), (3, 8, "purchase", 5000),
        # user 4: click simultaneous with view (strict > excludes it)
        (4, 9, "view", 10), (4, 10, "click", 10),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, us long")
    got = {r["step"]: (r["event_type"], r["n_sessions"], r["frac"])
           for r in funnel_counts(
               df, ["view", "click", "purchase"], gap_us=100).collect()}
    assert got == {
        1: ("view", 4, 1.0),
        2: ("click", 2, 0.5),
        3: ("purchase", 1, 0.25),
    }


def test_group_quantiles_nearest_rank(spark):
    from document_retrieval_system_spark.operators.sessions import (
        group_quantiles,
    )

    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 7.5)]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {(r["g"], r["q"]): r["value"]
           for r in group_quantiles(df, "g", "value",
                                    qs=(0.5, 0.95, 1.0)).collect()}
    # nearest rank: ceil(0.5*10)=5, ceil(0.95*10)=10, ceil(1.0*10)=10
    assert got == {("a", 0.5): 5.0, ("a", 0.95): 10.0, ("a", 1.0): 10.0,
                   ("b", 0.5): 7.5, ("b", 0.95): 7.5, ("b", 1.0): 7.5}


def test_group_quantiles_validation(spark):
    import pytest

    from document_retrieval_system_spark.operators.sessions import (
        group_quantiles,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, value double")
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "value", qs=(0.0,))
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "value", qs=(1.5,))


def test_zipf_fit_recovers_planted_slope(spark):
    """An exact power law cf = C * rank^s must fit slope == s, r2 == 1."""
    from document_retrieval_system_spark.operators.textstats import zipf_fit

    import math
    rows = [(f"t{r:03d}", int(round(1e6 * r ** -1.0))) for r in range(1, 101)]
    df = spark.createDataFrame(rows, "term string, cf long")
    [got] = zipf_fit(df).collect()
    assert got["n_terms"] == 100
    # integer rounding of cf perturbs the fit slightly
    assert abs(got["slope"] - (-1.0)) < 0.001
    assert got["r2"] > 0.999999

    flat = spark.createDataFrame(
        [(f"t{r}", 500) for r in range(1, 51)], "term string, cf long")
    [g2] = zipf_fit(flat).collect()
    assert g2["slope"] == 0.0  # constant frequency: flat curve


def test_heaps_fit_recovers_planted_growth(spark):
    """A corpus where every doc introduces exactly m brand-new terms has
    V(n) = m*n — an exact Heaps law with beta == 1; a fixed shared
    vocabulary saturates immediately: beta == 0."""
    from document_retrieval_system_spark.operators.textstats import heaps_fit

    m = 5
    rows = [(d, f"t{d:03d}_{j}") for d in range(16) for j in range(m)]
    df = spark.createDataFrame(rows, "doc_id long, term string")
    [got] = heaps_fit(df).collect()
    assert got["n_docs"] == 16
    assert got["vocab"] == 16 * m
    assert got["beta"] == 1.0          # exact fit: ln V = ln m + 1 * ln n
    assert got["r2"] == 1.0
    import math
    assert abs(got["ln_k"] - math.log(m)) < 1e-6

    flat = spark.createDataFrame(
        [(d, t) for d in range(16) for t in ("aa", "bb", "cc")],
        "doc_id long, term string")
    [g2] = heaps_fit(flat).collect()
    assert g2["vocab"] == 3
    assert g2["beta"] == 0.0           # vocabulary saturates at doc 1


def test_anomaly_buckets_planted_spike_and_trough(spark):
    """A flat signal with one planted spike and one dead (gap) hour:
    exactly those two buckets are flagged, zeros included via the dense
    axis; a single-bucket type and a zero-variance type are excluded by
    the integer degeneracy predicate, not by a NaN comparison."""
    from pyspark.sql import functions as F

    from document_retrieval_system_spark.operators.sessions import (
        anomaly_buckets,
    )

    W = 100
    rows = []
    # type 'a': 40 buckets of 10 events, bucket 7 spikes to 30, bucket
    # 23 has NO events at all (dead hour -> gap-filled zero)
    for b in range(40):
        if b == 23:
            continue
        n = 30 if b == 7 else 10
        rows += [("a", b * W + i % W) for i in range(n)]
    # type 'single': one bucket only (nb == 1, stddev undefined)
    rows += [("single", 5 * W + i) for i in range(4)]
    # type 'flat': identical count everywhere (variance == 0)
    for b in range(10):
        rows += [("flat", b * W + i) for i in range(3)]
    ev = spark.createDataFrame(rows, "event_type string, us long")

    out = anomaly_buckets(ev, bucket_us=W, z_threshold=2.0)
    got = {(r["event_type"], r["bucket"], r["n_events"]) for r in out.collect()}
    assert got == {("a", 7, 30), ("a", 23, 0)}
    zs = {r["bucket"]: r["z"] for r in out.collect()}
    assert zs[7] > 0 and zs[23] < 0

    # negative-timestamp buckets floor correctly (no truncate-toward-zero)
    neg = spark.createDataFrame(
        [("n", -1), ("n", -W)], "event_type string, us long"
    )
    from document_retrieval_system_spark.operators.sessions import (
        resample_counts,
    )
    bks = {r["bucket"]: r["n_events"]
           for r in resample_counts(neg, W).collect()}
    assert bks == {-1: 2}


def test_retention_cohorts_hand_log(spark):
    from datetime import datetime

    from document_retrieval_system_spark.operators.sessions import (
        retention_cohorts,
    )

    d = datetime
    rows = [
        # user 1: joins week of Jan 6 (Mon), active weeks 0, 1, 3
        (1, d(2025, 1, 7)), (1, d(2025, 1, 14)), (1, d(2025, 1, 29)),
        # user 2: same cohort, active week 0 only (twice in one week —
        # the distinct must count it once)
        (2, d(2025, 1, 8)), (2, d(2025, 1, 9)),
        # user 3: next cohort, weeks 0 and 1
        (3, d(2025, 1, 14)), (3, d(2025, 1, 20)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_cohorts(ev).collect()}
    assert got == {
        ("2025-01-06", 0): 2, ("2025-01-06", 1): 1, ("2025-01-06", 3): 1,
        ("2025-01-13", 0): 1, ("2025-01-13", 1): 1,
    }
