"""Binned range join (operators/rangejoin.py): brute-force equivalence
on random keyed intervals (including empty and negative-coordinate
ones) and the no-nested-loop plan guarantee."""

from __future__ import annotations

import random
import re


def test_interval_point_join_bruteforce(spark):
    from document_retrieval_system_spark.operators.rangejoin import (
        interval_point_join,
    )
    from document_retrieval_system_spark.plans.explain import formatted_plan

    rng = random.Random(5)
    ivals = []
    for i in range(120):
        s = rng.randint(-500, 500)
        ivals.append((i, rng.randint(0, 2), s, s + rng.randint(0, 300)))
    pts = [(j, rng.randint(0, 2), rng.randint(-600, 900)) for j in range(200)]
    iv = spark.createDataFrame(ivals, "ival_id long, k long, s long, e long")
    pt = spark.createDataFrame(pts, "pt_id long, k long, v long")
    out = interval_point_join(iv, pt, "s", "e", "v", key="k", bucket_width=97)
    got = {(r["ival_id"], r["pt_id"]) for r in out.collect()}
    want = {(i, j) for (i, k1, s, e) in ivals for (j, k2, v) in pts
            if k1 == k2 and s <= v < e}
    assert got == want
    # a match appears exactly once (bucketing introduces no duplicates)
    assert out.count() == len(got)
    plan = formatted_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan
    # the equi-join on (bucket, key) is a real join node
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


def test_interval_point_join_extreme_long_coordinates(spark):
    """Coordinates near 2^60 (epoch nanoseconds): bucket assignment must
    use exact LONG arithmetic — a double division loses integer
    exactness above 2^53 and silently drops matches."""
    from document_retrieval_system_spark.operators.rangejoin import (
        interval_point_join,
    )

    base = 1 << 60
    # adjacent odd/even coordinates around 2^60 are indistinguishable in
    # float64 (ulp at 2^60 is 256), so these matches are exactly the
    # ones a double-division bucketing would scramble
    ivals = [(i, base + 7 * i, base + 7 * i + 3) for i in range(200)]
    pts = [(j, base + j) for j in range(200 * 7)]
    iv = spark.createDataFrame(ivals, "ival_id long, s long, e long")
    pt = spark.createDataFrame(pts, "pt_id long, v long")
    out = interval_point_join(iv, pt, "s", "e", "v", bucket_width=5)
    got = {(r["ival_id"], r["pt_id"]) for r in out.collect()}
    want = {(i, j) for (i, s, e) in ivals for (j, v) in pts if s <= v < e}
    assert got == want and len(want) == 600
    # and the negative extreme buckets correctly too (floor, not trunc)
    neg = interval_point_join(
        spark.createDataFrame([(0, -base - 4, -base)], "ival_id long, s long, e long"),
        spark.createDataFrame([(0, -base - 4), (1, -base - 1), (2, -base)],
                              "pt_id long, v long"),
        "s", "e", "v", bucket_width=3)
    assert {r["pt_id"] for r in neg.collect()} == {0, 1}


def test_interval_point_join_rejects_fractional_columns(spark):
    """DOUBLE coordinates would truncate toward zero before bucketing
    (wrong bucket for negatives -> silently dropped matches) — the
    operator must refuse them."""
    import pytest

    from document_retrieval_system_spark.operators.rangejoin import (
        interval_point_join,
    )

    iv = spark.createDataFrame([(1, -10.5, -0.2)], "ival_id long, s double, e double")
    pt = spark.createDataFrame([(1, -0.4)], "pt_id long, v double")
    with pytest.raises(TypeError, match="integral"):
        interval_point_join(iv, pt, "s", "e", "v", bucket_width=3600)
