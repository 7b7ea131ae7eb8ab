"""As-of join (operators/asof.py): hand-derived matches, at-or-before
inclusion, left-join nulls, and carried-row consistency when some right
columns are null."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.asof import asof_join


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_hand_cases(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(5)), (2, 1, _t(10)), (3, 1, _t(15)), (4, 1, _t(25)),
         (5, 2, _t(30))],
        "click_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, _t(10), 1.5), (200, 1, _t(20), 2.5)],
        "view_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["click_id"]: (r["view_id_r"], r["value_r"])
        for r in asof_join(left, right, key="user_id",
                           right_cols=["view_id", "value"]).collect()
    }
    assert out == {
        1: (None, None),      # before any view
        2: (100, 1.5),        # equal ts -> at-or-before includes it
        3: (100, 1.5),
        4: (200, 2.5),
        5: (None, None),      # other user has no views
    }


def test_asof_join_carries_consistent_row(spark):
    """The matched right row is carried as ONE struct: a null value in
    the latest row must come through as null, never backfilled from an
    older row's non-null value."""
    left = spark.createDataFrame(
        [(1, 1, _t(12))], "click_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(99, 1, _t(5), 7.0), (100, 1, _t(10), None)],
        "view_id long, user_id long, ts timestamp, value double",
    )
    r = asof_join(left, right, key="user_id",
                  right_cols=["view_id", "value"]).collect()[0]
    assert r["view_id_r"] == 100 and r["value_r"] is None


def test_asof_join_single_shuffle(spark):
    """Plan shape: one Exchange (the window partition), no join node."""
    left = spark.createDataFrame(
        [(1, 1, _t(5))], "click_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(9, 1, _t(1), 1.0)],
        "view_id long, user_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, key="user_id", right_cols=["view_id", "value"])
    from document_retrieval_system_spark.plans.explain import formatted_plan

    import re

    plan = formatted_plan(out)
    # formatted plans list a node in the tree ("Exchange (4)") and again
    # in the details section ("(4) Exchange") — count tree nodes only
    assert len(re.findall(r"Exchange \(\d+\)", plan)) == 1, plan
    assert "Join" not in plan


def test_asof_join_null_ts_right_rows_never_match(spark):
    """A right row with NULL timestamp can never satisfy ts <= left.ts
    (review finding: under nulls-first window ordering it acted as a
    matches-everything floor)."""
    left = spark.createDataFrame(
        [(1, 1, _t(5))], "click_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 1, None, 9.0), (99, 1, _t(2), 7.0)],
        "view_id long, user_id long, ts timestamp, value double",
    )
    r = asof_join(left, right, key="user_id",
                  right_cols=["view_id", "value"]).collect()[0]
    assert r["view_id_r"] == 99 and r["value_r"] == 7.0


def test_asof_join_rejects_colliding_left_columns(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, 1, _t(5), 0.0)],
        "click_id long, user_id long, ts timestamp, value_r double",
    )
    right = spark.createDataFrame(
        [(9, 1, _t(1), 1.0)],
        "view_id long, user_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, key="user_id", right_cols=["view_id", "value"])
