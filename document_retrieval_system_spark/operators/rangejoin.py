"""Binned range join: points-in-intervals without a nested-loop join.

Spark has no native range join — `a.ts BETWEEN b.start AND b.end`
alone plans as BroadcastNestedLoopJoin (O(n*m), a scale-killer).  The
standard fix, made into an operator: pick a bucket width W, explode
each interval into the W-buckets it covers, map each point to its one
bucket, equi-join on (key, bucket), and re-check the exact predicate.
Every matching pair meets in exactly the point's bucket, so no dedup
is needed; the join is an ordinary shuffled hash/sort-merge join whose
cost is linear in (points + interval-bucket spans + true matches).

W tunes the explode-vs-selectivity trade: spans/W bucket rows per
interval versus W-sized candidate neighborhoods per point.  Pick W
near the median interval length.

Reference parity note: the reference has no temporal/range operators;
this (with asof.py) backs the event-analytics leg of the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(intervals: DataFrame, points: DataFrame,
                        start_col: str, end_col: str, point_col: str,
                        key: str | None = None,
                        bucket_width: int = 3600) -> DataFrame:
    """Join every point row to every interval row with
    start <= point < end (half-open) and, when `key` is given, equal
    key.  `start_col`/`end_col`/`point_col` must be INTEGRAL (convert
    timestamps to epoch micros/seconds first) — fractional coordinates
    would truncate toward zero before bucketing (wrong bucket for
    negatives, silently dropped matches) and the half-open `end - 1`
    adjustment assumes unit granularity, so non-integer columns raise.
    Returns intervals-columns ++ points-columns for each match."""
    integral = {"tinyint", "smallint", "int", "bigint"}
    for df, col in ((intervals, start_col), (intervals, end_col),
                    (points, point_col)):
        dt = df.schema[col].dataType.simpleString()
        if dt not in integral:
            raise TypeError(
                f"interval_point_join: column {col!r} must be integral, "
                f"got {dt} — convert timestamps/floats to integer units first"
            )
    # Floor division in PURE LONG arithmetic: subtracting pmod makes the
    # numerator an exact multiple of W, then `div` (integral division)
    # yields the floor with no rounding.  A double division here would
    # lose integer exactness above 2^53 (epoch nanoseconds), silently
    # bucketing extreme coordinates wrong and dropping matches.
    W = int(bucket_width)

    def bucket_of(colsql: str):
        c = f"CAST({colsql} AS BIGINT)"
        return F.expr(f"({c} - pmod({c}, {W})) div {W}")

    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.when(
                F.col(start_col) < F.col(end_col),
                F.sequence(
                    bucket_of(f"`{start_col}`"),
                    bucket_of(f"(`{end_col}` - 1)"),
                ),
            ).otherwise(F.expr("array()").cast("array<long>"))
        ),
    )
    pt = points.withColumn("_b", bucket_of(f"`{point_col}`"))
    cond = [iv["_b"] == pt["_b"]]
    if key is not None:
        cond.append(iv[key] == pt[key])
    joined = iv.join(pt, cond[0] if len(cond) == 1 else cond[0] & cond[1])
    matched = joined.filter(
        (pt[point_col] >= iv[start_col]) & (pt[point_col] < iv[end_col])
    )
    out_cols = [iv[c] for c in intervals.columns] + [
        pt[c] for c in points.columns if c != key
    ]
    return matched.select(*out_cols)
