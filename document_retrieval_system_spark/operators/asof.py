"""As-of join: for each left row, the latest right row with
right.ts <= left.ts, per key — the canonical temporal operator Spark's
DataFrame API lacks (quotes-to-trades, config-at-time, last-view-
before-click).

Implementation is the union-and-carry pattern, fully JVM-side:

1. tag both sides and union them; the right side's carried columns are
   packed into ONE struct (so a match is always a CONSISTENT right row
   — per-column ``last(ignoreNulls)`` could mix rows when some carried
   values are null);
2. one window per key ordered by (ts, side, right-row struct) with
   ``last(struct, ignoreNulls=True)`` over unbounded-preceding..current
   — each left row sees the most recent right row at-or-before it
   (right sorts before left at equal ts, so "at" is included; ties
   inside the right side resolve by struct field order — deterministic
   SPARK-side; native ASOF implementations may break such ties by
   physical row order, so dedup the right side on (key, ts) first when
   cross-engine reproducibility matters);
3. keep the left rows, unpack the struct.

Scale shape: ONE shuffle (the window partition by key) over
left+right — same cost as a sort-merge join, no range explosion, no
per-key driver loop.  Skewed keys behave exactly like any window
partition.

The DuckDB oracle uses DuckDB's NATIVE ``ASOF LEFT JOIN`` — a fully
independent implementation of the same semantics — so the hash check
is a cross-engine, cross-algorithm equivalence, not a transcription.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              suffix: str = "_r") -> DataFrame:
    """Left as-of join: every left row, annotated with `right_cols` from
    the latest right row whose timestamp is <= the left row's (same
    key); nulls when no such row."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    reserved = {"_side", "_ats", "_rrow", "_m"}
    clashes = (set(left.columns) & reserved) | (
        set(left.columns) & {c + suffix for c in right_cols}
    )
    if clashes:
        raise ValueError(f"asof_join: left columns collide with internal/"
                         f"output names: {sorted(clashes)}")
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_ats", F.col(left_ts)
    ).withColumn("_rrow", F.lit(None).cast(
        "struct<" + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in right_cols
        ) + ">"
    ))
    # a NULL-ts right row can never satisfy ts <= left.ts (SQL three-
    # valued logic; under nulls-first ordering it would instead become a
    # matches-everything floor for its key)
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key),
        F.col(right_ts).alias("_ats"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    ).withColumn("_side", F.lit(0))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc(),
                 F.col("_rrow").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_m", F.last(F.col("_rrow"), ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(c + suffix, F.col("_m." + c))
    return out.drop("_side", "_ats", "_rrow", "_m")
