"""KMV (K-minimum-values) distinct-count sketch.

The exact-distinct slots in this engine (`event_rollup.n_users`,
I3/I4 vocabulary stats) pay a full shuffle of every distinct key.  At
100 TB the standard replacement is a bottom-k sketch: keep the K
smallest values of a uniform hash per group; if the group holds fewer
than K distinct values the sketch IS the exact answer, otherwise the
K-th smallest order statistic estimates the distinct count as

    estimate = (K - 1) * H / h_(K)

for hashes uniform on [0, H) (Bar-Yossef et al. 2002, the KMV/bottom-k
estimator; the Beyer et al. 2007 unbiased form).  Everything here is
DETERMINISTIC — the hash is a truncated md5, not a seeded RNG — so the
same input yields the same sketch on any engine, any cluster size, any
partitioning: the estimate itself is oracle-hashable, which is the
repo's bar for a first-class operator.

The sketch is mergeable (union of bottom-k sets, re-truncated to k),
which is what makes it the 100 TB shape: partial per-partition sketches
combine associatively, so a map-side combine collapses each partition
to ≤K rows per group before the shuffle.  This implementation keeps the
relational form (dedupe → per-group bottom-k via one window) — the
rows that cross the shuffle are (group, hash48) pairs, 16 B each, and
the arithmetic stays in exact LONGs end-to-end (no float division:
the estimate is an integer floor-div, so it hashes bit-identically).

Hash parity with DuckDB (proven pattern, see operators/dedup.py):
Spark ``conv(substring(md5(x), 1, 12), 16, 10).cast('long')`` ==
DuckDB ``('0x' || substr(md5(x), 1, 12))::BIGINT`` — 48 uniform bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 48


def _hash48(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_distinct(df: DataFrame, group_cols, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group KMV distinct estimate: (*groups, n_kept, kmv_distinct).

    ``n_kept`` is the sketch fill (< k ⇒ the group had fewer than k
    distinct values and the estimate is exact by construction).  The
    estimate is an exact integer: ``(k-1) * 2^48 DIV h_k`` — LONG-safe
    for k ≤ 32767.
    """
    if not 2 <= k <= 32767:
        raise ValueError(f"k must be in [2, 32767], got {k}")
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    hashed = (
        df.select(*group_cols, _hash48(F.col(value_col)).alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.lit(1))  # dedupe distinct (group, hash) pairs
        .select(*group_cols, "h")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    bottom = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return (
        bottom.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("h").alias("_hk"),
        )
        .withColumn(
            "kmv_distinct",
            F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
                F.expr(f"({k} - 1) * {HASH_SPACE}L div _hk")
            ),
        )
        .select(*group_cols, "n_kept", "kmv_distinct")
    )


def cms_counters(items: DataFrame, term_col: str = "term",
                 depth: int = 3, width: int = 1024) -> DataFrame:
    """Count-min sketch counters (Cormode & Muthukrishnan 2005) over an
    item stream: ``depth`` independent hash rows of ``width`` LONG
    counters, returned relationally as (r, bucket, c) — at most
    depth*width rows regardless of input volume, built by ONE hash
    aggregate with map-side combine.  Deterministic like every sketch
    here: row r's hash is the truncated md5 of ``"r:item"``, so the
    counters (and any estimate read off them) are bit-identical across
    engines, cluster sizes and partitionings.

    The counters are mergeable by cellwise addition (sum over (r,
    bucket)) — the property that lets 1000 executors sketch 100 TB
    independently and combine in one tiny reduce.

    r6 shape: occurrences are counted per DISTINCT item first (one
    map-side-combined groupBy), and the ``depth`` md5 probes run once
    per distinct item instead of once per occurrence — on a Zipfian
    stream that is orders of magnitude fewer digests for the identical
    integer counters (sum of per-item counts per cell == count of
    occurrences per cell)."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    per_item = (
        items.select(F.col(term_col).alias("_t"))
        .groupBy("_t")
        .agg(F.count("*").cast("long").alias("_n"))
    )
    return (
        per_item.select("_t", "_n", rows)
        .select(
            "r", "_n",
            (_hash48(F.concat(F.col("r").cast("string"), F.lit(":"),
                              F.col("_t"))) % width).alias("bucket"),
        )
        .groupBy("r", "bucket")
        .agg(F.sum("_n").cast("long").alias("c"))
    )


def cms_point_estimates(counters: DataFrame, terms: DataFrame,
                        term_col: str = "term",
                        depth: int = 3, width: int = 1024) -> DataFrame:
    """Point-query the sketch for each term in ``terms``: the CMS
    estimate is min over rows of that row's counter — always >= the
    true count (one-sided error; ties with it when no collision).
    The probe set x depth cross join is tiny and broadcast against the
    <= depth*width counter cells; a term whose cell was never touched
    reads 0 (it never occurred)."""
    probes = (
        terms.select(F.col(term_col).alias("term")).distinct()
        .select("term",
                F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"))
        .select(
            "term", "r",
            (_hash48(F.concat(F.col("r").cast("string"), F.lit(":"),
                              F.col("term"))) % width).alias("bucket"),
        )
    )
    return (
        probes.join(counters, ["r", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long")
             .alias("cms_cf"))
    )
