"""KMV distinct sketch (operators/sketch.py): exact-below-k guarantee,
estimator accuracy, multiset/partitioning invariance."""

from __future__ import annotations


def test_kmv_exact_below_k(spark):
    """A group with fewer than k distinct values is answered exactly."""
    from document_retrieval_system_spark.operators.sketch import kmv_distinct

    rows = [("a", v % 10) for v in range(200)] + [("b", v) for v in range(3)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {(r["g"], r["n_kept"], r["kmv_distinct"])
           for r in kmv_distinct(df, "g", "v", k=32).collect()}
    assert got == {("a", 10, 10), ("b", 3, 3)}


def test_kmv_estimator_accuracy(spark):
    """Above k the estimate lands near truth: k=64 has relative standard
    error ~1/sqrt(k-2) ≈ 13%; assert within 3 RSE on a fixed corpus
    (deterministic — this is a pinned value, not a flaky bound)."""
    from document_retrieval_system_spark.operators.sketch import kmv_distinct

    n = 5000
    df = spark.createDataFrame(
        [("g", f"user-{v}") for v in range(n)], "g string, v string")
    [row] = kmv_distinct(df, "g", "v", k=64).collect()
    assert row["n_kept"] == 64
    assert abs(row["kmv_distinct"] - n) / n < 0.4
    # pin the exact deterministic output so any hash-function or
    # arithmetic change is visible
    assert row["kmv_distinct"] == 5255


def test_kmv_multiset_and_partitioning_invariance(spark):
    """Duplicates never change the sketch, and neither does the input
    partitioning (the determinism that makes the estimate oracle-hashable)."""
    from document_retrieval_system_spark.operators.sketch import kmv_distinct

    base = [("g", v // 3) for v in range(900)]
    a = spark.createDataFrame(base, "g string, v long")
    b = spark.createDataFrame(base * 3, "g string, v long").repartition(13)
    ra = {tuple(r) for r in kmv_distinct(a, "g", "v", k=48).collect()}
    rb = {tuple(r) for r in kmv_distinct(b, "g", "v", k=48).collect()}
    assert ra == rb


def test_kmv_k_validation(spark):
    import pytest

    from document_retrieval_system_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(ValueError):
        kmv_distinct(df, "g", "v", k=1)
    with pytest.raises(ValueError):
        kmv_distinct(df, "g", "v", k=40000)


def test_cms_one_sided_error_and_merge(spark):
    """CMS estimates never undercount; exact when width is generous;
    counters built over split halves merge cellwise to the full-stream
    counters."""
    import random

    from pyspark.sql import functions as F

    from document_retrieval_system_spark.operators.sketch import (
        cms_counters,
        cms_point_estimates,
    )

    rng = random.Random(3)
    items = [f"t{rng.randrange(40)}" for _ in range(3000)]
    truth = {}
    for t in items:
        truth[t] = truth.get(t, 0) + 1
    df = spark.createDataFrame([(t,) for t in items], "term string")

    for depth, width in [(3, 8), (4, 4096)]:
        counters = cms_counters(df, depth=depth, width=width)
        est = {
            r["term"]: r["cms_cf"]
            for r in cms_point_estimates(
                counters, df, depth=depth, width=width
            ).collect()
        }
        assert set(est) == set(truth)
        assert all(est[t] >= c for t, c in truth.items())
        if width == 4096:  # 40 terms in 4096 buckets: no collisions
            assert est == truth

    # mergeability: sketch(A) + sketch(B) == sketch(A ++ B), cellwise
    # (halves split by term hash so multiplicities stay intact)
    cond = (F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("long") % 2) == 0
    ca = cms_counters(df.filter(cond), depth=3, width=8)
    cb = cms_counters(df.filter(~cond), depth=3, width=8)
    merged = (
        ca.union(cb).groupBy("r", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    full = cms_counters(df, depth=3, width=8)
    key = lambda rows: sorted((r["r"], r["bucket"], r["c"]) for r in rows)  # noqa: E731
    assert key(merged.collect()) == key(full.collect())

    # a never-seen term reads 0 only if its cells are empty; on a dense
    # sketch it reads the colliding mass — still one-sided
    probe = spark.createDataFrame([("unseen-term",)], "term string")
    got = cms_point_estimates(
        cms_counters(df, depth=3, width=4096), probe, depth=3, width=4096
    ).collect()
    assert got[0]["cms_cf"] == 0
