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
