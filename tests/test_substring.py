"""Trigram-indexed substring search (operators/substring.py).

Brute-force equivalence on adversarial texts, the candidate-superset
guarantee, partition-pruning plan pins, and the short-pattern scan
fallback.
"""

import os

import pytest
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.substring import (
    bucket_of,
    build_trigram_index,
    pattern_trigrams,
    substring_candidates,
    substring_scan,
    substring_search,
)

TEXTS = [
    (0, "data stream processing over data streams"),
    (1, "the quick brown fox"),
    (2, "datadatadata"),                    # overlapping occurrences
    (3, "da"),                              # shorter than a trigram
    (4, ""),                                # empty
    (5, None),                              # NULL text
    (6, "ends with data"),                  # match at end boundary
    (7, "data at the start"),               # match at start boundary
    (8, "d a t a spread out"),              # trigrams absent
    (9, "DATA STREAM upper case"),          # case-sensitive: no match
    (10, "100% _special_ chars: a%b_c"),    # LIKE metacharacters literal
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("tgidx") / "trigrams")
    build_trigram_index(docs, path, n_buckets=8)
    return docs, path


def _brute(docs, pattern):
    out = {}
    for r in docs.collect():
        t = r.text or ""
        n = t.count(pattern)  # NOTE: non-overlapping count, same as replace
        if pattern in t:
            out[r.doc_id] = n
    return out


@pytest.mark.parametrize("pattern", [
    "data stream", "data", "quick brown", "a%b_c", "% _", "zzz",
    "ata", "d a t a",
])
def test_matches_brute_force(idx, spark, pattern):
    docs, path = idx
    got = {r.doc_id: r.n_occ
           for r in substring_search(spark, path, docs, pattern).collect()}
    assert got == _brute(docs, pattern)


def test_candidates_are_superset(idx, spark):
    docs, path = idx
    for pattern in ["data", "stream", "own fox", "ta "]:
        cand = {r.doc_id
                for r in substring_candidates(spark, path, pattern).collect()}
        true = set(_brute(docs, pattern))
        assert true <= cand


def test_short_pattern_routes_to_scan(idx, spark):
    docs, path = idx
    with pytest.raises(ValueError):
        substring_candidates(spark, path, "da")
    got = {r.doc_id: r.n_occ
           for r in substring_scan(docs, "da").collect()}
    assert got == _brute(docs, "da")
    with pytest.raises(ValueError):
        substring_scan(docs, "")


def test_bucket_twin_matches_engine(idx, spark):
    docs, path = idx
    rows = (
        spark.read.parquet(path)
        .select("tg", "bucket").distinct().collect()
    )
    assert rows
    for r in rows:
        assert bucket_of(r.tg, 8) == r.bucket


def test_partition_pruning_and_pushdown(idx, spark):
    _, path = idx
    plan = substring_candidates(spark, path, "data")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan
    # the bucket predicate must reach the scan's partition filters, not
    # sit in a post-scan Filter
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "bucket" in pf.group(1)
    assert "tg" in plan and "In(tg" in plan.replace("in(tg", "In(tg") \
        or "isin" in plan


def test_pattern_trigrams():
    assert pattern_trigrams("abcd") == ["abc", "bcd"]
    assert pattern_trigrams("aaaa") == ["aaa"]
    assert pattern_trigrams("abc") == ["abc"]


# --- regex (literal alternation) search -----------------------------------

from document_retrieval_system_spark.operators.substring import (  # noqa: E402
    alternation_literals,
    regex_candidates,
    regex_search,
)


def test_alternation_parse():
    assert alternation_literals("abc|def ghi") == ["abc", "def ghi"]
    assert alternation_literals("abc|abc|xyz") == ["abc", "xyz"]  # dedup
    with pytest.raises(ValueError):
        alternation_literals("ab|cde")          # alternative < 3 chars
    with pytest.raises(ValueError):
        alternation_literals("abc|d.f")         # metacharacter
    with pytest.raises(ValueError):
        alternation_literals("abc||def")        # empty alternative


def _brute_regex(docs, lits):
    out = {}
    for r in docs.collect():
        t = r.text or ""
        n = sum(t.count(p) for p in lits)
        if any(p in t for p in lits):
            out[r.doc_id] = n
    return out


@pytest.mark.parametrize("pattern", [
    "data stream|quick brown",     # disjoint alternatives
    "data|ata",                    # overlapping alternatives (sum contract)
    "zzz|yyy",                     # no matches
    "a%b_c|data",                  # metachar-free literal with % _
])
def test_regex_matches_brute_force(idx, spark, pattern):
    docs, path = idx
    lits = alternation_literals(pattern)
    got = {r.doc_id: r.n_occ
           for r in regex_search(spark, path, docs, pattern).collect()}
    assert got == _brute_regex(docs, lits)


def test_regex_equals_union_of_single_searches(idx, spark):
    docs, path = idx
    pattern = "data stream|quick brown|datadata"
    got = {r.doc_id: r.n_occ
           for r in regex_search(spark, path, docs, pattern).collect()}
    want = {}
    for lit in alternation_literals(pattern):
        for r in substring_search(spark, path, docs, lit).collect():
            want[r.doc_id] = want.get(r.doc_id, 0) + r.n_occ
    assert got == want


def test_regex_candidates_superset_and_false_positive_filtered(
        idx, spark, tmp_path):
    # "abcde"'s trigrams {abc, bcd, cde} all appear in "abcd cdex"
    # without the substring itself: the index must surface doc 1 as a
    # candidate (AND over trigrams holds) and the verify must drop it.
    docs = spark.createDataFrame(
        [(0, "xx abcde yy"), (1, "abcd cdex"), (2, "nothing here")],
        "doc_id long, text string")
    path = str(tmp_path / "tg")
    build_trigram_index(docs, path, n_buckets=8)
    cand = {r.doc_id for r in
            regex_candidates(spark, path, ["abcde"]).collect()}
    assert cand == {0, 1}
    hits = {r.doc_id for r in
            regex_search(spark, path, docs, "abcde|nothing").collect()}
    assert hits == {0, 2}
