"""Rule-engine rescoring (U1-U8) and snippet highlighting (T8) semantics."""

import math

import pytest
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.highlight import (
    make_highlights,
    with_highlights,
)
from document_retrieval_system_spark.operators.rules import (
    DEFAULT_RULES,
    apply_result_rules,
    process_query,
    rule_content_length,
    rule_keyword_density,
)

NOW = 1735689600.0  # 2025-01-01T00:00:00Z, pinned for determinism


@pytest.fixture()
def topk(spark):
    rows = [
        # doc_id, score, text, warc_ts
        ("a", 1.0, "这是关于算法和框架的重要文档", "2024-12-01 00:00:00"),
        ("b", 1.0, "普通内容没有规则词", "2024-12-01 00:00:00"),
        ("c", 1.0, "紧急 重要 算法 全都有", "2022-06-01 00:00:00"),
        ("d", 1.0, "x" * 50, "2024-12-01 00:00:00"),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, score double, text string, warc_ts string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))


def test_process_query_metadata():
    meta = process_query("重要 紧急 算法 查询")
    # first matching domain wins (dict order: technical before business)
    assert meta["domain"] == "technical"
    assert meta["domain_matched_words"] == ["算法"]
    weights = {tuple(b["words"]): b["weight"] for b in meta["boost_matches"]}
    assert weights == {("重要",): 1.5, ("紧急",): 2.0}


def test_boost_and_domain_multiplication(spark, topk):
    out = apply_result_rules(
        topk, "重要 紧急 算法", DEFAULT_RULES, warc_ts_col=None
    )
    scores = {r["doc_id"]: r["score"] for r in out.collect()}
    # a: 重要(x1.5) + 算法 domain(x1.3) = 1.95
    assert scores["a"] == pytest.approx(1.5 * 1.3)
    # b: nothing matches
    assert scores["b"] == pytest.approx(1.0)
    # c: 重要(1.5) * 紧急(2.0) * domain 算法(1.3)
    assert scores["c"] == pytest.approx(1.5 * 2.0 * 1.3)


def test_time_decay(spark, topk):
    out = apply_result_rules(
        topk, "无规则词查询", DEFAULT_RULES, warc_ts_col="warc_ts", now_epoch=NOW
    )
    scores = {r["doc_id"]: r["score"] for r in out.collect()}
    # a: age = 31 days ≈ 1.033 months -> exp(-0.1033)
    age_months_a = (NOW - 1733011200.0) / (30 * 24 * 3600)
    assert scores["a"] == pytest.approx(math.exp(-0.1 * age_months_a), rel=1e-9)
    # c: age ≈ 31.1 months > 24 -> decay skipped
    assert scores["c"] == pytest.approx(1.0)


def test_doc_type_weights(spark, topk):
    df = topk.withColumn("doc_type", F.lit("html"))
    out = apply_result_rules(
        df, "无", DEFAULT_RULES, doc_type_col="doc_type", warc_ts_col=None
    )
    assert all(r["score"] == pytest.approx(0.9) for r in out.collect())


def test_content_length_rule(spark, topk):
    out = rule_content_length(topk, min_length=100)
    scores = {r["doc_id"]: r["score"] for r in out.collect()}
    assert scores["a"] == pytest.approx(0.8)  # short zh text
    assert scores["d"] == pytest.approx(0.8)  # 50 chars < 100


def test_keyword_density_rule(spark):
    rows = [
        ("lo", 1.0, " ".join(["filler"] * 999 + ["data"])),  # density ~0.001
        ("hi", 1.0, "data data data data here"),  # density 4/5 > 0.05
        ("mid", 1.0, " ".join(["data"] + ["pad"] * 99)),  # 0.01 in between
    ]
    df = spark.createDataFrame(rows, "doc_id string, score double, text string")
    out = rule_keyword_density(df, "data", min_density=0.005)
    scores = {r["doc_id"]: r["score"] for r in out.collect()}
    assert scores["lo"] == pytest.approx(0.9)
    assert scores["hi"] == pytest.approx(1.2)
    assert scores["mid"] == pytest.approx(1.0)


def test_highlight_semantics():
    content = "alpha beta gamma " + "x" * 200 + " beta delta"
    hl = make_highlights(content, ["beta"])
    assert len(hl) >= 1
    assert "[HIGHLIGHT]beta[/HIGHLIGHT]" in hl[0]
    # window is snapped to spaces, so no mid-word truncation at the edges
    for h in hl:
        assert not h.startswith("x") or "beta" in h


def test_highlight_fallback_substring():
    # no word-boundary match -> substring fallback (:514-516)
    hl = make_highlights("数据库的索引结构", ["索引"])
    assert hl and "[HIGHLIGHT]索引[/HIGHLIGHT]" in hl[0]


def test_highlight_dedup_and_cap():
    content = "term one. " * 10
    hl = make_highlights(content, ["term"])
    assert len(hl) <= 3
    assert len(set(hl)) == len(hl)


def test_with_highlights_spark_matches_local(spark, reader, oracle_engine):
    from document_retrieval_system_spark.operators.search import bm25_search

    top = bm25_search(reader, "数据 算法", "zh", 5, 0.0)
    docs = reader.docs().select("shard", "local_no", "text")
    joined = top.join(docs, ["shard", "local_no"])
    out = with_highlights(joined, "数据 算法", "zh")
    from document_retrieval_system_spark.functions.analyzer import process_text

    terms = process_text("数据 算法", "zh")
    for r in out.collect():
        assert list(r["highlights"]) == make_highlights(r["text"] or "", terms)
