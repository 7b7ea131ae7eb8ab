"""Block-max WAND metamorphic tests (SURVEY.md §5.5): pruning is a pure
optimization — WAND top-k must equal the exhaustive scorer's top-k and
the oracle, for every query shape."""

import pytest

from document_retrieval_system_spark.operators.search import bm25_search
from document_retrieval_system_spark.operators.wand import bm25_wand_search
from document_retrieval_system_spark.sources.corpus import REFERENCE_QUERIES


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize(
    "q", [q for q in REFERENCE_QUERIES if q["algorithm"] == "bm25"],
    ids=lambda q: f"q{q['query_id']}",
)
def test_wand_equals_exhaustive(reader, q):
    lang = "zh" if any("一" <= c <= "鿿" for c in q["query"]) else "en"
    pruned = _rows(bm25_wand_search(reader, q["query"], lang, q["max_results"], q["min_score"]))
    full = _rows(bm25_search(reader, q["query"], lang, q["max_results"], q["min_score"]))
    assert [p[0] for p in pruned] == [f[0] for f in full]
    for (pd_, ps), (fd, fs) in zip(pruned, full):
        assert ps == pytest.approx(fs, rel=1e-12), pd_


def test_wand_matches_oracle(reader, oracle_engine):
    for query, lang, k, ms in (
        ("人工智能 大数据 机器学习", "zh", 20, 0.3),
        ("search engine index ranking", "en", 10, 0.0),
        ("数据", "zh", 5, 0.5),
        ("compression wand pruning", "en", 20, 0.3),
    ):
        got = _rows(bm25_wand_search(reader, query, lang, k, ms))
        want = oracle_engine.bm25(query, lang, k, ms)
        assert [g[0] for g in got] == [w[0] for w in want], query
        for (gd, gs), (_wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9), (query, gd)


def test_wand_small_k_with_ties(reader, oracle_engine):
    """k smaller than the tie group (duplicate docs) must keep doc_id order."""
    got = _rows(bm25_wand_search(reader, "数据 算法 系统", "zh", 3, 0.0))
    want = oracle_engine.bm25("数据 算法 系统", "zh", 3, 0.0)
    assert [g[0] for g in got] == [w[0] for w in want]


def test_wand_k_larger_than_candidates(reader, oracle_engine):
    got = _rows(bm25_wand_search(reader, "wand", "en", 10000, 0.0))
    want = oracle_engine.bm25("wand", "en", 10000, 0.0)
    assert [g[0] for g in got] == [w[0] for w in want]
