"""jieba-parity evidence (gated): when a real ``jieba`` is importable,
our ``dag_cut`` (the reimplemented prefix-dict DAG + max-probability
route + BMES-Viterbi OOV step, running over jieba's OWN dictionary and
finalseg tables) must equal ``jieba.lcut`` EXACTLY, token for token —
with and without HMM — so the algorithm itself is verified, never
approximated.  In sandboxes without jieba the module tests below pin
the embedded-dictionary backend's contract (determinism, DP
segmentation preferring dictionary compounds, OOV unigrams)."""

import pytest

from document_retrieval_system_spark.functions.zh_segment import (
    _HAVE_JIEBA,
    dag_cut,
    zh_cut,
)
from document_retrieval_system_spark.operators.rules import DEFAULT_RULES
from document_retrieval_system_spark.sources.corpus import (
    REFERENCE_QUERIES,
    gen_page,
)
from document_retrieval_system_spark.sources.html_extract import extract_html

_VOCAB = (
    [q["query"] for q in REFERENCE_QUERIES]
    + DEFAULT_RULES["exclusion_words"]
    + [w for r in DEFAULT_RULES["boost_words"] for w in r["words"]]
    + [
        w
        for d in DEFAULT_RULES["domain_rules"].values()
        for w in d["boost_words"]
    ]
)


def _corpus_texts() -> list[str]:
    texts = []
    for i in range(0, 200, 7):
        url, _ts, html, lang = gen_page(i)
        if lang != "zh":
            continue
        texts.append(extract_html(html, url)["content"])
    return texts


@pytest.mark.skipif(not _HAVE_JIEBA, reason="jieba not installed in this env")
def test_dag_cut_matches_jieba_lcut_exactly():
    """The reimplemented algorithm over jieba's own dict + finalseg
    tables must reproduce jieba.lcut token-for-token (HMM on — the
    reference's default path, text_processor.py:148)."""
    import jieba

    for text in _VOCAB + _corpus_texts():
        assert dag_cut(text, hmm=True) == jieba.lcut(text), text


@pytest.mark.skipif(not _HAVE_JIEBA, reason="jieba not installed in this env")
def test_dag_cut_matches_jieba_lcut_no_hmm_exactly():
    """The NO-HMM variant (the sandbox fallback's buffering semantics)
    must equal jieba.lcut(HMM=False) token-for-token."""
    import jieba

    for text in _VOCAB + _corpus_texts():
        assert dag_cut(text, hmm=False) == jieba.lcut(text, HMM=False), text


def test_dag_backend_contract_without_jieba():
    """Deterministic and dictionary-faithful regardless of jieba: the
    DP segmentation of in-dictionary compounds is stable, so every
    downstream score is reproducible in this sandbox."""
    a = zh_cut("人工智能和机器学习的搜索引擎")
    assert a == zh_cut("人工智能和机器学习的搜索引擎")
    assert "人工智能" in a or ("人工" in a and "智能" in a)
    # single out-of-vocab CJK chars pass through as unigrams
    assert zh_cut("鑫") == ["鑫"]


def test_dag_route_prefers_max_probability_segmentation():
    """The DP must pick the max-probability route, not greedy longest
    match: dictionary compounds win over unigram chains, and the whole
    compound beats its sub-words when both are in the dictionary."""
    toks = dag_cut("人工智能", hmm=False)
    assert toks == ["人工智能"], toks  # not 人工+智能 (both also in dict)
    toks = dag_cut("数据库系统", hmm=False)
    assert toks == ["数据库", "系统"], toks
    # OOV chars segment as unigrams around dictionary words
    toks = dag_cut("鑫数据鑫", hmm=False)
    assert toks == ["鑫", "数据", "鑫"], toks


def test_dag_cut_latin_and_whitespace_blocks():
    """jieba.cut block semantics: latin/digit runs stay whole inside han
    blocks, whitespace yields separate space tokens (the analyzer's
    min-length filter drops them downstream)."""
    assert dag_cut("abc数据", hmm=False) == ["abc", "数据"]
    toks = dag_cut("数据 abc", hmm=False)
    assert toks == ["数据", " ", "abc"], toks


def test_extract_keywords_semantics(spark):
    """T7: per-doc top-N by (tf desc, term asc) — the exact reduction of
    single-doc sklearn TfidfVectorizer (constant idf, stable sort); also
    compared directly against sklearn when it is importable."""
    from collections import Counter

    from document_retrieval_system_spark.operators.textstats import (
        extract_keywords,
        simple_process_text,
    )

    texts = [
        (0, "data data data join join filter scan scan scan scan"),
        (1, "alpha beta beta gamma gamma gamma"),
        (2, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"])
        for r in extract_keywords(df, top_n=3).collect()
    }
    for doc_id, text in texts:
        toks = simple_process_text(text)
        want = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (term, tf) in enumerate(want, start=1):
            assert got[(doc_id, rk)] == (term, tf), (doc_id, rk)
    assert (2, 1) not in got  # empty doc yields no keywords

    try:
        from sklearn.feature_extraction.text import TfidfVectorizer
    except ImportError:
        return  # gated: sklearn absent in this sandbox
    for doc_id, text in texts[:2]:
        toks = simple_process_text(text)
        vec = TfidfVectorizer(max_features=3)
        m = vec.fit_transform([" ".join(toks)])
        scored = sorted(
            zip(vec.get_feature_names_out(), m.toarray()[0]),
            key=lambda x: x[1], reverse=True,
        )
        ours = [got[(doc_id, rk)][0] for rk in (1, 2, 3) if (doc_id, rk) in got]
        assert [w for w, _ in scored][: len(ours)] == ours
