"""jieba-parity evidence (gated): when a real ``jieba`` is importable,
``zh_cut`` must equal ``jieba.lcut`` exactly — on the reference query
vocabulary, the rule-config words, and a sampled synthetic corpus — so
the FMM stand-in's divergence is measured, never assumed.  In sandboxes
without jieba the module tests below still pin the stand-in's own
contract (determinism, dictionary-word segmentation)."""

import pytest

from document_retrieval_system_spark.functions.zh_segment import _HAVE_JIEBA, zh_cut
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


@pytest.mark.skipif(not _HAVE_JIEBA, reason="jieba not installed in this env")
def test_zh_cut_matches_jieba_on_reference_vocabulary():
    import jieba

    for text in _VOCAB:
        assert zh_cut(text) == jieba.lcut(text), text


@pytest.mark.skipif(not _HAVE_JIEBA, reason="jieba not installed in this env")
def test_zh_cut_matches_jieba_on_sampled_corpus():
    import jieba

    mismatches = []
    for i in range(0, 200, 7):
        url, _ts, html, lang = gen_page(i)
        if lang != "zh":
            continue
        text = extract_html(html, url)["content"]
        if zh_cut(text) != jieba.lcut(text):
            mismatches.append(url)
    assert not mismatches, mismatches


def test_fmm_standin_contract_without_jieba():
    """Deterministic and dictionary-faithful regardless of jieba: the
    stand-in's segmentation of in-dictionary compounds is stable, so
    every downstream score is reproducible in this sandbox."""
    a = zh_cut("人工智能和机器学习的搜索引擎")
    assert a == zh_cut("人工智能和机器学习的搜索引擎")
    assert "人工智能" in a or ("人工" in a and "智能" in a)
    # single out-of-vocab CJK chars pass through as unigrams
    assert zh_cut("鑫") == ["鑫"]
