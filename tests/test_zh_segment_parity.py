"""jieba-parity evidence (gated): when a real ``jieba`` is importable,
``zh_cut`` must equal ``jieba.lcut`` exactly — on the reference query
vocabulary, the rule-config words, and a sampled synthetic corpus — so
the FMM stand-in's divergence is measured, never assumed.  In sandboxes
without jieba the module tests below still pin the stand-in's own
contract (determinism, dictionary-word segmentation)."""

import pytest

from document_retrieval_system_spark.functions.zh_segment import (
    _HAVE_JIEBA,
    fmm_cut,
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


def _boundaries(tokens: list[str]) -> set[int]:
    """Cumulative cut positions — the token-boundary set of a segmentation."""
    out, pos = set(), 0
    for t in tokens:
        pos += len(t)
        out.add(pos)
    return out


def _boundary_parity(texts: list[str], cut_a, cut_b) -> float:
    """Jaccard agreement of token boundaries across a text sample."""
    inter = union = 0
    for text in texts:
        a, b = _boundaries(cut_a(text)), _boundaries(cut_b(text))
        inter += len(a & b)
        union += len(a | b)
    return inter / union if union else 1.0


@pytest.mark.skipif(not _HAVE_JIEBA, reason="jieba not installed in this env")
def test_zh_cut_matches_jieba_on_reference_vocabulary():
    import jieba

    for text in _VOCAB:
        assert fmm_cut(text) == jieba.lcut(text), text


@pytest.mark.skipif(not _HAVE_JIEBA, reason="jieba not installed in this env")
def test_zh_cut_boundary_parity_on_sampled_corpus():
    """Measured (never assumed) parity: >=99% token-boundary agreement on
    the embedded corpus sample, reported as a percentage so the residual
    divergence is visible, not binary."""
    import jieba

    texts = []
    for i in range(0, 200, 7):
        url, _ts, html, lang = gen_page(i)
        if lang != "zh":
            continue
        texts.append(extract_html(html, url)["content"])
    parity = _boundary_parity(texts, fmm_cut, jieba.lcut)
    print(f"jieba boundary parity on corpus sample: {parity:.4%}")
    assert parity >= 0.99, f"boundary parity {parity:.4%} below 99%"


def test_fmm_standin_contract_without_jieba():
    """Deterministic and dictionary-faithful regardless of jieba: the
    stand-in's segmentation of in-dictionary compounds is stable, so
    every downstream score is reproducible in this sandbox."""
    a = zh_cut("人工智能和机器学习的搜索引擎")
    assert a == zh_cut("人工智能和机器学习的搜索引擎")
    assert "人工智能" in a or ("人工" in a and "智能" in a)
    # single out-of-vocab CJK chars pass through as unigrams
    assert zh_cut("鑫") == ["鑫"]


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
