"""Analyzer pipeline semantics (text_processor.py transcription)."""

from document_retrieval_system_spark.functions.analyzer import (
    clean_text,
    process_text,
    tokenize,
)
from document_retrieval_system_spark.functions.porter import porter_stem


def test_clean_text_english():
    # text_processor.py:114-120 — punctuation and digits to spaces, collapse
    assert clean_text("Hello, World! 42 times?", "english") == "hello world times"
    assert clean_text("", "english") == ""


def test_clean_text_chinese():
    # :123-129 — strip non-word/CJK, digits
    assert clean_text("人工智能，大数据！30%提升。", "chinese") == "人工智能 大数据 提升"


def test_min_token_length():
    # :154 — tokens shorter than 2 dropped ("a", single CJK chars)
    assert "a" not in tokenize("a big cat", "english")
    toks = process_text("大 数据", "zh")
    assert "大" not in toks  # single char dropped, SURVEY §7 hard-part (e)


def test_stopwords_removed():
    assert process_text("the quick fox and the dog", "en") == ["quick", "fox", "dog"]
    assert process_text("人工智能的系统", "zh") == ["人工智能", "系统"]


def test_english_stemming_applied():
    assert process_text("running quickly", "en") == ["run", "quickli"]


def test_chinese_segmentation_deterministic():
    out1 = process_text("人工智能和大数据的机器学习系统", "zh")
    out2 = process_text("人工智能和大数据的机器学习系统", "zh")
    assert out1 == out2 == ["人工智能", "大数据", "机器学习", "系统"]


def test_reference_benchmark_query():
    # main.py:205 benchmark query must analyze to three terms
    assert process_text("人工智能 大数据 机器学习", "zh") == [
        "人工智能", "大数据", "机器学习",
    ]


def test_porter_classic_vectors():
    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "conflated": "conflat", "troubled": "troubl",
        "sized": "size", "hopping": "hop", "falling": "fall", "happy": "happi",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "digitizer": "digit", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
        "formalize": "formal", "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer", "airliner": "airlin",
        "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
        "communism": "commun", "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    for word, want in vectors.items():
        assert porter_stem(word) == want, word


def test_query_doc_symmetry():
    """The same analyzer runs on docs and queries (indexer.py:414 vs
    search_engine.py:440)."""
    text = "Distributed Compression... RANKING!"
    assert process_text(text, "en") == process_text(text.lower(), "en")
