"""The canonical text analyzer: clean -> tokenize -> stopwords -> stem.

This is a faithful transcription of the reference pipeline
(/root/reference/core/utils/text_processor.py):

- ``clean_text`` :97-131  — lowercase; EN: strip ``string.punctuation`` and
  digits to spaces, collapse whitespace; ZH: strip everything outside
  ``[\\w\\s\\u4e00-\\u9fff]`` and digits, collapse whitespace; strip.
- ``tokenize``   :133-156 — ZH: jieba-style segmentation (see
  zh_segment.py); EN: word tokenization (after clean_text the string
  contains only letter runs separated by single spaces, so NLTK
  ``word_tokenize`` degenerates to whitespace split, which is what we do);
  drop tokens shorter than ``min_token_length`` = 2 (:154, default from
  config/app_config.yaml:43).
- ``remove_stopwords`` :158-171 — language-specific stopword set.
- ``stem_tokens``      :173-189 — Porter stemming, English only.
- ``process_text``     :209-228 — the composition; applied identically to
  documents (indexer.py:414) and queries (search_engine.py:360,440).

The reference configures ONE global language; our engine is per-row:
``lang == "zh"`` selects the Chinese branch, anything else the English
branch.  Pure Python on purpose — the same functions back the
single-process oracle and the vectorized Arrow UDFs, so Spark == oracle is
exact by construction.
"""

from __future__ import annotations

import re
import string

from document_retrieval_system_spark.functions.porter import porter_stem
from document_retrieval_system_spark.functions.stopwords import (
    EN_STOPWORDS,
    ZH_STOPWORDS,
)
from document_retrieval_system_spark.functions.zh_segment import zh_cut

MIN_TOKEN_LENGTH = 2  # app_config.yaml:43 text_processing.min_token_length

# Same constructions as the reference (text_processor.py:116,125,118,120).
_EN_PUNCT_RE = re.compile(f"[{re.escape(string.punctuation)}]")
_ZH_NOISE_RE = re.compile(r"[^\w\s一-鿿]+")
_DIGITS_RE = re.compile(r"\d+")
_WS_RE = re.compile(r"\s+")
# fused single-pass equivalents of (punct|noise)-sub + digits-sub: the
# character classes are disjoint (punctuation/noise exclude \d, which is
# \w) and both replace with ' ', so one alternation pass is equivalent
# to the reference's two sequential passes — same output, one string
# traversal fewer per document
_EN_PUNCT_DIGITS_RE = re.compile(
    f"[{re.escape(string.punctuation)}]|\\d+"
)
_ZH_NOISE_DIGITS_RE = re.compile(r"[^\w\s一-鿿]+|\d+")


def norm_lang(lang: str | None) -> str:
    """Map a per-row lang code onto the reference's two analyzer branches."""
    return "chinese" if (lang or "").lower().startswith("zh") else "english"


def clean_text(text: str, lang: str = "chinese") -> str:
    if not text:
        return ""
    text = text.lower()
    if lang == "english":
        text = _EN_PUNCT_DIGITS_RE.sub(" ", text)
        text = _WS_RE.sub(" ", text)
    elif lang == "chinese":
        text = _ZH_NOISE_DIGITS_RE.sub(" ", text)
        text = _WS_RE.sub(" ", text)
    return text.strip()


def tokenize(text: str, lang: str = "chinese") -> list[str]:
    if not text:
        return []
    if lang == "chinese":
        tokens = zh_cut(text)
    else:
        tokens = text.split()
    return [t for t in tokens if len(t) >= MIN_TOKEN_LENGTH]


def remove_stopwords(tokens: list[str], lang: str = "chinese") -> list[str]:
    sw = ZH_STOPWORDS if lang == "chinese" else EN_STOPWORDS
    return [t for t in tokens if t not in sw]


def stem_tokens(tokens: list[str], lang: str = "chinese") -> list[str]:
    if lang == "english":
        return [porter_stem(t) for t in tokens]
    return tokens


def process_text(text: str, lang: str | None = "zh") -> list[str]:
    """Full pipeline; ``lang`` is a per-row code ("zh", "en", "fr", ...)."""
    branch = norm_lang(lang)
    toks = tokenize(clean_text(text, branch), branch)
    toks = remove_stopwords(toks, branch)
    if branch == "english":
        toks = stem_tokens(toks, branch)
    return toks
