"""Snippet highlighting (T8) — post-top-k only.

Faithful transcription of SearchEngine._add_highlights
(/root/reference/core/retrieval/index/search_engine.py:484-546):
word-boundary regex per query term, substring fallback, ±75-char window
snapped outward to spaces, terms wrapped in [HIGHLIGHT]...[/HIGHLIGHT],
de-duplicated, nominally capped at 3 (the reference's cap check runs
AFTER append, so later terms can add one extra each — preserved).

Runs as a pandas UDF over the top-k DataFrame joined with document text
(k <= ~20 rows — negligible work, but the UDF form keeps it
cluster-side so the driver never pulls full documents).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from document_retrieval_system_spark.functions.analyzer import process_text


def make_highlights(content: str, query_terms: list[str],
                    max_highlights: int = 3, highlight_length: int = 150) -> list[str]:
    """search_engine.py:499-546, one document."""
    if not content:
        return []
    highlights: list[str] = []
    for term in query_terms:
        term_pattern = re.compile(r"\b" + re.escape(term) + r"\b", re.IGNORECASE)
        matches = list(term_pattern.finditer(content))
        if not matches:  # fuzzy fallback (:514-516)
            term_pattern = re.compile(re.escape(term), re.IGNORECASE)
            matches = list(term_pattern.finditer(content))
        for match in matches[:max_highlights]:
            start = max(0, match.start() - highlight_length // 2)
            end = min(len(content), match.end() + highlight_length // 2)
            if start > 0:  # snap to spaces (:523-531)
                while start > 0 and content[start] != " ":
                    start -= 1
                start += 1
            if end < len(content):
                while end < len(content) and content[end] != " ":
                    end += 1
            context = content[start:end]
            highlighted = term_pattern.sub(f"[HIGHLIGHT]{term}[/HIGHLIGHT]", context)
            if highlighted not in highlights:
                highlights.append(highlighted)
                if len(highlights) >= max_highlights:
                    break
    return highlights


def with_highlights(topk_with_text: DataFrame, query: str, lang: str = "zh",
                    text_col: str = "text") -> DataFrame:
    query_terms = process_text(query, lang)

    @F.pandas_udf(ArrayType(StringType()))
    def hl(text: pd.Series) -> pd.Series:
        return pd.Series([make_highlights(t or "", query_terms) for t in text])

    return topk_with_text.withColumn("highlights", hl(F.col(text_col)))
