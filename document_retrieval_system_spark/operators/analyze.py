"""Vectorized analysis stage: text -> tokens -> per-doc term stats.

Spark mapping of SURVEY.md §2.2 (T1-T6) and §2.3 I1:

- ``tokenize_udf``: one Arrow pandas UDF running the full reference
  pipeline (clean -> segment -> stopwords -> stem,
  text_processor.py:209-228) per row.  Identical function applied to
  documents and queries, exactly like the reference (indexer.py:414,
  search_engine.py:360,440).
- ``doc_term_rows``: the reference's per-doc term-stat loop
  (InvertedIndex.add_document, indexer.py:44-93) is per-document local
  work, so it runs MAP-SIDE inside ``mapInPandas`` — no shuffle.  The
  only shuffle in the whole index build is the subsequent
  groupBy(shard, term) that assembles posting lists.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, StringType

from document_retrieval_system_spark.functions.analyzer import process_text
from document_retrieval_system_spark.operators.codec import encode_position_payloads


def make_extract_tokenize_udf(analyzer=process_text):
    """Fully fused per-document stage: ONE Arrow pass doing
    extract (html -> text) -> tokenize -> per-doc term stats (I1,
    indexer.py:59-67), returning
    struct(title, text, doc_len, terms array<struct<term, tf, positions>>).

    Why fused: separate extract / tokenize / doc-term-stat UDF stages
    cross the JVM<->Python Arrow boundary three times (the third with one
    row per (doc, term) — ~40x the row count); this crosses once per
    document, and the (doc, term) explosion happens JVM-side with
    codegen.  Measured ~2x on the build's map phase."""
    from document_retrieval_system_spark.sources.html_extract import (
        _url_basename,
        extract_html,
    )
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType([
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("doc_len", IntegerType()),
        StructField(
            "terms",
            ArrayType(
                StructType([
                    StructField("term", StringType()),
                    StructField("tf", IntegerType()),
                    # varbyte [n_pos, pos0, delta...] — pre-encoded here so
                    # the posting shuffle moves compact binary, not
                    # list<int>, and the block builder only joins bytes
                    StructField("pos_bytes", BinaryType()),
                ])
            ),
        ),
    ])

    @F.pandas_udf(schema)
    def _fused(html: pd.Series, url: pd.Series, text: pd.Series,
               lang: pd.Series) -> pd.DataFrame:
        titles, texts, doc_lens, terms_col = [], [], [], []
        for h, u, t, l in zip(html, url, text, lang):
            if t is None and h is not None:
                try:
                    res = extract_html(h, u or "")
                    title, t = res["title"], res["content"]
                except Exception:
                    title, t = _url_basename(u or ""), ""
            else:
                title = _url_basename(u or "")
            tokens = analyzer(t, l) if t is not None else []
            # indexer.py:59-67 — tf + positions per term, one pass
            freqs: dict[str, int] = {}
            positions: dict[str, list[int]] = {}
            for pos, tok in enumerate(tokens):
                freqs[tok] = freqs.get(tok, 0) + 1
                positions.setdefault(tok, []).append(pos)
            titles.append(title)
            texts.append(t)
            doc_lens.append(len(tokens))
            term_list = list(freqs.items())
            payloads = encode_position_payloads([positions[k] for k, _ in term_list])
            terms_col.append(
                [(term, tf, payloads[i]) for i, (term, tf) in enumerate(term_list)]
            )
        return pd.DataFrame(
            {"title": titles, "text": texts, "doc_len": doc_lens, "terms": terms_col}
        )

    return _fused


def make_tokenize_udf(analyzer=process_text):
    """Arrow UDF factory so alternate analyzers (e.g. the SQL-expressible
    one used for DuckDB-verified queries) reuse the same plumbing."""

    @F.pandas_udf(ArrayType(StringType()))
    def _tokenize(text: pd.Series, lang: pd.Series) -> pd.Series:
        return pd.Series(
            [analyzer(t, l) if t is not None else [] for t, l in zip(text, lang)]
        )

    return _tokenize


tokenize_udf = make_tokenize_udf()


def doc_term_rows(tok_docs):
    """(shard, local_no, doc_len, terms) -> one row per (doc, term).

    The per-doc term stats were already computed inside the fused Arrow
    UDF; this is a pure JVM-side explode (whole-stage codegen, no Python).
    Empty docs have an empty terms array and vanish in the explode
    (indexer.py:53-54 — empty docs are not indexed).
    """
    return tok_docs.select(
        "shard", "local_no", "doc_len", F.explode("terms").alias("t")
    ).select(
        "shard",
        "local_no",
        F.col("t.term").alias("term"),
        F.col("t.tf").alias("tf"),
        F.col("t.pos_bytes").alias("pos_bytes"),
        "doc_len",
    )
