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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from document_retrieval_system_spark.functions.analyzer import process_text


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


DOC_TERM_SCHEMA = (
    "shard int, local_no long, term string, tf int, positions array<int>, doc_len int"
)


def doc_term_rows(tok_docs):
    """(shard, local_no, tokens, ...) -> one row per (doc, term): map-only I1.

    Output: shard, local_no, term, tf, positions (0-based, sorted), doc_len.
    Mirrors indexer.py:59-67 (term_freqs / term_positions accumulation).
    """

    cols = tok_docs.select("shard", "local_no", "tokens")

    def explode_terms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shards, locals_, terms, tfs, poss, dls = [], [], [], [], [], []
            for shard, local_no, tokens in zip(
                pdf["shard"], pdf["local_no"], pdf["tokens"]
            ):
                if tokens is None or len(tokens) == 0:
                    continue  # indexer.py:53-54 — empty docs are not indexed
                freqs: dict[str, int] = {}
                positions: dict[str, list[int]] = {}
                for pos, tok in enumerate(tokens):
                    freqs[tok] = freqs.get(tok, 0) + 1
                    positions.setdefault(tok, []).append(pos)
                dl = len(tokens)
                for term, tf in freqs.items():
                    shards.append(shard)
                    locals_.append(local_no)
                    terms.append(term)
                    tfs.append(tf)
                    poss.append(positions[term])
                    dls.append(dl)
            yield pd.DataFrame(
                {
                    "shard": pd.Series(shards, dtype="int32"),
                    "local_no": pd.Series(locals_, dtype="int64"),
                    "term": terms,
                    "tf": pd.Series(tfs, dtype="int32"),
                    "positions": poss,
                    "doc_len": pd.Series(dls, dtype="int32"),
                }
            )

    return cols.mapInPandas(explode_terms, DOC_TERM_SCHEMA)
