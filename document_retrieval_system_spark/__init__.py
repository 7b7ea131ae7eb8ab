"""document_retrieval_system_spark — a PySpark-native full-text index + BM25 engine.

A from-scratch rebuild of the capabilities of the reference
Document-Retrieval-System (a single-process Python inverted-index search
engine) as an idiomatic Spark DataFrame pipeline:

    pages (url, warc_ts, html, text, lang)
      -> extract_text (vectorized Arrow UDF, reference-identical algorithm)
      -> tokenize     (vectorized Arrow UDF: clean/segment/stopwords/stem)
      -> posting-list construction (posexplode + groupBy + applyInPandas)
      -> delta+varbyte-compressed, block-max-annotated global index (Parquet,
         partitioned & salted for term skew; Iceberg-ready layout)
      -> BM25 (k1=1.2, b=0.75) top-k with block-max WAND pruning,
         TF-IDF cosine, boolean / phrase / NEAR queries
      -> rule-based rescoring + snippet highlighting

plus the large-scale training-data-pipeline operators a 100 TB corpus
needs: exact/MinHash-LSH/SimHash/n-gram dedup, embedding ANN search,
language-ID / quality / token statistics.

Scoring semantics follow the reference exactly (see SURVEY.md §2 for the
file:line inventory); execution is Spark-first and designed for a
1000-executor cluster even though tests run on local[*].
"""

__version__ = "0.1.0"

from document_retrieval_system_spark.session import get_spark  # noqa: F401
