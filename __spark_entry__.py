"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (BM25 top-k over the documents table
  at sf0.001) — smoke check.
- ``queries()``: one entry per implemented operator from SURVEY.md §2
  plus the training-data pipeline operators (dedup / ANN / text stats).
- ``oracle_sql()``: DuckDB-runnable ANSI-SQL twins (seeded hyperplanes /
  IVF centroids ship as literal DOUBLE[] rows, so even the bucketed ANN
  paths are hash-checked); omitted only for ops that are genuinely not
  SQL-expressible (the reference highlighter's snippet text, multimodal
  stub plumbing, the HTML extractor) — those get the driver's rows-only
  check and are oracle-verified in pytest instead.

Implementations live in document_retrieval_system_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from document_retrieval_system_spark.entry_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k on /root/testdata/sf0.001 documents."""
    from document_retrieval_system_spark.entry_queries import q_r3_bm25_topk

    return q_r3_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: builder for name, (builder, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    # a callable SQL entry is built at call time — used where the oracle
    # embeds data-fitted literals (IVF centroids) that cannot be known at
    # import time
    return {
        name: (sql() if callable(sql) else sql)
        for name, (_builder, sql) in QUERIES.items()
        if sql is not None
    }
