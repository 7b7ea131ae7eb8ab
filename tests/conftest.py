"""Shared fixtures: one SparkSession, one small corpus, one built index."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from document_retrieval_system_spark.oracle import OracleEngine, doc_id_of
from document_retrieval_system_spark.sources.corpus import gen_page
from document_retrieval_system_spark.sources.html_extract import extract_html

N_PAGES = 240
N_SHARDS = 8


@pytest.fixture(scope="session")
def spark():
    from document_retrieval_system_spark.session import get_spark

    spark = get_spark("drs-tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus_pages():
    """[(url, warc_ts, html bytes, lang)] for the test corpus."""
    return [gen_page(i) for i in range(N_PAGES)]


@pytest.fixture(scope="session")
def oracle_engine(corpus_pages) -> OracleEngine:
    docs = []
    for url, _ts, html, lang in corpus_pages:
        text = extract_html(html, url)["content"]
        docs.append((doc_id_of(url), text, lang))
    return OracleEngine(docs)


@pytest.fixture(scope="session")
def index_dir(spark, corpus_pages):
    from document_retrieval_system_spark.operators.index_build import build_index
    from document_retrieval_system_spark.sources.corpus import pages_df

    tmp = tempfile.mkdtemp(prefix="drs_index_")
    pages = pages_df(spark, N_PAGES)
    build_index(spark, pages, tmp, n_shards=N_SHARDS)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture(scope="session")
def reader(spark, index_dir):
    from document_retrieval_system_spark.operators.index_build import IndexReader

    return IndexReader(spark, index_dir)
