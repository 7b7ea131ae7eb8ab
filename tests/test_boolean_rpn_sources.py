"""Full boolean language (B3-B5) vs oracle; file ingestion (S1-S3);
document deletion (I5); index statistics (I10); time sort (R7)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.boolean_rpn import (
    TokenType,
    boolean_rpn_search,
    to_rpn,
    tokenize_query,
)

RPN_QUERIES = [
    '数据 AND 算法',
    '数据 OR 算法',
    '数据 NOT 算法',
    '(数据 OR 算法) AND 系统',
    'NOT 数据',
    '数据 算法 系统',           # implicit AND chain
    '"人工智能 大数据"',          # phrase
    '数据 NEAR/3 算法',
    '(数据 AND 算法) OR (系统 NOT 索引)',
    'search AND engin',
]


def _doc_map(reader):
    rows = reader.docs().select("shard", "local_no", "doc_id").collect()
    return {(r["shard"], r["local_no"]): r["doc_id"] for r in rows}


@pytest.mark.parametrize("q", RPN_QUERIES, ids=lambda q: q[:24])
def test_rpn_matches_oracle(reader, oracle_engine, q):
    dm = _doc_map(reader)
    got = {dm[(r["shard"], r["local_no"])] for r in boolean_rpn_search(reader, q).collect()}
    want = oracle_engine.boolean_rpn(q)
    assert got == want, q


def test_lexer_and_precedence():
    toks = tokenize_query('a AND (b OR "c d") NEAR/2 e')
    assert [t.type for t in toks] == [
        TokenType.TERM, TokenType.AND, TokenType.LPAREN, TokenType.TERM,
        TokenType.OR, TokenType.PHRASE, TokenType.RPAREN, TokenType.NEAR,
        TokenType.TERM,
    ]
    rpn = to_rpn(toks)
    assert [t.value for t in rpn] == ["a", "b", "c d", "OR", "e", "NEAR/2", "AND"]


def test_unbalanced_parens_rejected():
    assert to_rpn(tokenize_query("(a AND b")) is None
    assert to_rpn(tokenize_query("a AND b)")) is None


def test_file_ingestion_s1_s3(spark, tmp_path):
    from document_retrieval_system_spark.operators.index_build import (
        IndexReader,
        build_index,
    )
    from document_retrieval_system_spark.sources.corpus import gen_page
    from document_retrieval_system_spark.sources.tables import read_pages_from_files

    d = tmp_path / "files"
    (d / "sub").mkdir(parents=True)
    for i in range(6):
        _url, _ts, html, _lang = gen_page(i + 1)
        (d / "sub" / f"page{i}.html").write_bytes(html)
    (d / "note.txt").write_text("plain text note about search engines", "utf-8")
    (d / "skip.bin").write_bytes(b"\x00\x01")

    pages = read_pages_from_files(spark, str(d), default_lang="en")
    rows = pages.collect()
    assert len(rows) == 7  # 6 html + 1 txt, .bin skipped
    txt = [r for r in rows if r["url"].endswith("note.txt")][0]
    assert txt["text"] == "plain text note about search engines"
    assert txt["html"] is None

    idx = tempfile.mkdtemp(prefix="drs_files_idx_")
    try:
        build_index(spark, pages, idx, n_shards=2)
        reader = IndexReader(spark, idx)
        assert reader.corpus()["total_docs"] >= 6
        from document_retrieval_system_spark.operators.search import bm25_search

        hits = bm25_search(reader, "search engines", "en", 10, 0.0)
        assert any(r["url"].endswith("note.txt") for r in hits.collect())
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_delete_documents_i5(spark):
    from document_retrieval_system_spark.operators.index_build import (
        IndexReader,
        build_index,
    )
    from document_retrieval_system_spark.operators.search import bm25_search
    from document_retrieval_system_spark.sources.corpus import PAGES_DDL, gen_pages_pandas
    from document_retrieval_system_spark.sources.tables import delete_documents

    idx = tempfile.mkdtemp(prefix="drs_del_idx_")
    try:
        pdf = gen_pages_pandas(60)
        build_index(spark, spark.createDataFrame(pdf, PAGES_DDL), idx, n_shards=4)
        victim_urls = pdf["url"].tolist()[:5]
        delete_documents(spark, idx, victim_urls)
        reader = IndexReader(spark, idx)
        remaining = {r["url"] for r in reader.docs().select("url").collect()}
        assert not (set(victim_urls) & remaining)

        # deleted-docs index == fresh index over the retained pages
        fresh = tempfile.mkdtemp(prefix="drs_del_fresh_")
        try:
            keep_pdf = pdf[~pdf["url"].isin(victim_urls)]
            build_index(spark, spark.createDataFrame(keep_pdf, PAGES_DDL),
                        fresh, n_shards=4)
            a = [(r["doc_id"], round(r["score"], 9)) for r in
                 bm25_search(reader, "数据 算法", "zh", 100, 0.0).collect()]
            b = [(r["doc_id"], round(r["score"], 9)) for r in
                 bm25_search(IndexReader(spark, fresh), "数据 算法", "zh", 100, 0.0).collect()]
            assert a == b
        finally:
            shutil.rmtree(fresh, ignore_errors=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_index_statistics_i10(reader):
    from document_retrieval_system_spark.sources.tables import index_statistics

    stats = index_statistics(reader)
    assert stats["total_docs"] > 0
    assert stats["unique_terms"] > 100
    assert set(stats["docs_by_lang"]) == {"zh", "en"}
    assert stats["compressed_bytes"] > 0
    assert stats["postings"] > 0


def test_register_index_views_sql_surface(spark, reader, oracle_engine):
    from document_retrieval_system_spark.sources.tables import register_index_views

    names = register_index_views(reader)
    assert "drs_postings_flat" in names
    # SQL over the decoded index reproduces oracle df counts
    row = spark.sql(
        "SELECT count(*) AS df FROM drs_postings_flat WHERE term = '数据'"
    ).collect()[0]
    assert row["df"] == oracle_engine.idx.get_doc_freq("数据")
    top = spark.sql(
        "SELECT term, df FROM drs_term_stats ORDER BY df DESC, term LIMIT 5"
    ).collect()
    oracle_top = sorted(
        oracle_engine.idx.doc_freqs.items(), key=lambda kv: (-kv[1], kv[0])
    )[:5]
    assert [(r["term"], r["df"]) for r in top] == oracle_top


def test_sort_results_by_time_r7(reader):
    from document_retrieval_system_spark.operators.search import bm25_search
    from document_retrieval_system_spark.sources.tables import sort_results_by_time

    res = bm25_search(reader, "数据", "zh", 20, 0.0)
    by_time = sort_results_by_time(res, reader.docs()).collect()
    times = [r["warc_ts"] for r in by_time]
    assert times == sorted(times, reverse=True)


def test_delete_documents_empties_whole_shard(spark):
    """Deleting EVERY doc of a shard must remove its docs/postings
    partitions: dynamic partition overwrite only replaces partitions
    present in the written frame, so an emptied shard's stale partition
    needs an explicit delete or the docs silently survive."""
    from document_retrieval_system_spark.operators.index_build import (
        IndexReader,
        add_doc_identity,
        build_index,
    )
    from document_retrieval_system_spark.sources.corpus import PAGES_DDL, gen_pages_pandas
    from document_retrieval_system_spark.sources.tables import delete_documents

    idx = tempfile.mkdtemp(prefix="drs_delshard_idx_")
    try:
        pdf = gen_pages_pandas(40)
        build_index(spark, spark.createDataFrame(pdf, PAGES_DDL), idx, n_shards=2)
        by_shard = {
            r["url"]: r["shard"]
            for r in add_doc_identity(
                spark.createDataFrame(pdf, PAGES_DDL), 2
            ).select("url", "shard").collect()
        }
        victims = [u for u, s in by_shard.items() if s == 0]
        assert victims and len(victims) < len(pdf)
        delete_documents(spark, idx, victims)
        reader = IndexReader(spark, idx)
        remaining = {r["url"] for r in reader.docs().select("url").collect()}
        assert not (set(victims) & remaining), "deleted docs survived"
        assert reader.docs().filter("shard = 0").count() == 0
        assert reader.postings().filter("shard = 0").count() == 0
        assert reader.docs().count() == len(pdf) - len(victims)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
