"""S5 PDF source (pdf_parser.py:20-75): extractor semantics + the
binaryFile-dispatch ingestion path, mirroring test_file_ingestion_s1_s3."""

import shutil
import tempfile

from document_retrieval_system_spark.sources.pdf_extract import (
    extract_pdf,
    make_simple_pdf,
)


def test_extract_pdf_pages_joined_and_metadata():
    data = make_simple_pdf(
        [["first page line one", "line two"], ["second page text"]],
        title="Quarterly Report",
    )
    res = extract_pdf(data, "/tmp/report.pdf")
    # '\n\n' page join, pages in order (pdf_parser.py:57-64)
    assert res["content"] == "first page line one\nline two\n\nsecond page text"
    # metadata Title wins over basename (:50-53)
    assert res["title"] == "Quarterly Report"
    assert res["metadata"]["page_count"] == 2


def test_extract_pdf_basename_title_and_empty_pages():
    data = make_simple_pdf([["only content"], []])  # second page empty
    res = extract_pdf(data, "/docs/notes.pdf")
    assert res["title"] == "notes.pdf"
    assert res["content"] == "only content"  # empty page skipped, no join
    assert res["metadata"]["page_count"] == 2


def test_extract_pdf_flate_streams_and_escapes():
    tricky = ["parens (inside) kept", "back\\slash", "unicode café"]
    data = make_simple_pdf([tricky], compress=True)
    res = extract_pdf(data, "x.pdf")
    assert res["content"] == "\n".join(tricky)


def test_extract_pdf_garbage_returns_empty_dict():
    assert extract_pdf(b"\x00\x01 not a pdf", "bad.pdf") == {}
    # reference returns {} on any parse failure (:74-75)
    assert extract_pdf(b"%PDF-1.4 truncated", "trunc.pdf").get("content", "") == ""


def test_file_ingestion_s5(spark, tmp_path):
    from document_retrieval_system_spark.operators.index_build import (
        IndexReader,
        build_index,
    )
    from document_retrieval_system_spark.operators.search import bm25_search
    from document_retrieval_system_spark.sources.tables import read_pages_from_files

    d = tmp_path / "files"
    d.mkdir()
    (d / "report.pdf").write_bytes(
        make_simple_pdf(
            [["annual revenue grew strongly"], ["compression ratio improved"]],
            compress=True,
        )
    )
    (d / "note.txt").write_text("plain note", "utf-8")

    pages = read_pages_from_files(spark, str(d), default_lang="en")
    rows = {r["url"].rsplit("/", 1)[-1]: r for r in pages.collect()}
    assert rows["report.pdf"]["html"] is None
    assert (
        rows["report.pdf"]["text"]
        == "annual revenue grew strongly\n\ncompression ratio improved"
    )

    idx = tempfile.mkdtemp(prefix="drs_pdf_idx_")
    try:
        build_index(spark, pages, idx, n_shards=2)
        hits = bm25_search(IndexReader(spark, idx), "compression ratio", "en", 10, 0.0)
        assert any(r["url"].endswith("report.pdf") for r in hits.collect())
    finally:
        shutil.rmtree(idx, ignore_errors=True)
