"""S6 DOCX / S7 XLSX sources (docx_parser.py:19-101, xlsx_parser.py:19-107):
pure-stdlib OOXML extraction semantics + the ingestion dispatch."""

import shutil
import tempfile

from document_retrieval_system_spark.sources.office_extract import (
    extract_docx,
    extract_xlsx,
    make_simple_docx,
    make_simple_xlsx,
)


def test_docx_paragraphs_tables_and_metadata():
    data = make_simple_docx(
        ["First body paragraph.", "   ", "Second paragraph text."],
        tables=[[["h1", "h2"], ["a", ""], ["", ""]]],
        title="Design Doc", author="Kim",
    )
    res = extract_docx(data, "/x/design.docx")
    # non-empty paragraphs then table rows of ' | '-joined non-empty cells
    # (docx_parser.py:79-92); all-empty rows dropped
    assert res["content"] == (
        "First body paragraph.\n\nSecond paragraph text.\n\nh1 | h2\n\na"
    )
    assert res["title"] == "Design Doc"  # metadata title wins (:66-69)
    assert res["metadata"]["author"] == "Kim"
    assert res["metadata"]["paragraph_count"] == 3  # includes blank para (:95)
    assert res["metadata"]["table_count"] == 1


def test_docx_basename_title_and_garbage():
    res = extract_docx(make_simple_docx(["only text here"]), "/d/memo.docx")
    assert res["title"] == "memo.docx"
    assert extract_docx(b"not a zip", "bad.docx") == {}


def test_xlsx_sheets_rows_and_caps():
    data = make_simple_xlsx(
        {
            "Sales": [["region", "amount"], ["east", 1500], [], ["west", 2.5]],
            "Empty": [],
        },
        title="Q2 Numbers",
    )
    res = extract_xlsx(data, "/x/q2.xlsx")
    # the header and the rows block are SEPARATE content_parts joined by
    # '\n\n' (xlsx_parser.py:70,96,100); an empty sheet contributes an
    # empty rows part, leaving a trailing join
    assert res["content"] == (
        "工作表: Sales\n\nregion | amount\neast | 1500\nwest | 2.5\n\n工作表: Empty\n\n"
    )
    assert res["title"] == "Q2 Numbers"
    assert res["metadata"]["sheet_names"] == ["Sales", "Empty"]
    assert res["metadata"]["sheet_count"] == 2


def test_xlsx_row_col_caps():
    rows = [[f"r{r}c{c}" for c in range(1, 6)] for r in range(1, 11)]
    data = make_simple_xlsx({"big": rows})
    res = extract_xlsx(data, "big.xlsx", max_rows=3, max_cols=2)
    assert res["content"] == (
        "工作表: big\n\nr1c1 | r1c2\nr2c1 | r2c2\nr3c1 | r3c2"
    )
    assert extract_xlsx(b"junk", "bad.xlsx") == {}


def test_file_ingestion_s6_s7(spark, tmp_path):
    from document_retrieval_system_spark.operators.index_build import (
        IndexReader,
        build_index,
    )
    from document_retrieval_system_spark.operators.search import bm25_search
    from document_retrieval_system_spark.sources.tables import read_pages_from_files

    d = tmp_path / "files"
    d.mkdir()
    (d / "spec.docx").write_bytes(
        make_simple_docx(["the narwhal architecture specification document"])
    )
    (d / "kpi.xlsx").write_bytes(
        make_simple_xlsx({"metrics": [["flamingo throughput", 42]]})
    )

    pages = read_pages_from_files(spark, str(d), default_lang="en")
    rows = {r["url"].rsplit("/", 1)[-1]: r for r in pages.collect()}
    assert rows["spec.docx"]["text"] == "the narwhal architecture specification document"
    assert rows["kpi.xlsx"]["text"] == "工作表: metrics\n\nflamingo throughput | 42"

    idx = tempfile.mkdtemp(prefix="drs_office_idx_")
    try:
        build_index(spark, pages, idx, n_shards=2)
        reader = IndexReader(spark, idx)
        assert any(
            r["url"].endswith("spec.docx")
            for r in bm25_search(reader, "narwhal architecture", "en", 10, 0.0).collect()
        )
        assert any(
            r["url"].endswith("kpi.xlsx")
            for r in bm25_search(reader, "flamingo", "en", 10, 0.0).collect()
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_xlsx_pads_to_styled_valueless_trailing_cells():
    """openpyxl sheet.max_column counts cells PRESENT in the XML even when
    their value is empty/None — rows must pad with trailing ' | '
    separators to that width, not to the widest non-empty value."""
    from document_retrieval_system_spark.sources.office_extract import (
        extract_xlsx,
        make_simple_xlsx,
    )

    # col 4 exists only as a valueless <c/> cell
    data = make_simple_xlsx({"S1": [["a", "b", "c", None], ["d", "e"]]})
    res = extract_xlsx(data, "t.xlsx")
    lines = res["content"].split("\n\n")[1].splitlines()
    assert lines[0] == "a | b | c | "
    assert lines[1] == "d | e |  | "
