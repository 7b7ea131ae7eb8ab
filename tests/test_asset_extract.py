"""S8 asset extraction: reference-semantics goldens per format plus the
distributed binaryFile->assets surface."""

from __future__ import annotations

from document_retrieval_system_spark.sources.asset_extract import (
    assets_from_dir,
    extract_docx_images,
    extract_html_images,
    extract_pdf_images,
    extract_xlsx_charts,
)
from document_retrieval_system_spark.sources.office_extract import (
    make_simple_docx,
    make_simple_xlsx,
)
from document_retrieval_system_spark.sources.pdf_extract import (
    extract_pdf,
    make_simple_pdf,
)

HTML = """<html><body>
<img src="https://cdn.x.com/a.png" alt="A pic">
<img src="/rel/b.jpg" title="B title">
<img src="data:image/png;base64,AAAA" alt="data uri skipped">
<img alt="no src at all">
<img src="relative.png" alt="relative skipped">
<p><img src="http://x.com/c.gif"></p>
</body></html>"""


def test_html_images_reference_filter_and_fallbacks():
    """html_parser.py:182-190: http|/ filter, alt<->title fallbacks."""
    got = extract_html_images(HTML)
    assert got == [
        {"src": "https://cdn.x.com/a.png", "alt": "A pic", "title": "A pic"},
        {"src": "/rel/b.jpg", "alt": "B title", "title": "B title"},
        {"src": "http://x.com/c.gif", "alt": "", "title": ""},
    ]
    assert extract_html_images("") == []


def test_docx_images_rel_order_and_bytes():
    """docx_parser.py:126-141: rels with 'image' targets, file order,
    image_{i}.{ext} naming, raw bytes."""
    blobs = [b"\x89PNG-one" * 3, b"\x89PNG-two" * 5]
    data = make_simple_docx(["text body"], images=blobs)
    got = extract_docx_images(data)
    assert [(d["name"], d["ext"], d["n_bytes"]) for d in got] == [
        ("image_1.png", "png", len(blobs[0])),
        ("image_2.png", "png", len(blobs[1])),
    ]
    assert [d["data"] for d in got] == blobs
    # a docx without images (no document rels part at all) yields []
    assert extract_docx_images(make_simple_docx(["plain"])) == []
    assert extract_docx_images(b"not a zip") == []


def test_pdf_images_from_page_resources():
    """pdf_parser.py:100-114: per-page /XObject images, bytes undecoded;
    text extraction must be unaffected by the resource dict."""
    blob = bytes(range(48))
    pdf = make_simple_pdf([["page one text"], ["page two"]], title="T",
                          images=[blob])
    got = extract_pdf_images(pdf)
    assert len(got) == 1
    assert got[0]["page"] == 1
    assert got[0]["data"] == blob
    assert got[0]["n_bytes"] == len(blob)
    assert extract_pdf(pdf, "t.pdf")["content"] == "page one text\n\npage two"
    assert extract_pdf_images(make_simple_pdf([["no images"]])) == []
    assert extract_pdf_images(b"%not-pdf") == []


def test_xlsx_charts_type_and_title():
    """xlsx_parser.py:128-141: per-sheet chart class name + title, with
    the Chart {i} fallback when the title part is absent."""
    data = make_simple_xlsx(
        {"Revenue": [["q", 1]], "Empty": [["x"]]},
        charts={"Revenue": [("barChart", "Sales by Q"), ("pieChart", "")]},
    )
    got = extract_xlsx_charts(data)
    assert got == {
        "Revenue": [
            {"type": "BarChart", "title": "Sales by Q"},
            {"type": "PieChart", "title": "Chart 2"},
        ]
    }
    assert extract_xlsx_charts(make_simple_xlsx({"S": [["a"]]})) == {}
    assert extract_xlsx_charts(b"junk") == {}


def test_assets_from_dir_routes_all_formats(spark, tmp_path):
    (tmp_path / "a.html").write_text(HTML, encoding="utf-8")
    (tmp_path / "b.docx").write_bytes(
        make_simple_docx(["d"], images=[b"IMG" * 4])
    )
    (tmp_path / "c.pdf").write_bytes(
        make_simple_pdf([["t"]], images=[b"\x05\x06" * 8])
    )
    (tmp_path / "d.xlsx").write_bytes(
        make_simple_xlsx({"S1": [["v"]]}, charts={"S1": [("lineChart", "L")]})
    )
    (tmp_path / "e.txt").write_text("no assets here")

    rows = assets_from_dir(spark, str(tmp_path)).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert len(by_kind["html_image"]) == 3
    assert by_kind["docx_image"][0]["payload"] == b"IMG" * 4
    assert by_kind["pdf_image"][0]["title"] == "page 1"
    assert by_kind["xlsx_chart"][0]["alt"] == "LineChart"
    assert by_kind["xlsx_chart"][0]["title"] == "L"
    assert set(by_kind) == {"html_image", "docx_image", "pdf_image", "xlsx_chart"}


def test_pdf_image_payload_eol_bytes_round_trip():
    """/Length bounds the stream, so payloads whose last bytes are
    0x0A/0x0D round-trip byte-exact (an endstream+rstrip slice would
    silently shorten them)."""
    from document_retrieval_system_spark.sources.asset_extract import (
        _mini_pdf_images,
    )

    blobs = [b"IMGDATA\n\n", b"\r\n", b"x\r", bytes(range(9, 14)) + b"\n"]
    pdf = make_simple_pdf([["p"]], images=blobs)
    got = _mini_pdf_images(pdf)
    assert [d["data"] for d in got] == blobs
    assert [d["n_bytes"] for d in got] == [len(b) for b in blobs]


def test_html_image_ext_from_url_path_only(spark, tmp_path):
    """ext derives from the URL path component: domain dots and
    query/fragment strings must not leak into it."""
    html = """<html><body>
    <img src="https://cdn.example.com/image" alt="no ext">
    <img src="https://x.com/a.png?w=200" alt="query">
    <img src="/img/b.jpeg#frag" alt="frag">
    <img src="/plain.gif" alt="plain">
    </body></html>"""
    (tmp_path / "x.html").write_text(html, encoding="utf-8")
    rows = assets_from_dir(spark, str(tmp_path)).orderBy("asset_no").collect()
    assert [r["ext"] for r in rows] == ["", "png", "jpeg", "gif"]
