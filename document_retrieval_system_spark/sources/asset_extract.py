"""S8: image / chart asset extraction (the reference's optional
``extract_images`` / ``extract_charts`` surfaces).

Reference behavior reproduced, per format:

- HTML (html_parser.py:157-201): list ``<img src>`` metadata — src kept
  only when it starts with ``http`` or ``/``; ``alt`` falls back to
  ``title`` and vice versa.  Pure DOM harvesting — no decode.
- DOCX (docx_parser.py:103-147): iterate the document part's
  relationships in file order; every rel whose target mentions "image"
  yields the target part's bytes, named ``image_{i}.{ext}``.
- PDF (pdf_parser.py:77-120): per page, the /Resources /XObject entries
  with /Subtype /Image yield the (undecoded) stream bytes; extension
  derived from the stream filter (DCTDecode -> jpg, FlateDecode/none ->
  png/raw), mirroring PyPDF2's ``page.images`` subtype naming.  Uses
  PyPDF2 when importable (the reference's backend), else the same
  pure-stdlib subset reader as S5.
- XLSX (xlsx_parser.py:109-148): per sheet, chart type + title — the
  reference reads openpyxl ``sheet._charts`` (class name + title text);
  here the sheet->drawing->chart relationship chain is followed through
  the OOXML parts and the plotArea's chart element maps to the same
  class names (barChart -> BarChart, ...).

None of these decode pixels — the reference doesn't either (it writes
raw bytes to files); payloads flow into the multimodal binary-column
pipeline (sources/multimodal.py) for any downstream feature work.
"""

from __future__ import annotations

import posixpath
import re
import zipfile
from io import BytesIO
from urllib.parse import urlsplit

import xml.etree.ElementTree as ET

_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CHART_NS = "{http://schemas.openxmlformats.org/drawingml/2006/chart}"
_DRAW_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_CHART_CLASS = {
    "barChart": "BarChart", "bar3DChart": "BarChart3D",
    "lineChart": "LineChart", "line3DChart": "LineChart3D",
    "pieChart": "PieChart", "pie3DChart": "PieChart3D",
    "areaChart": "AreaChart", "scatterChart": "ScatterChart",
    "doughnutChart": "DoughnutChart", "radarChart": "RadarChart",
    "bubbleChart": "BubbleChart", "stockChart": "StockChart",
}


def extract_html_images(html: str) -> list[dict]:
    """html_parser.py:157-201: <img src> metadata, http|/ sources only."""
    from document_retrieval_system_spark.sources.minidom import parse_html

    soup = parse_html(html or "")
    out: list[dict] = []
    for img in soup.find_all("img", {"src": True}):
        src = img.get("src", "") or ""
        alt = img.get("alt", "") or ""
        title = img.get("title", "") or ""
        if src and (src.startswith("http") or src.startswith("/")):
            out.append({"src": src, "alt": alt or title, "title": title or alt})
    return out


def extract_docx_images(data: bytes) -> list[dict]:
    """docx_parser.py:103-147: document-part rels with 'image' targets."""
    try:
        zf = zipfile.ZipFile(BytesIO(data))
        rels = ET.fromstring(zf.read("word/_rels/document.xml.rels"))
    except Exception:
        return []
    out: list[dict] = []
    for rel in rels.findall(f"{_PKG_REL}Relationship"):
        target = rel.get("Target") or ""
        if "image" not in target:
            continue
        # targets are relative to word/ (may climb with ../)
        part = posixpath.normpath(posixpath.join("word", target)).lstrip("/")
        try:
            blob = zf.read(part)
        except KeyError:
            continue
        ext = target.rsplit(".", 1)[-1] if "." in target else "bin"
        out.append({
            "name": f"image_{len(out) + 1}.{ext}", "ext": ext,
            "n_bytes": len(blob), "data": blob,
        })
    return out


_XOBJ_DICT_RE = re.compile(rb"/XObject\s*<<(.*?)>>", re.S)
_XOBJ_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")


def _pdf_image_ext(head: bytes) -> str:
    if b"/DCTDecode" in head:
        return "jpg"
    if b"/JPXDecode" in head:
        return "jp2"
    if b"/FlateDecode" in head:
        return "png"
    return "raw"


def extract_pdf_images(data: bytes) -> list[dict]:
    """pdf_parser.py:77-120: per-page image XObjects, bytes undecoded."""
    try:
        try:
            from document_retrieval_system_spark.sources.pdf_extract import _pypdf
        except Exception:
            _pypdf = None
        if _pypdf is not None:
            import io

            reader = _pypdf.PdfReader(io.BytesIO(data))
            out = []
            for page_num, page in enumerate(reader.pages):
                for img in page.images:
                    out.append({
                        "page": page_num + 1,
                        "name": img.name,
                        "ext": (img.name.rsplit(".", 1)[-1]
                                if "." in img.name else "raw"),
                        "n_bytes": len(img.data), "data": img.data,
                    })
            return out
        return _mini_pdf_images(data)
    except Exception:
        return []


def _mini_pdf_images(data: bytes) -> list[dict]:
    from document_retrieval_system_spark.sources.pdf_extract import _MiniPdf

    mini = _MiniPdf(data)
    out: list[dict] = []
    # page-tree order + /Length-bounded stream slicing shared with the
    # S5 text extractor — one traversal, one byte-bound implementation
    for page_no, pnum in enumerate(mini.page_numbers(), start=1):
        body = mini._resolve(pnum)
        xm = _XOBJ_DICT_RE.search(body)
        if not xm:
            continue
        for name, ref in _XOBJ_REF_RE.findall(xm.group(1)):
            obj = mini._resolve(int(ref))
            if b"/Subtype" not in obj or b"/Image" not in obj:
                continue
            got = mini.raw_stream_of(obj)
            if got is None:
                continue
            head, blob = got
            ext = _pdf_image_ext(head)
            # raw stream bytes, undecoded (parity: the reference writes
            # xobj.data without decoding either)
            out.append({
                "page": page_no,
                "name": f"{name.decode('ascii')}.{ext}", "ext": ext,
                "n_bytes": len(blob), "data": blob,
            })
    return out


def extract_xlsx_charts(data: bytes) -> dict:
    """xlsx_parser.py:109-148: {sheet_name: [{'type', 'title'}, ...]}."""
    try:
        zf = zipfile.ZipFile(BytesIO(data))
        _S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
        _R = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
              "relationships}")
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        wb_rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            rel.get("Id"): rel.get("Target")
            for rel in wb_rels.findall(f"{_PKG_REL}Relationship")
        }
    except Exception:
        return {}

    def rels_of(part: str) -> list[str]:
        d, f = posixpath.split(part)
        try:
            root = ET.fromstring(zf.read(posixpath.join(d, "_rels", f + ".rels")))
        except KeyError:
            return []
        out = []
        for rel in root.findall(f"{_PKG_REL}Relationship"):
            t = posixpath.normpath(posixpath.join(d, rel.get("Target") or ""))
            out.append((rel.get("Type") or "", t.lstrip("/")))
        return out

    chart_data: dict = {}
    for el in wb.find(f"{_S}sheets").findall(f"{_S}sheet"):
        name = el.get("name")
        target = rid_to_target.get(el.get(f"{_R}id"), "")
        sheet_part = ("xl/" + target.lstrip("/")
                      if not target.startswith("xl/") else target)
        charts: list[dict] = []
        for rtype, t in rels_of(sheet_part):
            if not rtype.endswith("/drawing"):
                continue
            for rtype2, chart_part in rels_of(t):
                if not rtype2.endswith("/chart"):
                    continue
                try:
                    croot = ET.fromstring(zf.read(chart_part))
                except KeyError:
                    continue
                ctype = "Chart"
                plot = croot.find(f".//{_CHART_NS}plotArea")
                if plot is not None:
                    for child in plot:
                        tag = child.tag.rsplit("}", 1)[-1]
                        if tag in _CHART_CLASS:
                            ctype = _CHART_CLASS[tag]
                            break
                title_texts = [
                    (t_el.text or "")
                    for t_el in croot.findall(
                        f".//{_CHART_NS}title//{_DRAW_NS}t")
                ]
                title = "".join(title_texts) or f"Chart {len(charts) + 1}"
                charts.append({"type": ctype, "title": title})
        if charts:
            chart_data[name] = charts
    return chart_data


# ---------------------------------------------------------------------------
# distributed surface: binaryFile scan -> assets table
# ---------------------------------------------------------------------------

ASSET_SCHEMA = (
    "url string, kind string, asset_no int, name string, alt string, "
    "title string, ext string, n_bytes long, payload binary"
)


def extract_assets(files) -> "DataFrame":  # noqa: F821 - pyspark DataFrame
    """S8 over a recursive binaryFile scan: route by extension inside one
    Arrow map stage (asset bytes never transit the driver), one output
    row per asset.  Payloads are opaque binary — feed them to the
    multimodal pipeline (sources/multimodal.py) for feature work."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for r in pdf.itertuples(index=False):
                p = (r.path or "").lower()
                content = bytes(r.content) if r.content is not None else b""
                if p.endswith((".html", ".htm")):
                    text = content.decode("utf-8", errors="ignore")
                    for i, d in enumerate(extract_html_images(text)):
                        # ext from the URL *path* component only — domain
                        # dots and ?query/#fragment must not leak into it
                        ext = posixpath.splitext(
                            urlsplit(d["src"]).path)[1].lstrip(".")
                        rows.append((r.path, "html_image", i, d["src"],
                                     d["alt"], d["title"], ext, None, None))
                elif p.endswith(".docx"):
                    for i, d in enumerate(extract_docx_images(content)):
                        rows.append((r.path, "docx_image", i, d["name"], "",
                                     "", d["ext"], d["n_bytes"], d["data"]))
                elif p.endswith(".pdf"):
                    for i, d in enumerate(extract_pdf_images(content)):
                        rows.append((r.path, "pdf_image", i, d["name"], "",
                                     f"page {d['page']}", d["ext"],
                                     d["n_bytes"], d["data"]))
                elif p.endswith(".xlsx"):
                    i = 0
                    for sheet, cs in extract_xlsx_charts(content).items():
                        for c in cs:
                            rows.append((r.path, "xlsx_chart", i, sheet,
                                         c["type"], c["title"], "", None, None))
                            i += 1
            yield pd.DataFrame(
                rows, columns=["url", "kind", "asset_no", "name", "alt",
                               "title", "ext", "n_bytes", "payload"],
            )

    return files.select("path", "content").mapInPandas(run, ASSET_SCHEMA)


def assets_from_dir(spark, path: str) -> "DataFrame":  # noqa: F821
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return extract_assets(raw)
