"""S6 DOCX + S7 XLSX sources (reference docx_parser.py:19-101,
xlsx_parser.py:19-107) — pure-stdlib OOXML readers (zipfile + ElementTree;
both formats are zip archives of XML parts, no third-party lib needed).

Reference semantics reproduced:

DOCX (docx_parser.py):
- content = '\\n\\n'.join(non-empty body paragraphs, then per-table rows
  as ' | '.join of non-empty stripped cell texts) (:79-92);
- title = core-properties Title when non-empty else basename (:66-69);
- metadata: title/author/subject/keywords/category/last_modified_by +
  created/modified as str(datetime) (:44-64), paragraph_count (body-level
  paragraphs, python-docx's doc.paragraphs) and table_count (:95-96);
- {} on parse failure (:100-101).

XLSX (xlsx_parser.py):
- per sheet: a '工作表: <name>' line then rows as ' | '.join of cell
  strings (missing cells = ''), all-empty rows skipped (:68-98);
- caps: first 1000 rows / 100 columns per sheet (:77-84);
- metadata: sheet_names/sheet_count + workbook properties (:43-63);
- numbers render via str() of the parsed value (openpyxl data_only=True
  gives int/float; '1' -> '1', '1.5' -> '1.5').

Honest subset notes: no password-protected archives, no .doc/.xls legacy
formats, shared formulas render their cached <v> value only (same as
data_only=True), and created/modified keep ISO formatting (python-docx
prints the same for UTC W3CDTF stamps).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
import zipfile
from datetime import datetime
from io import BytesIO

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_DC = "{http://purl.org/dc/elements/1.1/}"
_CP = "{http://schemas.openxmlformats.org/package/2006/metadata/core-properties}"
_DCT = "{http://purl.org/dc/terms/}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _core_properties(zf: zipfile.ZipFile) -> dict[str, str]:
    try:
        root = ET.fromstring(zf.read("docProps/core.xml"))
    except KeyError:
        return {}
    out: dict[str, str] = {}

    def grab(tag: str, key: str, is_date: bool = False) -> None:
        el = root.find(tag)
        if el is not None and el.text:
            text = el.text
            if is_date:
                try:
                    text = str(datetime.fromisoformat(text.replace("Z", "+00:00")))
                except ValueError:
                    pass
            out[key] = text

    grab(f"{_DC}title", "title")
    grab(f"{_DC}creator", "author")
    grab(f"{_DCT}created", "created", is_date=True)
    grab(f"{_DCT}modified", "modified", is_date=True)
    grab(f"{_DC}subject", "subject")
    grab(f"{_CP}keywords", "keywords")
    grab(f"{_DC}description", "comments")
    grab(f"{_CP}category", "category")
    grab(f"{_CP}lastModifiedBy", "last_modified_by")
    return out


def _para_text(p: ET.Element) -> str:
    """python-docx Paragraph.text: run texts joined, tab -> \\t, br -> \\n."""
    parts: list[str] = []
    for el in p.iter():
        if el.tag == f"{_W}t":
            parts.append(el.text or "")
        elif el.tag == f"{_W}tab":
            parts.append("\t")
        elif el.tag in (f"{_W}br", f"{_W}cr"):
            parts.append("\n")
    return "".join(parts)


def extract_docx(data: bytes, path: str = "") -> dict:
    """DocxParser.parse parity surface: {'title','content','metadata'}."""
    try:
        zf = zipfile.ZipFile(BytesIO(data))
        body = ET.fromstring(zf.read("word/document.xml")).find(f"{_W}body")
        meta = _core_properties(zf)
        result = {"title": os.path.basename(path), "content": "", "metadata": meta}
        if meta.get("title"):
            result["title"] = meta["title"]

        # body-level paragraphs (python-docx doc.paragraphs excludes
        # paragraphs nested in tables) and body-level tables
        body_paras = [] if body is None else body.findall(f"{_W}p")
        tables = [] if body is None else body.findall(f"{_W}tbl")
        parts = [t for t in (_para_text(p) for p in body_paras) if t.strip()]
        for tbl in tables:
            for tr in tbl.findall(f"{_W}tr"):
                cells = []
                for tc in tr.findall(f"{_W}tc"):
                    cell_text = "\n".join(
                        _para_text(p) for p in tc.findall(f"{_W}p")
                    ).strip()
                    if cell_text:
                        cells.append(cell_text)
                if cells:
                    parts.append(" | ".join(cells))
        result["content"] = "\n\n".join(parts)
        result["metadata"]["paragraph_count"] = len(body_paras)
        result["metadata"]["table_count"] = len(tables)
        return result
    except Exception:
        return {}


_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    m = _CELL_REF.match(ref)
    if not m:
        return 1
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n


def _fmt_number(raw: str) -> str:
    """str() of what openpyxl would parse: int when integral, float else."""
    try:
        f = float(raw)
    except ValueError:
        return raw
    if f.is_integer() and "e" not in raw.lower() and "." not in raw:
        return str(int(f))
    return str(f)


def extract_xlsx(data: bytes, path: str = "",
                 max_rows: int = 1000, max_cols: int = 100) -> dict:
    """XlsxParser.parse parity surface (row/col caps included)."""
    try:
        zf = zipfile.ZipFile(BytesIO(data))
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.findall(f"{_PKG_REL}Relationship")
        }
        shared: list[str] = []
        try:
            sroot = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sroot.findall(f"{_S}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
        except KeyError:
            pass

        meta = _core_properties(zf)
        # xlsx property names differ: creator, not author (:54)
        if "author" in meta:
            meta["creator"] = meta.pop("author")
        sheets = [
            (el.get("name"), el.get(f"{_R}id"))
            for el in wb.find(f"{_S}sheets").findall(f"{_S}sheet")
        ]
        metadata = {"sheet_names": [n for n, _ in sheets], "sheet_count": len(sheets)}
        metadata.update(meta)
        result = {
            "title": meta.get("title") or os.path.basename(path),
            "content": "",
            "metadata": metadata,
        }

        content_parts: list[str] = []
        for name, rid in sheets:
            target = rid_to_target.get(rid, "")
            part = "xl/" + target.lstrip("/") if not target.startswith("xl/") else target
            sheet = ET.fromstring(zf.read(part))
            content_parts.append(f"工作表: {name}")
            cells: dict[int, dict[int, str]] = {}
            max_col_seen = 0
            for row in sheet.iter(f"{_S}row"):
                r = int(row.get("r", "0") or 0)
                if r == 0 or r > max_rows:
                    # openpyxl sheet.max_column is sheet-wide: cells past
                    # the row cap still widen the padding
                    for c in row.findall(f"{_S}c"):
                        col = _col_index(c.get("r", "A1"))
                        if col <= max_cols:
                            max_col_seen = max(max_col_seen, col)
                    continue
                for c in row.findall(f"{_S}c"):
                    col = _col_index(c.get("r", "A1"))
                    if col > max_cols:
                        continue
                    # reference pads to openpyxl's max_column, which counts
                    # every cell PRESENT in the XML — styled-but-valueless
                    # trailing cells included (value extraction may still
                    # yield "")
                    max_col_seen = max(max_col_seen, col)
                    t = c.get("t", "n")
                    if t == "inlineStr":
                        is_el = c.find(f"{_S}is")
                        val = "" if is_el is None else "".join(
                            x.text or "" for x in is_el.iter(f"{_S}t")
                        )
                    else:
                        v = c.find(f"{_S}v")
                        raw = "" if v is None or v.text is None else v.text
                        if t == "s":
                            val = shared[int(raw)] if raw else ""
                        elif t in ("str", "b"):
                            val = raw if t == "str" else ("True" if raw == "1" else "False")
                        else:
                            val = _fmt_number(raw) if raw else ""
                    if val != "":
                        cells.setdefault(r, {})[col] = val
            rows_data = []
            for r in sorted(cells):
                row_vals = [cells[r].get(c, "") for c in range(1, max_col_seen + 1)]
                if any(v.strip() for v in row_vals):
                    rows_data.append(" | ".join(row_vals))
            content_parts.append("\n".join(rows_data))
        result["content"] = "\n\n".join(content_parts)
        return result
    except Exception:
        return {}


# ---------------------------------------------------------------------------
# fixture writers: minimal well-formed OOXML any real library also opens
# ---------------------------------------------------------------------------

_CT_DOCX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>
</Types>"""

_RELS_ROOT_DOCX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>
</Relationships>"""


def _core_xml(title: str | None, author: str | None) -> str:
    bits = []
    if title:
        bits.append(f"<dc:title>{title}</dc:title>")
    if author:
        bits.append(f"<dc:creator>{author}</dc:creator>")
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:dcterms="http://purl.org/dc/terms/" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
        + "".join(bits)
        + "</cp:coreProperties>"
    )


def make_simple_docx(paragraphs: list[str], tables: list[list[list[str]]] | None = None,
                     title: str | None = None, author: str | None = None,
                     images: list[bytes] | None = None) -> bytes:
    def esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{esc(p)}</w:t></w:r></w:p>'
        for p in paragraphs
    )
    for tbl in tables or []:
        rows = "".join(
            "<w:tr>" + "".join(
                f'<w:tc><w:p><w:r><w:t xml:space="preserve">{esc(c)}</w:t></w:r></w:p></w:tc>'
                for c in row
            ) + "</w:tr>"
            for row in tbl
        )
        body += f"<w:tbl>{rows}</w:tbl>"
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT_DOCX)
        zf.writestr("_rels/.rels", _RELS_ROOT_DOCX)
        zf.writestr("word/document.xml", doc)
        zf.writestr("docProps/core.xml", _core_xml(title, author))
        if images:
            rels = "".join(
                f'<Relationship Id="rIdImg{i+1}" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
                'relationships/image" '
                f'Target="media/image{i+1}.png"/>'
                for i in range(len(images))
            )
            zf.writestr(
                "word/_rels/document.xml.rels",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                f'package/2006/relationships">{rels}</Relationships>',
            )
            for i, blob in enumerate(images):
                zf.writestr(f"word/media/image{i+1}.png", blob)
    return buf.getvalue()


def make_simple_xlsx(sheets: dict[str, list[list[object]]],
                     title: str | None = None,
                     charts: dict[str, list[tuple[str, str]]] | None = None) -> bytes:
    """``charts``: sheet name -> [(chart_tag, title)], e.g.
    ("barChart", "Sales") — written as the full OOXML part chain
    (sheet rels -> drawing -> drawing rels -> chart part), the structure
    the S8 chart extractor walks."""
    def esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def col_letter(n: int) -> str:
        s = ""
        while n:
            n, r = divmod(n - 1, 26)
            s = chr(65 + r) + s
        return s

    names = list(sheets)
    sheet_entries = "".join(
        f'<sheet name="{esc(n)}" sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, n in enumerate(names)
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i+1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i+1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    ct_overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>'
        + ct_overrides + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>'
        "</Relationships>"
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("docProps/core.xml", _core_xml(title, None))
        for i, n in enumerate(names):
            rows_xml = []
            for ri, row in enumerate(sheets[n], start=1):
                cells_xml = []
                for ci, val in enumerate(row, start=1):
                    ref = f"{col_letter(ci)}{ri}"
                    if val is None:
                        # styled-but-valueless cell: present in the XML with
                        # no <v> — openpyxl's max_column counts it
                        cells_xml.append(f'<c r="{ref}"/>')
                        continue
                    if val == "":
                        continue
                    if isinstance(val, (int, float)):
                        cells_xml.append(f'<c r="{ref}"><v>{val}</v></c>')
                    else:
                        cells_xml.append(
                            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                            f"{esc(str(val))}</t></is></c>"
                        )
                if cells_xml:
                    rows_xml.append(f'<row r="{ri}">{"".join(cells_xml)}</row>')
            has_charts = bool((charts or {}).get(n))
            drawing_el = '<drawing r:id="rIdD1"/>' if has_charts else ""
            ns_r = (' xmlns:r="http://schemas.openxmlformats.org/'
                    'officeDocument/2006/relationships"' if has_charts else "")
            sheet_xml = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
                f"{ns_r}>"
                f"<sheetData>{''.join(rows_xml)}</sheetData>{drawing_el}</worksheet>"
            )
            zf.writestr(f"xl/worksheets/sheet{i+1}.xml", sheet_xml)
            if has_charts:
                zf.writestr(
                    f"xl/worksheets/_rels/sheet{i+1}.xml.rels",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                    '<Relationship Id="rIdD1" '
                    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/drawing" '
                    f'Target="../drawings/drawing{i+1}.xml"/></Relationships>',
                )
                chart_rels = []
                for ci, (tag, ctitle) in enumerate(charts[n]):
                    part = f"xl/charts/chart_s{i+1}_{ci+1}.xml"
                    chart_rels.append(
                        f'<Relationship Id="rIdC{ci+1}" '
                        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/chart" '
                        f'Target="../charts/chart_s{i+1}_{ci+1}.xml"/>'
                    )
                    zf.writestr(
                        part,
                        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                        '<c:chartSpace xmlns:c="http://schemas.openxmlformats.org/drawingml/2006/chart" '
                        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
                        "<c:chart>"
                        f"<c:title><c:tx><c:rich><a:p><a:r><a:t>{esc(ctitle)}</a:t>"
                        "</a:r></a:p></c:rich></c:tx></c:title>"
                        f"<c:plotArea><c:layout/><c:{tag}/></c:plotArea>"
                        "</c:chart></c:chartSpace>",
                    )
                zf.writestr(
                    f"xl/drawings/drawing{i+1}.xml",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<xdr:wsDr xmlns:xdr="http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing"/>',
                )
                zf.writestr(
                    f"xl/drawings/_rels/drawing{i+1}.xml.rels",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                    + "".join(chart_rels) + "</Relationships>",
                )
    return buf.getvalue()
