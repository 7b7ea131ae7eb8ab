"""S5 PDF source (reference core/datasource/parsers/pdf_parser.py:20-75).

Reference semantics reproduced:
- content = '\\n\\n'.join(per-page extracted text), pages in page-tree
  order, empty pages skipped (pdf_parser.py:57-64);
- title = /Info metadata Title when present and non-empty, else the
  file basename (:36-53);
- metadata keys copied with the leading '/' stripped, plus page_count
  (:46-49, :68).

Backend selection: PyPDF2/pypdf when importable (full-fidelity parity
path, what the reference itself uses); otherwise ``_MiniPdf`` — a
from-scratch pure-stdlib reader for the deterministic subset this repo's
``make_simple_pdf`` writer (and most generated PDFs) produce: FlateDecode
(zlib) or raw content streams, literal/hex strings, Tj/TJ/'/" text
operators, one text line per Tj.  _MiniPdf is honestly a SUBSET: no
encryption, no object streams (xref streams), no CID fonts; out-of-subset
inputs raise and the parse returns {} exactly like the reference's
error path (:74-75).
"""

from __future__ import annotations

import os
import re
import zlib

try:  # the reference's own backend, if present in the environment
    import PyPDF2 as _pypdf  # type: ignore
except ImportError:
    try:
        import pypdf as _pypdf  # type: ignore
    except ImportError:
        _pypdf = None

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_STRING_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _STRING_ESCAPES:
                out += _STRING_ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \ddd
                j = i + 1
                oct_digits = b""
                while j < len(raw) and len(oct_digits) < 3 and raw[j:j + 1].isdigit():
                    oct_digits += raw[j:j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out += c
        i += 1
    return out.decode("utf-8", errors="replace")


_TEXT_TOKEN_RE = re.compile(
    rb"\((?P<lit>(?:[^()\\]|\\.)*)\)\s*(?P<op>Tj|'|\")"  # literal string shows
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<hop>Tj|'|\")"    # hex string shows
    rb"|\[(?P<arr>(?:[^\[\]\\]|\\.)*)\]\s*TJ",            # array show
    re.S,
)
_ARR_STR_RE = re.compile(rb"\((?P<lit>(?:[^()\\]|\\.)*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>")


def _hex_to_text(h: bytes) -> str:
    h = re.sub(rb"\s", b"", h)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("utf-8", errors="replace")


def _content_text(stream: bytes) -> str:
    """One text line per show operator (our writer emits one Tj per
    line); TJ array fragments concatenate within the line."""
    lines: list[str] = []
    for m in _TEXT_TOKEN_RE.finditer(stream):
        if m.group("lit") is not None:
            lines.append(_unescape_literal(m.group("lit")))
        elif m.group("hex") is not None:
            lines.append(_hex_to_text(m.group("hex")))
        else:
            parts = []
            for s in _ARR_STR_RE.finditer(m.group("arr")):
                if s.group("lit") is not None:
                    parts.append(_unescape_literal(s.group("lit")))
                else:
                    parts.append(_hex_to_text(s.group("hex")))
            lines.append("".join(parts))
    return "\n".join(lines)


class _MiniPdf:
    """Pure-stdlib reader for the simple-PDF subset (module docstring)."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF"):
            raise ValueError("not a PDF")
        self.objs: dict[int, bytes] = {
            int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)
        }
        self.trailer = data[data.rfind(b"trailer"):]

    def raw_stream_of(self, body: bytes) -> tuple[bytes, bytes] | None:
        """(dict head, raw stream bytes) — stream bounded by /Length when
        the dict carries one (the spec's authoritative byte count; the
        EOL before ``endstream`` is NOT part of the data, and slicing by
        ``endstream`` + rstrip would eat payload bytes that legitimately
        end in 0x0A/0x0D).  Indirect /Length refs are resolved; only
        when no usable /Length exists do we fall back to the endstream
        bound, stripping exactly ONE end-of-line marker."""
        i = body.find(b"stream")
        if i < 0:
            return None
        head = body[:i]
        start = i + len(b"stream")
        if body[start:start + 2] == b"\r\n":
            start += 2
        elif body[start:start + 1] in (b"\n", b"\r"):
            start += 1
        length = None
        lm = re.search(rb"/Length\s+(\d+)(\s+\d+\s+R)?", head)
        if lm:
            if lm.group(2):  # indirect: /Length N G R -> integer object N
                tm = re.match(rb"\s*(\d+)", self._resolve(int(lm.group(1))))
                length = int(tm.group(1)) if tm else None
            else:
                length = int(lm.group(1))
        if length is not None and start + length <= len(body):
            return head, body[start:start + length]
        end = body.rfind(b"endstream")
        if end < 0:
            end = len(body)
        raw = body[start:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
        return head, raw

    def _stream_of(self, body: bytes) -> bytes | None:
        got = self.raw_stream_of(body)
        if got is None:
            return None
        head, raw = got
        if b"/FlateDecode" in head:
            return zlib.decompress(raw)
        if b"/Filter" in head:
            raise ValueError("unsupported stream filter")
        return raw

    def _resolve(self, num: int) -> bytes:
        return self.objs.get(num, b"")

    def page_numbers(self) -> list[int]:
        """Page object numbers in page-tree (catalog /Pages /Kids) order
        — the single traversal shared by the text (S5) and image (S8)
        extractors."""
        pages_obj = None
        for body in self.objs.values():
            if b"/Type" in body and b"/Catalog" in body:
                m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", body)
                if m:
                    pages_obj = int(m.group(1))
                break
        kids: list[int] = []

        def walk(num: int) -> None:
            body = self._resolve(num)
            if b"/Kids" in body:
                m = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
                if m:
                    for r in _REF_RE.finditer(m.group(1)):
                        walk(int(r.group(1)))
            elif b"/Page" in body:
                kids.append(num)

        if pages_obj is not None:
            walk(pages_obj)
        return kids

    def page_texts(self) -> list[str]:
        texts = []
        for pnum in self.page_numbers():
            body = self._resolve(pnum)
            m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
            if not m:
                texts.append("")
                continue
            stream = self._stream_of(self._resolve(int(m.group(1))))
            texts.append(_content_text(stream or b""))
        return texts

    def metadata(self) -> dict[str, str]:
        m = re.search(rb"/Info\s+(\d+)\s+\d+\s+R", self.trailer)
        if not m:
            return {}
        body = self._resolve(int(m.group(1)))
        meta: dict[str, str] = {}
        for k, v in re.findall(rb"/(\w+)\s*\(((?:[^()\\]|\\.)*)\)", body):
            meta[k.decode("ascii")] = _unescape_literal(v)
        return meta


def extract_pdf(data: bytes, path: str = "") -> dict:
    """parse() parity surface: {'title', 'content', 'metadata'} — empty
    dict on failure (pdf_parser.py:74-75)."""
    try:
        result = {"title": os.path.basename(path), "content": "", "metadata": {}}
        if _pypdf is not None:
            import io

            reader = _pypdf.PdfReader(io.BytesIO(data))
            if reader.metadata:
                for key, value in reader.metadata.items():
                    if key.startswith("/"):
                        key = key[1:]
                    result["metadata"][key] = str(value)
            parts = []
            for page in reader.pages:
                try:
                    text = page.extract_text()
                    if text:
                        parts.append(text)
                except Exception:
                    pass
            n_pages = len(reader.pages)
        else:
            mini = _MiniPdf(data)
            result["metadata"].update(mini.metadata())
            texts = mini.page_texts()
            parts = [t for t in texts if t]
            n_pages = len(texts)
        if result["metadata"].get("Title"):
            result["title"] = result["metadata"]["Title"]
        result["content"] = "\n\n".join(parts)
        result["metadata"]["page_count"] = n_pages
        return result
    except Exception:
        return {}


# ---------------------------------------------------------------------------
# test/corpus-side writer: deterministic simple PDFs the subset reader
# (and any real PDF library) can read back
# ---------------------------------------------------------------------------

def _escape_literal(s: str) -> bytes:
    b = s.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def make_simple_pdf(pages: list[list[str]], title: str | None = None,
                    compress: bool = False,
                    images: list[bytes] | None = None) -> bytes:
    """Minimal well-formed PDF: one content stream per page, one Tj per
    line.  ``compress=True`` flate-encodes the streams.  ``images``
    become uncompressed /Image XObjects in page 1's /Resources (the S8
    extraction fixture — bytes round-trip undecoded)."""
    objs: list[bytes] = []
    n_pages = len(pages)
    page_obj_ids = [3 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % i for i in page_obj_ids)
    img_ids = [3 + 2 * n_pages + j for j in range(len(images or []))]
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )  # obj 2
    for i, lines in enumerate(pages):
        content = b"BT /F1 12 Tf 72 720 Td " + b" ".join(
            b"(" + _escape_literal(ln) + b") Tj 0 -14 Td" for ln in lines
        ) + b" ET"
        if compress:
            comp = zlib.compress(content)
            stream_obj = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                + comp + b"\nendstream"
            )
        else:
            stream_obj = (
                b"<< /Length %d >>\nstream\n" % len(content)
                + content + b"\nendstream"
            )
        resources = b""
        if i == 0 and img_ids:
            xobjs = b" ".join(
                b"/Im%d %d 0 R" % (j + 1, oid) for j, oid in enumerate(img_ids)
            )
            resources = b"/Resources << /XObject << " + xobjs + b" >> >> "
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            + resources
            + b"/Contents %d 0 R >>" % (page_obj_ids[i] + 1)
        )
        objs.append(stream_obj)
    for blob in images or []:
        objs.append(
            b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Length %d >>"
            b"\nstream\n" % len(blob) + blob + b"\nendstream"
        )
    info_id = None
    if title is not None:
        objs.append(b"<< /Title (" + _escape_literal(title) + b") >>")
        info_id = len(objs)
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for idx, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % idx + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R" % (len(objs) + 1)
    if info_id:
        out += b" /Info %d 0 R" % info_id
    out += b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)
