"""WARC / WET web-archive source (ISO 28500) — the container format web
crawls actually arrive in (a Common Crawl snapshot is ~90k ``.warc.gz``
/ ``.wet.gz`` archives of ~1 GB each).

Spark mapping: one archive file = one task.  Per-record gzip members are
not splittable, so the unit of parallelism at 100 TB is the FILE — many
thousands of archives spread across executors — which is exactly how the
public pipelines (CCNet, C4, FineWeb) read Common Crawl.  The reader is
a ``binaryFile`` scan routed through an Arrow-batched ``mapInPandas``
record parser into the same pages schema ``build_index`` ingests
(url, warc_ts, html, text, lang), so a crawl archive drops into every
downstream operator — extraction, indexing, dedup, curation — unchanged.

Pure stdlib (zlib only; no warcio).  The parser is defensive the way a
crawl consumer must be: malformed records are skipped, declared lengths
are sanity-bounded against the remaining buffer BEFORE any allocation,
and a truncated tail still yields every record before it.

The reference has no crawl surface at all (corpus/web_crawler.py is a
0-byte stub), so this source has no reference anchor; it extends the
ingestion family S1-S7 with the format a webtext corpus starts from.
"""

from __future__ import annotations

import zlib
from typing import Iterable

WARC_EXTENSIONS = (".warc", ".warc.gz", ".wet", ".wet.gz")

_CRLF = b"\r\n"


def split_gzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the WARC layout: one
    member per record) into one plaintext buffer.  Stops cleanly at the
    first undecodable byte run, keeping everything before it."""
    out = []
    while data:
        d = zlib.decompressobj(47)  # auto-detect gzip/zlib headers
        try:
            out.append(d.decompress(data))
        except zlib.error:
            break
        out.append(d.flush())
        if not d.eof:  # truncated final member
            break
        data = d.unused_data
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC (or WET) buffer into record dicts:
    ``rec_type`` (warcinfo/response/conversion/...), ``url``, ``date``,
    ``content_type`` (WARC block type), ``payload`` (bytes; for
    ``application/http`` blocks the HTTP envelope is stripped and
    ``http_status`` / ``http_content_type`` are added).

    Defensive contract: returns the records parsed before the first
    malformed header / unsatisfiable Content-Length; never raises on
    arbitrary bytes and never allocates past the buffer length."""
    if data[:2] == b"\x1f\x8b":
        data = split_gzip_members(data)
    records: list[dict] = []
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        lines = data[pos:head_end].split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            break
        hdrs: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                hdrs[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            clen = int(hdrs.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if clen < 0 or clen > n - body_start:  # bounded before slicing
            break
        payload = data[body_start:body_start + clen]
        pos = body_start + clen
        rec = {
            "rec_type": hdrs.get("warc-type", ""),
            "url": hdrs.get("warc-target-uri"),
            "date": hdrs.get("warc-date"),
            "content_type": hdrs.get("content-type", ""),
            "payload": payload,
        }
        if rec["content_type"].startswith("application/http"):
            sep_i = payload.find(b"\r\n\r\n")
            if sep_i >= 0:
                http_lines = (
                    payload[:sep_i].decode("latin-1", "replace").split("\r\n")
                )
                rec["payload"] = payload[sep_i + 4:]
                status = http_lines[0].split(" ")
                if len(status) >= 2 and status[1].isdigit():
                    rec["http_status"] = int(status[1])
                for hl in http_lines[1:]:
                    hk, hsep, hv = hl.partition(":")
                    if hsep and hk.strip().lower() == "content-type":
                        rec["http_content_type"] = hv.strip()
        records.append(rec)
    return records


def _record_bytes(rec_type: str, headers: dict[str, str],
                  payload: bytes) -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + rec_type.encode()]
    for k, v in headers.items():
        head.append(k.encode() + b": " + v.encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def make_warc(records: Iterable[dict], member_gzip: bool = False) -> bytes:
    """Fixture writer: valid WARC/1.0 bytes (optionally one gzip member
    per record, the Common Crawl layout).  Record dicts:

    - ``type``: ``response`` (payload wrapped in an HTTP/1.1 envelope),
      ``conversion`` (WET-style extracted text), or any literal type;
    - ``url`` / ``date`` / ``payload`` (bytes or str);
    - ``content_type``: HTTP Content-Type for responses (default
      text/html), block Content-Type otherwise (default text/plain).
    """
    import gzip as _gzip

    out = []
    info = _record_bytes(
        "warcinfo",
        {"WARC-Date": "2026-01-01T00:00:00Z",
         "Content-Type": "application/warc-fields"},
        b"software: document-retrieval-system-spark fixture writer\r\n",
    )
    out.append(info)
    for r in records:
        payload = r.get("payload", b"")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        rec_type = r.get("type", "response")
        headers = {
            "WARC-Target-URI": r.get("url", ""),
            "WARC-Date": r.get("date", "2026-01-01T00:00:00Z"),
        }
        if rec_type == "response":
            ctype = r.get("content_type", "text/html; charset=utf-8")
            status = r.get("status", 200)
            http = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1") + payload
            headers["Content-Type"] = (
                "application/http; msgtype=response"
            )
            payload = http
        else:
            headers["Content-Type"] = r.get("content_type", "text/plain")
        out.append(_record_bytes(rec_type, headers, payload))
    if member_gzip:
        return b"".join(
            _gzip.compress(rec, compresslevel=6, mtime=0) for rec in out
        )
    return b"".join(out)


def pages_from_warc_bytes(data: bytes) -> list[tuple]:
    """Archive bytes -> pages rows (url, warc_date, html, text):
    HTTP 200 ``text/html`` responses keep raw bytes in ``html`` (the
    byte-identity extractor runs downstream); WET ``conversion``
    records land decoded in ``text``.  Everything else (warcinfo,
    request, metadata, non-html, non-200) is skipped."""
    rows = []
    for rec in parse_warc(data):
        if not rec.get("url"):
            continue
        if rec["rec_type"] == "response":
            # require a PARSED 200 + html envelope: a response block
            # whose HTTP envelope never parsed (no header/body
            # separator) must be skipped, not ingested with the raw
            # status line + headers as page bytes
            if rec.get("http_status") != 200:
                continue
            if "html" not in rec.get("http_content_type", ""):
                continue
            rows.append((rec["url"], rec.get("date"), rec["payload"], None))
        elif rec["rec_type"] == "conversion":
            rows.append((
                rec["url"], rec.get("date"), None,
                rec["payload"].decode("utf-8", "replace"),
            ))
    return rows


def warc_pages_df(spark, path: str, default_lang: str = "en"):
    """Distributed WARC/WET ingestion: recursive ``binaryFile`` scan
    over ``*.warc[.gz]`` / ``*.wet[.gz]`` -> Arrow-batched record parse
    -> pages(url, warc_ts, html, text, lang).  One archive per task;
    scale comes from archive count, as in the public crawl pipelines."""
    import pandas as pd
    from pyspark.sql import functions as F

    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    lower = F.lower(F.col("path"))
    cond = None
    for e in WARC_EXTENSIONS:
        c = lower.endswith(e)
        cond = c if cond is None else (cond | c)
    raw = raw.filter(cond).select("content")

    def gen(batches):
        for pdf in batches:
            urls, dates, htmls, texts = [], [], [], []
            for content in pdf["content"]:
                if content is None:
                    continue
                for url, date, html, text in pages_from_warc_bytes(
                        bytes(content)):
                    urls.append(url)
                    dates.append(date)
                    htmls.append(html)
                    texts.append(text)
            yield pd.DataFrame({
                "url": pd.Series(urls, dtype="object"),
                "warc_date": pd.Series(dates, dtype="object"),
                "html": pd.Series(htmls, dtype="object"),
                "text": pd.Series(texts, dtype="object"),
            })

    pages = raw.mapInPandas(
        gen, "url string, warc_date string, html binary, text string"
    )
    return pages.select(
        "url",
        F.to_timestamp("warc_date").alias("warc_ts"),
        "html", "text",
        F.lit(default_lang).alias("lang"),
    )
