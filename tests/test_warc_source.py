"""WARC/WET source: round-trips, defensive parsing, and end-to-end
ingestion into the index."""

import random
import shutil
import tempfile

from document_retrieval_system_spark.sources.warc import (
    make_warc,
    pages_from_warc_bytes,
    parse_warc,
    split_gzip_members,
    warc_pages_df,
)


def _sample_records():
    return [
        {"type": "response", "url": "http://a.example/page1",
         "date": "2026-03-01T10:00:00Z",
         "payload": b"<html><body><p>alpha page one</p></body></html>"},
        {"type": "response", "url": "http://a.example/missing",
         "date": "2026-03-01T10:00:01Z", "status": 404,
         "payload": b"<html>gone</html>"},
        {"type": "response", "url": "http://a.example/img",
         "date": "2026-03-01T10:00:02Z",
         "content_type": "image/png", "payload": b"\x89PNG fake"},
        {"type": "conversion", "url": "http://b.example/wet1",
         "date": "2026-03-02T09:30:00Z",
         "payload": "extracted plain text of page two\nwith a line break"},
        {"type": "request", "url": "http://a.example/page1",
         "payload": b"GET / HTTP/1.1\r\n"},
    ]


def test_warc_roundtrip_plain_and_gzip():
    for gz in (False, True):
        buf = make_warc(_sample_records(), member_gzip=gz)
        recs = parse_warc(buf)
        # warcinfo + 5 records
        assert [r["rec_type"] for r in recs] == [
            "warcinfo", "response", "response", "response", "conversion",
            "request"]
        ok = recs[1]
        assert ok["url"] == "http://a.example/page1"
        assert ok["http_status"] == 200
        assert ok["http_content_type"].startswith("text/html")
        assert ok["payload"] == b"<html><body><p>alpha page one</p></body></html>"
        assert recs[2]["http_status"] == 404
        assert recs[4]["payload"].decode() .startswith("extracted plain text")


def test_pages_from_warc_bytes_filters():
    buf = make_warc(_sample_records(), member_gzip=True)
    rows = pages_from_warc_bytes(buf)
    # 404, image/png, request, warcinfo all skipped
    assert [(u, html is not None, text is not None)
            for u, _d, html, text in rows] == [
        ("http://a.example/page1", True, False),
        ("http://b.example/wet1", False, True),
    ]
    assert rows[1][3] == "extracted plain text of page two\nwith a line break"


def test_warc_parser_defensive_fuzz():
    """Seeded byte mutations of a valid archive never raise and never
    over-allocate; truncation keeps the prefix records."""
    base = make_warc(_sample_records())
    rng = random.Random(0xA17C)
    for _ in range(300):
        buf = bytearray(base)
        for _m in range(rng.randrange(1, 6)):
            op = rng.randrange(3)
            if op == 0 and buf:
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            elif op == 1 and len(buf) > 10:
                del buf[rng.randrange(len(buf) - 8):][:rng.randrange(1, 8)]
            else:
                buf.insert(rng.randrange(len(buf)), rng.randrange(256))
        recs = parse_warc(bytes(buf))  # must not raise
        assert isinstance(recs, list)
    # huge declared Content-Length is rejected before allocation
    evil = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: 4294967295\r\n\r\nshort")
    assert parse_warc(evil) == []
    # truncated mid-payload: the records before survive
    cut = base[: base.find(b"wet1")]
    kept = parse_warc(cut)
    assert [r["rec_type"] for r in kept][:2] == ["warcinfo", "response"]


def test_gzip_member_split_truncation():
    buf = make_warc(_sample_records()[:1], member_gzip=True)
    whole = split_gzip_members(buf)
    assert whole.startswith(b"WARC/1.0")
    # cutting into the last member keeps the full members before it
    cut = split_gzip_members(buf[:-20])
    assert whole.startswith(cut[: len(cut) // 2])


def test_warc_ingestion_end_to_end(spark, tmp_path):
    """Two archives (one plain WARC of html responses, one member-gzip
    WET) -> pages -> build_index -> BM25 finds both doc kinds."""
    from document_retrieval_system_spark.operators.index_build import (
        IndexReader,
        build_index,
    )
    from document_retrieval_system_spark.operators.search import bm25_search
    from document_retrieval_system_spark.sources.corpus import gen_page

    d = tmp_path / "crawl"
    d.mkdir()
    html_recs = []
    for i in range(5):
        url, _ts, html, _lang = gen_page(i + 1)
        html_recs.append({
            "type": "response", "url": url,
            "date": f"2026-03-01T10:00:0{i}Z", "payload": html,
        })
    (d / "seg0.warc").write_bytes(make_warc(html_recs))
    wet_recs = [{
        "type": "conversion", "url": "http://wet.example/doc",
        "date": "2026-03-02T00:00:00Z",
        "payload": "a wet record about distributed retrieval engines",
    }]
    (d / "seg1.wet.gz").write_bytes(make_warc(wet_recs, member_gzip=True))

    pages = warc_pages_df(spark, str(d), default_lang="en")
    rows = pages.collect()
    assert len(rows) == 6
    wet = [r for r in rows if r["url"] == "http://wet.example/doc"][0]
    assert wet["html"] is None and "retrieval" in wet["text"]
    assert wet["warc_ts"] is not None
    assert all(r["warc_ts"] is not None for r in rows)

    idx = tempfile.mkdtemp(prefix="drs_warc_idx_")
    try:
        build_index(spark, pages, idx, n_shards=2)
        reader = IndexReader(spark, idx)
        assert reader.corpus()["total_docs"] == 6
        hits = bm25_search(reader, "distributed retrieval engines", "en",
                           10, 0.0)
        assert any(r["url"] == "http://wet.example/doc"
                   for r in hits.collect())
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_malformed_http_envelope_not_ingested():
    """A response block whose HTTP envelope lacks the header/body
    separator must be skipped entirely — not ingested with the raw
    status line + headers as page html (review finding)."""
    from document_retrieval_system_spark.sources.warc import _record_bytes

    bad_payload = (b"HTTP/1.1 500 Oops\r\nContent-Type: text/html\r\n"
                   b"<html>no blank line before me</html>")
    rec = _record_bytes(
        "response",
        {"WARC-Target-URI": "http://bad.example/x",
         "WARC-Date": "2026-03-01T00:00:00Z",
         "Content-Type": "application/http; msgtype=response"},
        bad_payload,
    )
    parsed = parse_warc(rec)
    assert len(parsed) == 1 and "http_status" not in parsed[0]
    assert pages_from_warc_bytes(rec) == []
    # and a response with no Content-Type header at all is skipped too
    rec2 = _record_bytes(
        "response",
        {"WARC-Target-URI": "http://bad.example/y",
         "Content-Type": "application/http; msgtype=response"},
        b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\n<html>body</html>",
    )
    assert pages_from_warc_bytes(rec2) == []
