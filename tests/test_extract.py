"""HTML extractor: branch coverage of html_parser.py:29-155 semantics."""

from document_retrieval_system_spark.sources.corpus import gen_page
from document_retrieval_system_spark.sources.html_extract import extract_html


def _page(i):
    url, _ts, html, lang = gen_page(i)
    return url, html, lang


def test_main_region_by_id():
    html = (
        b"<html><head><title>T</title></head><body>"
        b'<div id="content"><h1>A heading long enough</h1>'
        b"<p>This paragraph is definitely longer than twenty characters.</p>"
        b"<p>tiny</p></div>"
        b"<p>Outside the main region, must not appear even though long.</p>"
        b"</body></html>"
    )
    out = extract_html(html, "https://x/page")["content"]
    assert out.startswith("【标题】A heading long enough")
    assert "definitely longer" in out
    assert "tiny" not in out  # <=20 chars skipped (:125)
    assert "Outside the main region" not in out


def test_fallback_without_main_region():
    html = (
        b"<html><head><title>T</title></head><body>"
        b"<h1>Long heading text</h1><h2>Hi</h2>"
        b"<p>First paragraph long enough to be captured by the fallback.</p>"
        b"<p>short one</p>"
        b"</body></html>"
    )
    out = extract_html(html, "u")["content"]
    assert "【标题】Long heading text" in out
    assert "First paragraph long enough" in out
    assert "Hi" not in out  # len<=5 heading skipped (:119)
    assert "short one" not in out


def test_filter_tags_removed():
    html = (
        b"<html><head><title>T</title><style>.x{}</style></head><body>"
        b"<script>var should_never_appear = 1;</script>"
        b"<p>Real content paragraph that is long enough to keep around.</p>"
        b"<iframe>frame stuff</iframe></body></html>"
    )
    out = extract_html(html, "u")["content"]
    assert "should_never_appear" not in out
    assert "Real content paragraph" in out


def test_noise_classes_removed():
    html = (
        b"<html><body>"
        b'<div class="ads-banner"><p>Advertisement text long enough to count.</p></div>'
        b'<div class="sidebar"><p>Sidebar nav junk also long enough here.</p></div>'
        b"<p>Genuine article body text comfortably over twenty chars.</p>"
        b"</body></html>"
    )
    out = extract_html(html, "u")["content"]
    assert "Advertisement" not in out
    assert "Sidebar" not in out
    assert "Genuine article body" in out


def test_title_and_meta():
    html = (
        b"<html><head><title> My Title </title>"
        b'<meta name="author" content="bob"><meta property="og:type" content="article">'
        b"</head><body><p>Body content long enough to extract here fine.</p></body></html>"
    )
    res = extract_html(html, "https://h/x")
    assert res["title"] == "My Title"
    assert res["metadata"]["author"] == "bob"
    assert res["metadata"]["og_type"] == "article"  # ':' -> '_' (:71)


def test_title_fallback_is_url_basename():
    res = extract_html(b"<html><body><p>x</p></body></html>", "https://a/b/page7")
    assert res["title"] == "page7"


def test_links_capped_at_100():
    url, html, _ = _page(13)  # the >100-links fixture page
    links = extract_html(html, url)["metadata"]["links"]
    assert len(links) == 100  # :83


def test_sparse_page_fallback_len30():
    html = (
        b"<html><body><h3>Heading over five</h3>"
        b"<table><tr><td>A table cell carrying more than thirty characters"
        b" of text.</td></tr></table>"
        b"<p>short</p></body></html>"
    )
    out = extract_html(html, "u")["content"]
    # <5 parts -> content-tag fallback with len>30 (:141-146)
    assert "table cell carrying" in out


def test_stray_td_outside_table_is_ignored_like_html5lib():
    """html5lib 'in body' IGNORES stray table-part start tags, so their
    text sits directly in body and is NOT reachable through a td content
    tag — r1-r3 kept the element, which diverged from the reference
    inside a main region (the text would have been emitted twice)."""
    html = (
        b"<html><body><h3>Heading over five</h3>"
        b"<td>A table cell carrying more than thirty characters of text.</td>"
        b"<p>short</p></body></html>"
    )
    out = extract_html(html, "u")["content"]
    assert "table cell carrying" not in out
    # main-region variant: the section text must appear exactly ONCE
    # (element-kept behavior emitted it via both section and td)
    html2 = (
        b'<div id="main-content"><section><td>Stray cell text inside a '
        b"main region over twenty chars.</td></section></div>"
    )
    out2 = extract_html(html2, "u")["content"]
    assert out2.count("Stray cell text") == 1


def test_duplicate_pages_extract_identically():
    u53, h53, _ = _page(53)
    u52, h52, _ = _page(52)
    assert extract_html(h53, u53)["content"] == extract_html(h52, u52)["content"]


def test_near_empty_page():
    url, html, _ = _page(41)
    assert extract_html(html, url)["content"] == ""


def test_parts_joined_with_double_newline():
    url, html, _ = _page(1)
    out = extract_html(html, url)["content"]
    assert "\n\n" in out
