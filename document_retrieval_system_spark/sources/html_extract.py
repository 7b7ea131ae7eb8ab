"""HTML -> text extraction, replicating the reference algorithm exactly.

Transcribed from /root/reference/core/datasource/parsers/html_parser.py
(``HTMLParser.parse``, :29-155).  The per-row invariant mandated by
BASELINE.json is "byte-identical extracted text per url" — the single
source of truth for the algorithm is ``extract_html`` below; it backs both
the oracle and the vectorized Arrow UDF (``make_extract_udf``), so the
Spark path is byte-identical to the oracle by construction.

Algorithm (step numbers match the reference):

  title     = <title> text stripped, else basename of the url path (:45,:61-63)
  metadata  = meta[name|property] -> content, normalized (:66-72);
              first 100 (href, text) links (:75-83)
  1. decompose filter tags: script style noscript iframe head meta link svg
     (:19, :90-91)
  2. decompose any element whose class string matches a noise regex
     (ads/banner/footer/comment/sidebar/popup/..., :23-27, :94-104)
  3. main region := first <article|main|div|section> with id matching
     /content|article|main/i (:110), else class matching
     /content|article|main|text/i (:112)
     - if found: up to 3 h1-h3 with stripped text len>5, prefixed 【标题】
       (:117-120); then every content-tag (p div article section main
       h1..h6 li td) text with len>20 (:21, :123-126)
     - else: up to 5 h1-h3 len>5 (:130-133); all <p> len>20 (:136-139);
       if still <5 parts, any content-tag text len>30 not already present
       (:141-146)
  content = parts joined with '\\n\\n' (:149)

Scale note: extraction is per-row embarrassingly parallel — no shuffle.
The UDF is a scalar Arrow pandas_udf; at 100 TB this runs as a map-only
stage whose parallelism is the number of input file splits.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from document_retrieval_system_spark.sources.minidom import Element, parse_html

# html_parser.py:19
FILTER_TAGS = ["script", "style", "noscript", "iframe", "head", "meta", "link", "svg"]
# html_parser.py:21
CONTENT_TAGS = ["p", "div", "article", "section", "main",
                "h1", "h2", "h3", "h4", "h5", "h6", "li", "td"]
# html_parser.py:23-27
NOISE_PATTERNS = [
    re.compile(r"ad[s-]|banner|foot|footer|footnote|promo", re.I),
    re.compile(r"combx|comment|com-|contact|header|menu|sidebar|tool|widget", re.I),
    re.compile(r"popup|share|social|sponsor|tags|related", re.I),
]
# html_parser.py:110,112
_MAIN_ID_RE = re.compile(r"content|article|main", re.I)
_MAIN_CLASS_RE = re.compile(r"content|article|main|text", re.I)
_MAIN_CANDIDATES = ["article", "main", "div", "section"]


def _url_basename(url: str) -> str:
    try:
        path = urlparse(url).path
    except ValueError:
        path = url
    return path.rstrip("/").rsplit("/", 1)[-1] or url


def extract_html(html: bytes | str, url: str = "") -> dict:
    """Reference ``HTMLParser.parse`` over in-memory bytes.

    Returns {'title': str, 'content': str, 'metadata': dict}.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="ignore")  # :51 errors='ignore'

    result = {"title": _url_basename(url), "content": "", "metadata": {}}
    soup = parse_html(html)

    metadata: dict = {}

    # title (:61-63)
    title_el = soup.find("title")
    if title_el is not None:
        title_text = title_el.get_text()
        if title_text and title_text.strip():
            result["title"] = title_text.strip()
            metadata["title"] = result["title"]

    # meta tags (:66-72)
    for meta in soup.find_all("meta"):
        meta_name = meta.get("name", meta.get("property", ""))
        meta_content = meta.get("content", "")
        if meta_name and meta_content:
            metadata[meta_name.lower().replace(":", "_")] = meta_content

    # links (:75-83)
    links = []
    for link in soup.find_all("a", {"href": True}):
        href = link.get("href", "")
        text = link.get_text(strip=True)
        if href and text:
            links.append({"href": href, "text": text})
    if links:
        metadata["links"] = links[:100]
    result["metadata"] = metadata

    # 1. remove filter tags (:90-91)
    for tag in soup.find_all(FILTER_TAGS):
        tag.decompose()

    # 2. remove noise-classed elements (:94-104) — snapshot, then decompose
    for element in soup.find_all(True, {"class": True}):
        class_str = " ".join(element.class_list)
        for pattern in NOISE_PATTERNS:
            if pattern.search(class_str):
                element.decompose()
                break

    # 3. main region (:110-112)
    content_parts: list[str] = []
    main_content = soup.find(_MAIN_CANDIDATES, {"id": _MAIN_ID_RE})
    if main_content is None:
        main_content = soup.find(_MAIN_CANDIDATES, {"class": _MAIN_CLASS_RE})

    if main_content is not None:
        for h in main_content.find_all(["h1", "h2", "h3"], limit=3):  # :117-120
            text = h.get_text(strip=True)
            if text and len(text) > 5:
                content_parts.append(f"【标题】{text}")
        for tag in main_content.find_all(CONTENT_TAGS):  # :123-126
            text = tag.get_text(strip=True)
            if text and len(text) > 20:
                content_parts.append(text)
    else:
        for h in soup.find_all(["h1", "h2", "h3"], limit=5):  # :130-133
            text = h.get_text(strip=True)
            if text and len(text) > 5:
                content_parts.append(f"【标题】{text}")
        for p in soup.find_all("p"):  # :136-139
            text = p.get_text(strip=True)
            if text and len(text) > 20:
                content_parts.append(text)
        if len(content_parts) < 5:  # :141-146
            for tag in soup.find_all(CONTENT_TAGS):
                text = tag.get_text(strip=True)
                if text and len(text) > 30 and text not in content_parts:
                    content_parts.append(text)

    result["content"] = "\n\n".join(content_parts)  # :149
    return result


def extract_text(html: bytes | str, url: str = "") -> str:
    return extract_html(html, url)["content"]


EXTRACT_SCHEMA = StructType([
    StructField("title", StringType()),
    StructField("text", StringType()),
])


@F.pandas_udf(EXTRACT_SCHEMA)
def extract_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """Vectorized Arrow UDF: (html binary, url string) -> struct<title,text>.

    Arrow moves the batch JVM->Python once; the Python loop inside the
    batch is unavoidable (the extraction algorithm is a tree walk), but
    there is no per-row serialization and no shuffle.
    """
    titles: list[str] = []
    texts: list[str] = []
    for h, u in zip(html, url):
        if h is None:
            titles.append(None)
            texts.append(None)
            continue
        try:
            res = extract_html(h, u or "")
            titles.append(res["title"])
            texts.append(res["content"])
        except Exception:
            # reference returns {} on parse failure (:153-155)
            titles.append(_url_basename(u or ""))
            texts.append("")
    return pd.DataFrame({"title": titles, "text": texts})


def with_extracted_text(pages_df, html_col: str = "html", url_col: str = "url"):
    """pages(url, warc_ts, html, text, lang) -> same + title + text filled.

    Rows whose ``text`` is already materialized are passed through
    (compute-once contract, mirroring the reference's parsed-doc cache,
    datasource_manager.py:180-185).
    """
    extracted = extract_udf(F.col(html_col), F.col(url_col))
    return (
        pages_df.withColumn("_ex", extracted)
        .withColumn("title", F.col("_ex.title"))
        .withColumn("text", F.coalesce(F.col("text"), F.col("_ex.text")))
        .drop("_ex")
    )
