"""Streaming deduplication: exact content / canonical-URL duplicate
suppression over an unbounded page stream with watermark-bounded state.

Batch dedup (`operators/dedup.py`) sees the whole corpus at once; a
crawl ingest stream cannot.  The streaming contract is the one the
public pipelines run at the crawl frontier: drop a page whose content
hash (or canonical URL) was already seen *within the watermark
horizon*.  State is therefore bounded — Spark evicts seen-keys older
than the watermark — which is the only shape that survives an unbounded
100 TB stream; duplicates farther apart than the horizon are left to
the batch dedup pass that follows ingestion (exactly the
frontier-filter + offline-dedup split CCNet/C4 use).

Both functions run on a batch DataFrame too (state-free
``dropDuplicates`` — same key definition), so backfill and live stream
dedup share one implementation, mirroring `monitor.crawl_rate`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.curate import canonical_url


def content_key(html_col: str = "html", text_col: str = "text") -> Column:
    """md5 over the raw page bytes (html if present, else utf-8 text) —
    the exact-dedup key shared with `dedup.exact_duplicate_groups`."""
    return F.md5(
        F.coalesce(
            F.col(html_col),
            F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8"),
        )
    )


def dedup_stream_exact(pages: DataFrame, watermark: str = "10 minutes",
                       ts_col: str = "warc_ts") -> DataFrame:
    """Keep the first page per content hash seen within the watermark
    horizon; duplicates arriving later than the horizon pass through
    (bounded state beats perfect recall on an unbounded stream).  On a
    batch DataFrame the same key dedups globally."""
    keyed = pages.withColumn("content_key", content_key())
    if not keyed.isStreaming:
        return keyed.dropDuplicates(["content_key"])
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_key"])
    )


def dedup_stream_url(pages: DataFrame, watermark: str = "10 minutes",
                     ts_col: str = "warc_ts",
                     url_col: str = "url") -> DataFrame:
    """Keep the first page per canonical URL (fragment/tracking-param/
    default-port/dup-slash normalization from `curate.canonical_url`)
    within the watermark horizon — the refetch filter of a crawl
    frontier."""
    keyed = pages.withColumn("canon_url", canonical_url(F.col(url_col)))
    if not keyed.isStreaming:
        return keyed.dropDuplicates(["canon_url"])
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["canon_url"])
    )
