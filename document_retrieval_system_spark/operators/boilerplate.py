"""Host-conditioned boilerplate line detection and removal.

The CCNet-style curation leg (Wenzek et al. 2020, "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data") a webtext
pipeline runs before dedup: lines that recur across a large fraction of
a single host's pages — nav menus, cookie banners, copyright footers —
are site template chrome, not content, and leaving them in poisons
downstream n-gram/fingerprint dedup and LM training alike.  This is
*host-conditioned* frequency filtering, deliberately different from the
global paragraph-level exact dedup in ``operators/dedup.py`` (which
keeps one representative of each duplicate paragraph corpus-wide):
boilerplate removal deletes *every* occurrence of an over-represented
line, but only judges over-representation within the host that emitted
it, so a sentence that happens to be popular corpus-wide is untouched.

No reference anchor — the reference has no curation layer at all; this
is part of the LLM-training-data operator mandate.

Scale shape (100 TB): one groupBy on (host, line) with map-side partial
aggregation (the count per key), one groupBy on host (page counts,
broadcast back — hosts are ~10^7, far under executor memory, but the
join is written as a plain equi-join so Spark/AQE picks broadcast when
it fits), one anti equi-join on (host, line) to drop flagged lines, and
one groupBy on doc_id to reassemble.  No self-joins, no explode of
anything larger than the line list already materialized by the scan.
A pathological host with 10^9 identical pages concentrates its
(host, line) keys, but those keys partial-aggregate map-side to one row
per distinct line before the shuffle, so skew is bounded by distinct
line content, not page count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_page_lines(pages: DataFrame, id_col: str = "doc_id",
                     host_col: str = "host",
                     text_col: str = "text") -> DataFrame:
    """Explode pages into (id, host, ln_no, line) rows, ln_no 0-based
    in original document order so the cleaned text can be reassembled
    byte-identically."""
    return pages.select(
        F.col(id_col),
        F.col(host_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln_no", "line"),
    )


def boilerplate_lines(pages: DataFrame, min_pages: int = 3,
                      min_frac: float = 0.5, id_col: str = "doc_id",
                      host_col: str = "host",
                      text_col: str = "text") -> DataFrame:
    """Lines appearing on >= min_pages pages AND >= min_frac of a
    host's pages -> (host, line, n_pages, host_pages).

    A line repeated several times within one page counts that page
    once (the distinct below).  Lines that are empty after trimming are
    never flagged: they carry document structure, not template chrome,
    and removing them would merge unrelated paragraphs.
    """
    lines = split_page_lines(pages, id_col, host_col, text_col)
    host_pages = pages.groupBy(host_col).agg(
        F.count("*").alias("host_pages"))
    freq = (
        lines.filter(F.trim(F.col("line")) != "")
        .select(host_col, "line", id_col)
        .distinct()
        .groupBy(host_col, "line")
        .agg(F.count("*").alias("n_pages"))
    )
    return (
        freq.join(host_pages, host_col)
        .filter(
            (F.col("n_pages") >= min_pages)
            & (F.col("n_pages") >= F.lit(min_frac) * F.col("host_pages"))
        )
    )


def strip_boilerplate(pages: DataFrame, min_pages: int = 3,
                      min_frac: float = 0.5, id_col: str = "doc_id",
                      host_col: str = "host",
                      text_col: str = "text") -> DataFrame:
    """Remove every occurrence of a flagged boilerplate line from its
    host's pages -> (id, host, text [cleaned], n_lines, n_removed).

    Docs whose every line was boilerplate survive with text '' (the
    left join below), so the output has exactly one row per input page
    — a curation pass must not silently drop documents.
    """
    boiler = boilerplate_lines(pages, min_pages, min_frac,
                               id_col, host_col, text_col)
    lines = split_page_lines(pages, id_col, host_col, text_col)
    kept = lines.join(boiler.select(host_col, "line"),
                      [host_col, "line"], "left_anti")
    reassembled = (
        kept.groupBy(id_col, host_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ln_no", "line"))),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("_clean"),
            F.count("*").alias("_kept"),
        )
    )
    base = pages.select(
        id_col, host_col,
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"),
    )
    return (
        base.join(reassembled, [id_col, host_col], "left")
        .select(
            id_col,
            host_col,
            F.coalesce(F.col("_clean"), F.lit("")).alias(text_col),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )
