"""Trigram-indexed substring search — grep over the corpus without a
full scan.

The classic design (Cox 2012, "Regular Expression Matching with a
Trigram Index", the Google Code Search architecture; same shape as
PostgreSQL pg_trgm): index every character 3-gram of every document
once, and answer `text CONTAINS pattern` by intersecting the posting
lists of the pattern's trigrams — any document containing the pattern
necessarily contains every one of its trigrams, so the intersection is
a *complete* candidate set and an exact `contains` check on just those
candidates finishes the query.  A LIKE '%...%' over 100 TB is a full
corpus scan per query; the trigram route touches ~len(pattern) posting
lists plus the (usually tiny) candidate rows.

Reference parity note: the reference's B-family queries are
token-level (boolean/phrase/NEAR over analyzed terms); substring
search below the token boundary ("ta st" matches "data stream") is an
extension on the same inverted-index principle, indexed at character
rather than token granularity.

Scale shape: the index is ONE distinct (doc, trigram) aggregation at
build (map-side partial agg; ~L-2 grams per doc of length L before the
per-doc dedup), written partitioned by an md5-derived trigram bucket.
A query filters bucket ∈ (buckets of its own trigrams) — partition
pruning, checkable as PartitionFilters in the scan — AND trigram ∈
(its trigrams) — a pushed In filter — so the scan reads only the
matching buckets' row groups.  The AND-intersection is one groupBy
(doc) counting distinct matched trigrams; candidates then semi-join
the docs table for the exact verify.  No shuffle carries more than
(candidate docs × query trigrams) rows.

The md5 bucket is computed identically driver-side (hashlib) and
engine-side (md5 slice → conv 16→10 mod n), the same portable-hash
pattern as the LSH/IVF index routing in operators/similarity.py.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 64


def _bucket_expr(col, n_buckets: int):
    # md5 first-15-hex-digits mod n: < 2^60, exact in LONG, and
    # reproducible driver-side with hashlib (xxhash64 would be JVM-only).
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def bucket_of(trigram: str, n_buckets: int = N_BUCKETS) -> int:
    """Driver-side twin of `_bucket_expr` — same md5 slice, same mod."""
    return int(hashlib.md5(trigram.encode("utf-8")).hexdigest()[:15], 16) \
        % n_buckets


def trigram_pairs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Distinct (id, tg) character-trigram pairs per document.

    Grams are generated JVM-side with sequence+transform (no Python in
    the path); docs shorter than 3 chars contribute no rows (they can
    never match a >=3-char pattern through the index — the scan
    fallback below handles short patterns instead).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    # guard: sequence(1, 0) would run DESCENDING ([1, 0]) rather than
    # empty, so short docs get an explicit empty gram array instead
    grams = F.when(
        F.length(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: t.substr(i, F.lit(3)),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    return (
        docs.select(F.col(id_col), F.explode(grams).alias("tg"))
        .distinct()
    )


def build_trigram_index(docs: DataFrame, path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = N_BUCKETS) -> None:
    """Write the (bucket, tg, doc_id) trigram index partitioned by
    bucket, so query-time bucket predicates prune partitions."""
    pairs = trigram_pairs(docs, id_col, text_col)
    (
        pairs.withColumn("bucket", _bucket_expr(F.col("tg"), n_buckets))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )
    with open(os.path.join(path, "_N_BUCKETS"), "w") as fh:
        fh.write(str(n_buckets))


def pattern_trigrams(pattern: str) -> list[str]:
    return sorted({pattern[i:i + 3] for i in range(len(pattern) - 2)})


def substring_candidates(spark: SparkSession, index_path: str,
                         pattern: str) -> DataFrame:
    """Docs containing EVERY trigram of `pattern` — a guaranteed
    superset of the true match set.  Requires len(pattern) >= 3."""
    if len(pattern) < 3:
        raise ValueError(
            "trigram index needs a pattern of >= 3 chars; "
            "route shorter patterns to substring_scan"
        )
    with open(os.path.join(index_path, "_N_BUCKETS")) as fh:
        n_buckets = int(fh.read())
    tgs = pattern_trigrams(pattern)
    buckets = sorted({bucket_of(t, n_buckets) for t in tgs})
    idx = spark.read.parquet(index_path)
    return (
        idx.filter(F.col("bucket").isin(buckets) & F.col("tg").isin(tgs))
        .groupBy("doc_id")
        .agg(F.count_distinct("tg").alias("_n"))
        .filter(F.col("_n") == len(tgs))
        .select("doc_id")
    )


def _verify(docs: DataFrame, pattern: str, id_col: str,
            text_col: str) -> DataFrame:
    # occurrence count by literal replace (no regex, so patterns with
    # metacharacters need no escaping); exact in both engines.
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_occ = (
        (F.length(t) - F.length(F.replace(t, F.lit(pattern))))
        / F.lit(len(pattern))
    ).cast("long")
    return (
        docs.filter(F.contains(t, F.lit(pattern)))
        .select(F.col(id_col), n_occ.alias("n_occ"))
    )


def substring_search(spark: SparkSession, index_path: str,
                     docs: DataFrame, pattern: str,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact substring search through the trigram index ->
    (id, n_occ): candidate docs from the index intersection, then an
    exact contains + occurrence count on candidates only."""
    cand = substring_candidates(spark, index_path, pattern)
    hits = docs.join(F.broadcast(cand), id_col, "left_semi")
    return _verify(hits, pattern, id_col, text_col)


def substring_scan(docs: DataFrame, pattern: str, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Full-scan fallback for patterns < 3 chars (the trigram index
    cannot bound them) — same output contract as substring_search."""
    if not pattern:
        raise ValueError("empty pattern")
    return _verify(docs, pattern, id_col, text_col)


# ---------------------------------------------------------------------------
# Regex search over the trigram index (the Code Search query algebra)
#
# Cox 2012's central result: any regular expression compiles to a boolean
# trigram query in OR-of-AND form — alternation becomes OR, concatenation
# becomes AND over the literals' trigrams — and the docs satisfying that
# query are a complete candidate superset for the regex.  The functions
# below implement the alternation-of-literals class (`lit1|lit2|...`),
# which IS that normal form's leaf shape: each alternative contributes an
# AND over its own trigrams, the pattern matches where any alternative's
# AND holds.  Metacharacter literals are rejected rather than escaped so
# the operator never silently depends on one engine's regex dialect.

_META = set("\\.^$*+?()[]{}")


def alternation_literals(pattern: str) -> list[str]:
    """Parse a top-level alternation of plain literals, e.g.
    ``"data stream|hash join"`` -> ``["data stream", "hash join"]``.

    Each alternative must be >= 3 chars (the index cannot bound shorter
    ones — route those through substring_scan) and metacharacter-free
    (this operator's contract is the literal-alternation class, not a
    regex dialect).  Duplicates collapse; order is input order.
    """
    seen: dict[str, None] = {}
    for part in pattern.split("|"):
        if len(part) < 3:
            raise ValueError(
                f"alternative {part!r} shorter than 3 chars — the trigram "
                "index cannot bound it; use substring_scan"
            )
        bad = sorted(set(part) & _META)
        if bad:
            raise ValueError(
                f"alternative {part!r} contains regex metacharacters "
                f"{bad}; only literal alternation is supported"
            )
        seen.setdefault(part)
    return list(seen)


def regex_candidates(spark: SparkSession, index_path: str,
                     literals: list[str]) -> DataFrame:
    """Docs satisfying the OR-of-AND trigram query: for SOME literal,
    the doc contains EVERY one of that literal's trigrams.  One pruned
    index scan (bucket + trigram pushdown over the UNION of all
    literals' trigrams), one broadcast join against the tiny
    requirements table, one (doc, alternative) count — never a scan per
    alternative."""
    with open(os.path.join(index_path, "_N_BUCKETS")) as fh:
        n_buckets = int(fh.read())
    req_rows = []
    for i, lit in enumerate(literals):
        for tg in pattern_trigrams(lit):
            req_rows.append((i, tg))
    n_req = {}
    for i, _ in req_rows:
        n_req[i] = n_req.get(i, 0) + 1
    all_tgs = sorted({tg for _, tg in req_rows})
    buckets = sorted({bucket_of(t, n_buckets) for t in all_tgs})
    req = spark.createDataFrame(req_rows, "alt int, tg string")
    need = spark.createDataFrame(
        [(i, n) for i, n in n_req.items()], "alt int, n_req int")
    idx = spark.read.parquet(index_path)
    return (
        idx.filter(F.col("bucket").isin(buckets) & F.col("tg").isin(all_tgs))
        .join(F.broadcast(req), "tg")
        .groupBy("doc_id", "alt")
        .agg(F.count_distinct("tg").alias("_n"))
        .join(F.broadcast(need), "alt")
        .filter(F.col("_n") == F.col("n_req"))
        .select("doc_id")
        .distinct()
    )


def regex_search(spark: SparkSession, index_path: str, docs: DataFrame,
                 pattern: str, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Literal-alternation regex search through the trigram index ->
    (id, n_occ): candidates from the OR-of-AND trigram query, then an
    exact verify on candidates only.  ``n_occ`` is the SUM over
    alternatives of their non-overlapping occurrence counts (the
    replace-count used by substring_search) — deterministic and
    engine-portable, unlike leftmost-first regex counting when
    alternatives overlap in the text."""
    lits = alternation_literals(pattern)
    cand = regex_candidates(spark, index_path, lits)
    hits = docs.join(F.broadcast(cand), id_col, "left_semi")
    t = F.coalesce(F.col(text_col), F.lit(""))
    per_lit = [
        ((F.length(t) - F.length(F.replace(t, F.lit(lit))))
         / F.lit(len(lit))).cast("long")
        for lit in lits
    ]
    total = per_lit[0]
    for e in per_lit[1:]:
        total = total + e
    return (
        hits.select(F.col(id_col), total.alias("n_occ"))
        .filter(F.col("n_occ") > 0)
    )
