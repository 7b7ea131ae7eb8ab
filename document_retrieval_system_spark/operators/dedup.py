"""Deduplication operators for web-scale corpora.

The reference has no dedup (its md5-of-path doc_id only dedups identical
paths); a 10^12-doc Common-Crawl pipeline lives or dies on these.  Four
families, all shuffle-conscious:

- exact:        one groupBy on md5(text) — map-side partial aggregation,
                no pre-shuffle.
- MinHash+LSH:  shingle -> K minhashes -> B bands; candidate pairs come
                from a self-join on (band_id, band_key) — only docs
                sharing a band collide, so the join key space is tiny and
                skew-safe (vs the O(n^2) naive pair join).
- SimHash:      64-ish-bit signature via per-bit weighted majority;
                near-dup = small Hamming distance within buckets.
- n-gram Jaccard: exact verification on LSH candidates (or scoped pair
                sets) — the expensive exact check runs on candidates
                only, never all pairs.

MinHash here uses md5-based hash families (min of md5(seed || shingle))
— deterministic, engine-portable (the DuckDB oracle computes the exact
same bytes), and uniformly distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.textstats import (
    simple_tokens,
    word_ngrams,
)


def exact_duplicate_groups(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (content_hash, n_dups, keep_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id row per identical text (deterministic survivor)."""
    w = F.row_number().over(
        Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    )
    return df.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn")


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       n_hashes: int = 8, ngram: int = 3) -> DataFrame:
    """(id, minhash array) over word-ngram shingles; md5-family hashes.

    Relational form on purpose: explode shingles once, then ONE groupBy
    with n_hashes min-aggregates.  (A nested array expression
    ``array(array_min(transform(shingles, md5)) x 8)`` re-derives the
    shingle array per element — Catalyst does not CSE across array
    elements — which measured ~60x slower.)  Map-side partial mins make
    the shuffle tiny: n_hashes x 32 bytes per doc.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_ngrams(simple_tokens(F.col(text_col)), ngram))
        ).alias("sh"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("sh")))).alias(f"mh{j}")
        for j in range(n_hashes)
    ]
    sig = sh.groupBy("id").agg(F.count("*").alias("n_shingles"), *aggs)
    return sig.select(
        F.col("id").alias(id_col),
        "n_shingles",
        F.array(*[F.col(f"mh{j}") for j in range(n_hashes)]).alias("minhash"),
    )


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", n_hashes: int = 8,
                           band_size: int = 2, ngram: int = 3) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing at least one LSH band."""
    sig = minhash_signatures(df, id_col, text_col, n_hashes, ngram)
    n_bands = n_hashes // band_size
    bands = sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|",
                            *[F.element_at("minhash", b * band_size + j + 1)
                              for j in range(band_size)],
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_id", "band.band_key")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        ngram: int = 3, threshold: float = 0.6,
                        prune_unique_shingles: bool = False) -> DataFrame:
    """Exact Jaccard over word-ngram shingle sets for pairs sharing >=1
    shingle.  At corpus scale, feed LSH candidates instead of the raw
    self-join.  ``prune_unique_shingles`` drops df=1 shingles before the
    join (they cannot form pairs) — worth its two extra shuffles only
    when the join's output would otherwise explode (heavily duplicated
    corpora); measured slower on mostly-unique corpora."""
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_ngrams(simple_tokens(F.col(text_col)), ngram))).alias("sh"),
    )
    sizes = shingled.groupBy("id").agg(F.count("*").alias("n"))
    pair_src = shingled
    if prune_unique_shingles:
        shared = shingled.groupBy("sh").count().filter(F.col("count") > 1).select("sh")
        pair_src = shingled.join(shared, "sh", "left_semi")
    common = (
        pair_src.alias("a")
        .join(pair_src.alias("b"), (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """SimHash signature as a bit string (MSB first).

    Per token: take `bits` bits from md5(token) hex; per bit position,
    weighted (by tf) majority vote over tokens.  Pure SQL expressions so
    the DuckDB oracle reproduces it bit-for-bit. bits<=32 keeps it to 8
    hex digits.
    """
    n_hex = bits // 4
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(simple_tokens(F.col(text_col))).alias("tok"),
    )
    tf = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    hexed = tf.withColumn("h", F.substring(F.md5(F.col("tok")), 1, n_hex))
    bit_idx = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    bitted = hexed.select(
        "id", "tf", "h", bit_idx
    ).withColumn(
        "hexdig", F.expr("substring(h, cast(bit / 4 as int) + 1, 1)")
    ).withColumn(
        "digval", F.expr("instr('0123456789abcdef', hexdig) - 1")
    ).withColumn(
        "bitval", F.expr("shiftright(digval, cast(3 - bit % 4 as int)) % 2")
    ).withColumn(
        "contrib", F.when(F.col("bitval") == 1, F.col("tf")).otherwise(-F.col("tf"))
    )
    votes = bitted.groupBy("id", "bit").agg(F.sum("contrib").alias("v"))
    return (
        votes.withColumn("ch", F.when(F.col("v") > 0, F.lit("1")).otherwise(F.lit("0")))
        .groupBy("id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bit", "ch"))),
                    lambda s: s["ch"],
                ),
            ).alias("simhash_bits")
        )
        .withColumnRenamed("id", id_col)
    )


def embedding_neardup_pairs(emb: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine >= threshold).

    Brute-force pair join for verification scale; at corpus scale, bucket
    by LSH (similarity.py) first and verify within buckets.
    """
    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    cos = dot / (norm(F.col("va")) * norm(F.col("vb")))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
