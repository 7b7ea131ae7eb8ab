"""Fuzzy term matching (edit distance <= 1) via deletion variants.

SymSpell's insight made relational: a dictionary term `t` and a query
term `q` are within Levenshtein distance 1 iff their position-tagged
deletion-variant sets share an entry under the rule below — no
per-pair edit-distance computation, just an equi-join.

Each term emits itself tagged pos = -1 plus every single-character
deletion tagged with its 0-based position.  For variants v_q (tag i)
and v_t (tag j) with v_q == v_t:

- i == -1 and j == -1  ->  q == t           (distance 0)
- i == -1 xor j == -1  ->  insertion/deletion (distance 1)
- i == j  (both >= 0)  ->  substitution at i  (distance 1)
- i != j  (both >= 0)  ->  NOT distance 1 (e.g. "ab"/"ba" share "b"
  at different positions but need 2 substitutions) — excluded.

This is EXACT for distance <= 1 (verified against brute-force
Levenshtein in tests), not the loose distance-2 superset classic
SymSpell accepts.

Scale shape: the dictionary side (every distinct corpus term — the big
side at 10^12 docs) explodes to ~(1 + avg_len) variant rows ONCE and
never shuffles on anything wider than the variant string; the query
side is a handful of terms, so its variants broadcast and the join is
map-side.  Typo-tolerant lookup over a trillion-doc vocabulary is one
broadcast hash join.

Reference parity note: the reference's query path has no fuzzy
matching; this backs the query-side robustness leg a webtext search
deployment needs (misspelled queries are a large share of real
traffic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(df: DataFrame, term_col: str = "term") -> DataFrame:
    """Explode each term into its position-tagged deletion variants:
    (term, v, pos) with pos = -1 for the term itself.  Assumes terms
    are non-empty (the analyzer emits length >= 2)."""
    t = term_col
    variants = F.expr(
        f"concat("
        f"  array(struct({t} as v, -1 as pos)),"
        f"  transform(sequence(0, length({t}) - 1),"
        f"            i -> struct(concat(substring({t}, 1, i),"
        f"                               substring({t}, i + 2, length({t}))) as v,"
        f"                        i as pos)))"
    )
    return df.select(F.col(t), F.explode(variants).alias("_s")).select(
        F.col(t), F.col("_s.v").alias("v"), F.col("_s.pos").alias("pos")
    )


def fuzzy_term_matches(dictionary: DataFrame, queries: DataFrame,
                       dict_col: str = "term",
                       query_col: str = "query_term") -> DataFrame:
    """(query_term, term, dist) for every dictionary term within edit
    distance 1 of a query term.  The query side broadcasts; the
    dictionary side is touched once, map-side."""
    dv = deletion_variants(dictionary, dict_col)
    qv = deletion_variants(queries, query_col).withColumnRenamed(
        "v", "qv").withColumnRenamed("pos", "qpos")
    joined = dv.join(
        F.broadcast(qv),
        (F.col("v") == F.col("qv"))
        & ((F.col("pos") == -1) | (F.col("qpos") == -1)
           | (F.col("pos") == F.col("qpos"))),
    )
    return (
        joined.select(F.col(query_col), F.col(dict_col)).distinct()
        .withColumn(
            "dist",
            F.when(F.col(query_col) == F.col(dict_col), F.lit(0))
            .otherwise(F.lit(1)).cast("int"),
        )
    )
