"""Static (impact-ordered) index pruning — Carmel et al., SIGIR 2001,
"Static Index Pruning for Information Retrieval Systems".

A 100 TB index spends most of its bytes on postings that can never
reach a top-k result: low-tf postings of high-df terms.  Static
pruning keeps, per term, only the highest-impact postings — here the
top ceil(keep_frac * df) by (tf desc, doc_id asc), floored at
keep_min so rare terms survive intact — and serves queries from the
pruned posting lists while keeping the FULL corpus statistics (df,
avgdl), so surviving postings score exactly what they scored before.
The result is a smaller, hotter index tier: the pruned tier answers
most queries; misses fall back to the full tier (the same two-tier
shape as the PQ/IVF-PQ exact-rerank ANN entries).

The reference has no pruning (search_engine.py scores every posting);
this is the scale path its exhaustive scoring cannot take.

Scale shape: one window per term — the same per-term grouping the
posting builder already shuffles by (index_build.py:206), so pruning
composes with the build at no extra shuffle.  Per-term skew is bounded
by max df, and the heaviest terms are precisely the ones cut hardest
(a df=10^9 stopword keeps 0.3*10^9 postings but sheds 70% of its
bytes); the window is rank-only (no unbounded frame buffering —
row_number streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def impact_prune_tfs(tfs: DataFrame, keep_frac: float = 0.3,
                     keep_min: int = 2, term_col: str = "term",
                     tf_col: str = "tf",
                     id_col: str = "doc_id") -> DataFrame:
    """Keep per term the top-ceil(keep_frac * df) rows by
    (tf desc, id asc), at least keep_min — input columns pass through
    unchanged, minus the pruned rows."""
    if not 0 < keep_frac <= 1:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    w = Window.partitionBy(term_col).orderBy(
        F.desc(tf_col), F.asc(id_col))
    return (
        tfs.withColumn("_rnk", F.row_number().over(w))
        .withColumn("_df", F.count("*").over(Window.partitionBy(term_col)))
        .filter(
            F.col("_rnk")
            <= F.greatest(
                F.lit(keep_min).cast("long"),
                F.ceil(F.lit(float(keep_frac)) * F.col("_df")),
            )
        )
        .drop("_rnk", "_df")
    )
