"""Term co-occurrence / PMI association mining over the corpus.

"Related terms" is the other classic index-derived product surface next
to autocompletion: for query suggestion, thesaurus induction, and
topic-drift monitoring, pipelines mine which vocabulary terms co-occur
in documents far more often than chance.  The standard statistic is
pointwise mutual information over document co-occurrence:

    pmi(a, b) = ln( P(a, b) / (P(a) P(b)) )
              = ln( c_ab * N / (c_a * c_b) )

with c_* document counts and N the corpus size.

Scale shape — the naive form is quadratic in per-document vocabulary
(a 10k-distinct-term page emits 5 * 10^7 pairs), so the operator caps
each document's contribution to its top-``m`` terms by (tf desc, term
asc) BEFORE pairing: per-doc work becomes a constant m(m-1)/2, total
pair volume is linear in corpus size, and the cap is deterministic and
engine-portable (no hash sampling needed — the ranking is exact).  The
pair count is then ONE hash aggregation on (term_a, term_b) with
map-side partial combine; hot pairs (stopword-ish combinations) are
exactly the rows map-side combine collapses best.  Term marginals and N
are computed over the SAME capped set, so the PMI contingency table is
self-consistent.  No collect, no self-join on anything bigger than the
capped per-doc term list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_cooccurrence_pmi(tfs: DataFrame, top_m: int = 16,
                          min_pairs: int = 3, k: int = 50) -> DataFrame:
    """Top-``k`` term pairs by document-level PMI.

    ``tfs``: (doc_id, term, tf) — one row per document-term.  Each
    document is capped to its ``top_m`` terms by (tf desc, term asc);
    pairs need ``min_pairs`` supporting documents to qualify (PMI is
    noise for singleton pairs).  Output: (term_a, term_b, n_ab, pmi),
    term_a < term_b, ordered by (pmi desc, term_a, term_b).
    """
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("term"))
    )
    capped = (
        tfs.withColumn("_rk", rk)
        .filter(F.col("_rk") <= F.lit(top_m))
        .select("doc_id", "term")
    )
    n_docs = capped.agg(
        F.countDistinct("doc_id").cast("double").alias("n_docs")
    )
    marg = capped.groupBy("term").agg(F.count("*").alias("c"))
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
               & (F.col("a.term") < F.col("b.term")))
        .groupBy(F.col("a.term").alias("term_a"),
                 F.col("b.term").alias("term_b"))
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= F.lit(min_pairs))
    )
    return (
        pairs
        .join(marg.select(F.col("term").alias("term_a"),
                          F.col("c").alias("c_a")), "term_a")
        .join(marg.select(F.col("term").alias("term_b"),
                          F.col("c").alias("c_b")), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            # rank on the ROUNDED pmi: the top-k cut must be engine-
            # portable, and a raw-double ordering can disagree with an
            # oracle that orders by the rounded output column at
            # knife-edge near-ties (repo convention: round before rank)
            "pmi",
            F.round(
                F.log(F.col("n_ab") * F.col("n_docs")
                      / (F.col("c_a") * F.col("c_b"))), 6),
        )
        .orderBy(F.col("pmi").desc(), "term_a", "term_b")
        .limit(k)
        .select("term_a", "term_b", "n_ab", "pmi")
    )
