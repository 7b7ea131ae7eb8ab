"""Driver-contract queries: Spark DataFrame builders + DuckDB oracle SQL.

Each entry implements one operator from SURVEY.md §2 (or a training-data
pipeline operator) over the driver's testdata tables, with an ANSI-SQL
twin that DuckDB runs on the same parquet — the driver compares row
counts, schemas and order-insensitive value hashes at sf=0.01.

Conventions keeping the two engines hash-identical:
- the SQL-expressible "simple analyzer": lower -> [^a-z]->space -> split
  on ' ' -> len>=2 (the full reference analyzer with stemming/CJK
  segmentation is pytest-verified against the oracle instead);
- integer inputs everywhere before division; doubles rounded (6 dp for
  scores, 4 for composites) so 1-ulp libm/summation-order differences
  can't flip the hash;
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from document_retrieval_system_spark.operators import dedup, similarity, textstats
from document_retrieval_system_spark.operators.textstats import (
    simple_process_text,
    simple_tokens,
)

BM25_TERMS = ["data", "join", "filter", "scan"]
K1, B = 1.2, 0.75

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB)
# ---------------------------------------------------------------------------

SQL_TOKS = """
toks AS (
  SELECT doc_id, text,
         list_filter(string_split(regexp_replace(lower(text), '[^a-z]', ' ', 'g'), ' '),
                     t -> length(t) >= 2) AS toks
  FROM documents
)"""

SQL_POS = SQL_TOKS + """,
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos,
         len(toks) AS dl
  FROM toks
)"""

SQL_TFS = SQL_POS + """,
tfs AS (
  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
  FROM pos GROUP BY doc_id, term
)"""

SQL_BM25_BASE = SQL_TFS + f""",
stats AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
corpus AS (
  SELECT count(*) AS n, avg(len(toks)) AS avgdl
  FROM toks WHERE len(toks) > 0
),
q AS (SELECT unnest({BM25_TERMS!r}) AS term),
bm25 AS (
  SELECT tfs.doc_id,
         sum( ln((corpus.n - stats.df + 0.5) / (stats.df + 0.5) + 1)
              * tfs.tf / (tfs.tf + {K1} * (1 - {B} + {B} * tfs.dl / corpus.avgdl)) ) AS score
  FROM tfs JOIN q USING (term) JOIN stats USING (term) CROSS JOIN corpus
  GROUP BY tfs.doc_id
)"""


# ---------------------------------------------------------------------------
# Spark-side shared builders
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _tok_df(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "text", simple_tokens(F.col("text")).alias("toks"))


def _pos_df(docs: DataFrame) -> DataFrame:
    t = _tok_df(docs).withColumn("dl", F.size("toks"))
    return t.select(
        "doc_id", "dl", F.posexplode("toks").alias("pos0", "term")
    ).withColumn("pos", F.col("pos0") + 1).drop("pos0")


def _tfs_df(docs: DataFrame) -> DataFrame:
    return (
        _pos_df(docs)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )


def _bm25_scores(docs: DataFrame) -> DataFrame:
    """Unrounded BM25 scores for BM25_TERMS over the documents table."""
    tfs = _tfs_df(docs)
    stats = tfs.groupBy("term").agg(F.count("*").alias("df"))
    corpus = (
        _tok_df(docs)
        .filter(F.size("toks") > 0)
        .agg(F.count("*").alias("n"), F.avg(F.size("toks")).alias("avgdl"))
    )
    return (
        tfs.filter(F.col("term").isin(BM25_TERMS))
        .join(stats, "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "part",
            F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
            * F.col("tf")
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
    )


# ---------------------------------------------------------------------------
# the query registry: name -> (builder, oracle_sql | None)
# ---------------------------------------------------------------------------

def q_i1_doc_term_stats(spark, sf_dir):
    """I1 (indexer.py:44-93): per-(doc, term) tf + position extrema."""
    return (
        _pos_df(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").alias("tf"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
            F.max("dl").alias("doc_len"),
        )
    )


SQL_I1 = "WITH " + SQL_POS + """
SELECT doc_id, term, count(*) AS tf, min(pos) AS min_pos, max(pos) AS max_pos,
       max(dl) AS doc_len
FROM pos GROUP BY doc_id, term"""


def q_i3_term_stats(spark, sf_dir):
    """I3 (indexer.py:71-73): document frequency + collection frequency."""
    return (
        _tfs_df(_docs(spark, sf_dir))
        .groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    )


SQL_I3 = "WITH " + SQL_TFS + """
SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM tfs GROUP BY term"""


def q_i4_corpus_stats(spark, sf_dir):
    """I4 (indexer.py:85-90): corpus totals (docs with >=1 token only)."""
    return (
        _tok_df(_docs(spark, sf_dir))
        .filter(F.size("toks") > 0)
        .agg(
            F.count("*").alias("total_docs"),
            F.round(F.avg(F.size("toks")), 6).alias("avg_doc_len"),
            F.sum(F.size("toks")).alias("total_tokens"),
        )
    )


SQL_I4 = "WITH " + SQL_TOKS + """
SELECT count(*) AS total_docs, round(avg(len(toks)), 6) AS avg_doc_len,
       sum(len(toks))::BIGINT AS total_tokens
FROM toks WHERE len(toks) > 0"""


def q_r3_bm25_topk(spark, sf_dir):
    """R3 (search_engine.py:427-482): BM25 top-20, k1=1.2 b=0.75."""
    return (
        _bm25_scores(_docs(spark, sf_dir))
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


SQL_R3 = "WITH " + SQL_BM25_BASE + """
SELECT doc_id, round(score, 6) AS score FROM bm25
ORDER BY score DESC, doc_id LIMIT 20"""


def q_r1_tfidf_topk(spark, sf_dir):
    """R1 (search_engine.py:347-410 + indexer.py:254-271): cosine of the
    normalized query idf vector with L2-normalized doc tf-idf weights."""
    docs = _docs(spark, sf_dir)
    tfs = _tfs_df(docs)
    stats = tfs.groupBy("term").agg(F.count("*").alias("df"))
    n = _tok_df(docs).filter(F.size("toks") > 0).count()
    w_doc = tfs.join(stats, "term").withColumn(
        "w", F.col("tf") * F.log(F.lit(float(n)) / F.col("df"))
    )
    norms = w_doc.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("dnorm"))
    qw = (
        stats.filter(F.col("term").isin(BM25_TERMS))
        .withColumn("w_qt", F.log(F.lit(float(n)) / F.col("df")))
    )
    qnorm = qw.agg(F.sqrt(F.sum(F.col("w_qt") * F.col("w_qt"))).alias("qn"))
    w_dt = F.when(F.col("dnorm") > 0, F.col("w") / F.col("dnorm")).otherwise(F.col("w"))
    return (
        w_doc.filter(F.col("term").isin(BM25_TERMS))
        .join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .join(qw.select("term", "w_qt"), "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum((F.col("w_qt") / F.col("qn")) * w_dt), 6).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


SQL_R1 = "WITH " + SQL_TFS + f""",
stats AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
corpus AS (SELECT count(*) AS n FROM toks WHERE len(toks) > 0),
w_doc AS (
  SELECT tfs.doc_id, tfs.term, tfs.tf * ln(corpus.n / stats.df) AS w
  FROM tfs JOIN stats USING (term) CROSS JOIN corpus
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS dnorm FROM w_doc GROUP BY doc_id),
q AS (SELECT unnest({BM25_TERMS!r}) AS term),
qw AS (
  SELECT stats.term, ln(corpus.n / stats.df) AS w_qt
  FROM stats JOIN q USING (term) CROSS JOIN corpus
),
qnorm AS (SELECT sqrt(sum(w_qt * w_qt)) AS qn FROM qw)
SELECT w_doc.doc_id,
       round(sum((qw.w_qt / qnorm.qn)
                 * (CASE WHEN norms.dnorm > 0 THEN w_doc.w / norms.dnorm
                         ELSE w_doc.w END)), 6) AS score
FROM w_doc JOIN qw USING (term) JOIN norms USING (doc_id) CROSS JOIN qnorm
GROUP BY w_doc.doc_id
ORDER BY score DESC, doc_id LIMIT 20"""


def q_b1_boolean_single(spark, sf_dir):
    """B2 single-term scoring (search_engine.py:248-269): tf/doc_len."""
    return (
        _tfs_df(_docs(spark, sf_dir))
        .filter(F.col("term") == "join")
        .select("doc_id", F.round(F.col("tf").cast("double") / F.col("dl"), 6).alias("score"))
    )


SQL_B1 = "WITH " + SQL_TFS + """
SELECT doc_id, round(tf * 1.0 / dl, 6) AS score FROM tfs WHERE term = 'join'"""


def _bool_sets(docs, a: str, b: str):
    tfs = _tfs_df(docs)
    return (
        tfs.filter(F.col("term") == a).select("doc_id"),
        tfs.filter(F.col("term") == b).select("doc_id"),
        tfs,
    )


def q_b2_boolean_and(spark, sf_dir):
    """B2 AND (:284-293): intersection; score = matched_terms/2 (:299)."""
    sa, sb, tfs = _bool_sets(_docs(spark, sf_dir), "data", "scan")
    final = sa.intersect(sb)
    matched = (
        tfs.filter(F.col("term").isin(["data", "scan"]))
        .groupBy("doc_id").agg(F.count("*").alias("m"))
    )
    return final.join(matched, "doc_id").select(
        "doc_id", F.round(F.col("m") / 2.0, 6).alias("score")
    )


SQL_B2_AND = "WITH " + SQL_TFS + """,
sa AS (SELECT doc_id FROM tfs WHERE term = 'data'),
sb AS (SELECT doc_id FROM tfs WHERE term = 'scan'),
final AS (SELECT doc_id FROM sa INTERSECT SELECT doc_id FROM sb),
matched AS (
  SELECT doc_id, count(*) AS m FROM tfs WHERE term IN ('data','scan') GROUP BY doc_id
)
SELECT doc_id, round(m / 2.0, 6) AS score FROM final JOIN matched USING (doc_id)"""


def q_b2_boolean_or(spark, sf_dir):
    sa, sb, tfs = _bool_sets(_docs(spark, sf_dir), "data", "scan")
    final = sa.union(sb).distinct()
    matched = (
        tfs.filter(F.col("term").isin(["data", "scan"]))
        .groupBy("doc_id").agg(F.count("*").alias("m"))
    )
    return final.join(matched, "doc_id").select(
        "doc_id", F.round(F.col("m") / 2.0, 6).alias("score")
    )


SQL_B2_OR = "WITH " + SQL_TFS + """,
final AS (
  SELECT doc_id FROM tfs WHERE term = 'data'
  UNION SELECT doc_id FROM tfs WHERE term = 'scan'
),
matched AS (
  SELECT doc_id, count(*) AS m FROM tfs WHERE term IN ('data','scan') GROUP BY doc_id
)
SELECT doc_id, round(m / 2.0, 6) AS score FROM final JOIN matched USING (doc_id)"""


def q_b2_boolean_not(spark, sf_dir):
    """B2 NOT (:293): postings(data) minus postings(scan); score=1/2."""
    sa, sb, _ = _bool_sets(_docs(spark, sf_dir), "data", "scan")
    return sa.subtract(sb).select("doc_id", F.lit(0.5).alias("score"))


SQL_B2_NOT = "WITH " + SQL_TFS + """
SELECT doc_id, 0.5::DOUBLE AS score FROM (
  SELECT doc_id FROM tfs WHERE term = 'data'
  EXCEPT SELECT doc_id FROM tfs WHERE term = 'scan'
)"""


def q_b7_phrase(spark, sf_dir):
    """B7 (boolean_model.py:363-419): 'key order' at consecutive positions."""
    pos = _pos_df(_docs(spark, sf_dir))
    p0 = pos.filter(F.col("term") == "key").select("doc_id", F.col("pos").alias("p0"))
    p1 = pos.filter(F.col("term") == "order").select(
        "doc_id", (F.col("pos") - 1).alias("p0")
    )
    return p0.join(p1, ["doc_id", "p0"], "left_semi").select("doc_id").distinct()


SQL_B7 = "WITH " + SQL_POS + """
SELECT DISTINCT a.doc_id
FROM (SELECT doc_id, pos FROM pos WHERE term = 'key') a
JOIN (SELECT doc_id, pos FROM pos WHERE term = 'order') b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1"""


def q_b6_near(spark, sf_dir):
    """B6 (boolean_model.py:313-354): 'table' NEAR/3 'scan'."""
    pos = _pos_df(_docs(spark, sf_dir))
    pa = pos.filter(F.col("term") == "table").select("doc_id", F.col("pos").alias("pa"))
    pb = pos.filter(F.col("term") == "scan").select("doc_id", F.col("pos").alias("pb"))
    return (
        pa.join(pb, "doc_id")
        .filter(F.abs(F.col("pa") - F.col("pb")) <= 3)
        .select("doc_id")
        .distinct()
    )


SQL_B6 = "WITH " + SQL_POS + """
SELECT DISTINCT a.doc_id
FROM (SELECT doc_id, pos FROM pos WHERE term = 'table') a
JOIN (SELECT doc_id, pos FROM pos WHERE term = 'scan') b
  ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) <= 3"""


def q_u2_boost_rescore(spark, sf_dir):
    """U2 (rule_engine.py:174-192): per-word boost multipliers on BM25."""
    docs = _docs(spark, sf_dir)
    scored = _bm25_scores(docs).join(docs.select("doc_id", "text"), "doc_id")
    content = F.lower(F.coalesce(F.col("text"), F.lit("")))
    boosted = (
        F.col("score")
        * F.when(content.contains("fast"), F.lit(1.5)).otherwise(F.lit(1.0))
        * F.when(content.contains("slow"), F.lit(2.0)).otherwise(F.lit(1.0))
    )
    return (
        scored.select("doc_id", F.round(boosted, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


SQL_U2 = "WITH " + SQL_BM25_BASE + """
SELECT b.doc_id,
       round(b.score
             * (CASE WHEN contains(lower(coalesce(d.text,'')), 'fast') THEN 1.5 ELSE 1.0 END)
             * (CASE WHEN contains(lower(coalesce(d.text,'')), 'slow') THEN 2.0 ELSE 1.0 END),
             6) AS score
FROM bm25 b JOIN documents d ON b.doc_id = d.doc_id
ORDER BY score DESC, b.doc_id LIMIT 20"""


def q_u5_time_decay(spark, sf_dir):
    """U5 (rule_engine.py:230-262): exp(-0.1*age_months) decay, skipped
    past 24 months; aggregated per user over the events table."""
    ev = _events(spark, sf_dir)
    # microsecond-precision epoch (unix_timestamp truncates sub-seconds,
    # DuckDB's epoch() does not)
    epoch_s = F.expr("unix_micros(cast(ts as timestamp)) / 1000000.0")
    now_s = F.expr(
        "unix_micros(cast(to_timestamp('2024-07-01 00:00:00') as timestamp)) / 1000000.0"
    )
    months = (now_s - epoch_s) / F.lit(30.0 * 24 * 3600)
    factor = F.when(months > 24, F.lit(1.0)).otherwise(F.exp(-0.1 * months))
    return (
        ev.withColumn("decayed", F.col("value") * factor)
        .groupBy("user_id")
        .agg(F.round(F.sum("decayed"), 4).alias("decayed_value"), F.count("*").alias("n_events"))
    )


SQL_U5 = """
SELECT user_id,
       round(sum(value * (CASE
         WHEN (epoch(TIMESTAMP '2024-07-01 00:00:00') - epoch(ts)) / (30.0*24*3600) > 24
           THEN 1.0
         ELSE exp(-0.1 * (epoch(TIMESTAMP '2024-07-01 00:00:00') - epoch(ts)) / (30.0*24*3600))
       END)), 4) AS decayed_value,
       count(*) AS n_events
FROM events GROUP BY user_id"""


def q_u7_content_length(spark, sf_dir):
    """U7 (rule_engine.py:294-324): *0.8 factor when content is short."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("content_length"),
        F.when(F.length(F.coalesce(F.col("text"), F.lit(""))) < 200, F.lit(0.8))
        .otherwise(F.lit(1.0))
        .alias("factor"),
    )


SQL_U7 = """
SELECT doc_id, length(coalesce(text,'')) AS content_length,
       (CASE WHEN length(coalesce(text,'')) < 200 THEN 0.8 ELSE 1.0 END)::DOUBLE AS factor
FROM documents"""


def q_u8_keyword_density(spark, sf_dir):
    """U8 (rule_engine.py:326-375): substring-count density with
    0.9 / 1.2 adjustment factors."""
    docs = _docs(spark, sf_dir)
    content = F.lower(F.coalesce(F.col("text"), F.lit("")))
    words = F.size(F.filter(F.split(content, r"\s+"), lambda t: F.length(t) > 0))
    cnt = sum(
        ((F.length(content) - F.length(F.replace(content, F.lit(t), F.lit("")))) / F.lit(len(t))).cast("long")
        for t in ["data", "query"]
    )
    density = F.when(words > 0, cnt.cast("double") / words).otherwise(F.lit(None))
    factor = (
        F.when(density.isNull(), F.lit(1.0))
        .when(density < 0.005, F.lit(0.9))
        .when(density > 0.05, F.lit(1.2))
        .otherwise(F.lit(1.0))
    )
    return docs.select(
        "doc_id", F.round(density, 6).alias("density"), factor.alias("factor")
    )


SQL_U8 = """
WITH base AS (
  SELECT doc_id, lower(coalesce(text,'')) AS c FROM documents
),
m AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(c, '\\s+'), t -> length(t) > 0)) AS words,
         cast((length(c) - length(replace(c, 'data', ''))) / 4 AS BIGINT)
         + cast((length(c) - length(replace(c, 'query', ''))) / 5 AS BIGINT) AS cnt
  FROM base
)
SELECT doc_id,
       round(CASE WHEN words > 0 THEN cnt * 1.0 / words END, 6) AS density,
       (CASE WHEN words = 0 THEN 1.0
             WHEN cnt * 1.0 / words < 0.005 THEN 0.9
             WHEN cnt * 1.0 / words > 0.05 THEN 1.2
             ELSE 1.0 END)::DOUBLE AS factor
FROM m"""


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: byte-identical text groups."""
    return dedup.exact_duplicate_groups(_docs(spark, sf_dir))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, count(*) AS n_dups, min(doc_id) AS keep_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1"""


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash (8 md5-family hashes over word-3-gram shingles) + LSH
    (4 bands x 2 rows) candidate pairs."""
    return dedup.minhash_lsh_candidates(
        _docs(spark, sf_dir), n_hashes=8, band_size=2, ngram=3
    )


SQL_DEDUP_MINHASH = "WITH " + SQL_TOKS + """,
grams AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE [] END) AS grams
  FROM toks
),
shing AS (SELECT doc_id, unnest(grams) AS sh FROM grams WHERE len(grams) > 0),
mh AS (
  SELECT doc_id, j, min(md5(j::VARCHAR || '|' || sh)) AS mh
  FROM shing CROSS JOIN (SELECT unnest(range(8)) AS j) seeds
  GROUP BY doc_id, j
),
bands AS (
  SELECT doc_id, j // 2 AS band_id, string_agg(mh, '|' ORDER BY j) AS band_key
  FROM mh GROUP BY doc_id, j // 2
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id"""


def q_dedup_jaccard(spark, sf_dir):
    """Token-set Jaccard pairs (n=1 shingles, threshold 0.4); the 3-gram
    variant runs on the synthetic corpus in pytest where true near-dups
    exist."""
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), ngram=1, threshold=0.4)


SQL_DEDUP_JACCARD = "WITH " + SQL_TOKS + """,
s AS (SELECT doc_id AS id, unnest(list_distinct(toks)) AS sh FROM toks),
sizes AS (SELECT id, count(*) AS n FROM s GROUP BY id),
cm AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
  FROM s a JOIN s b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       round(n_common * 1.0 / (na.n + nb.n - n_common), 6) AS jaccard
FROM cm
JOIN sizes na ON cm.id_a = na.id
JOIN sizes nb ON cm.id_b = nb.id
WHERE round(n_common * 1.0 / (na.n + nb.n - n_common), 6) >= 0.4"""


def q_dedup_jaccard3(spark, sf_dir):
    """Word-3-gram Jaccard (threshold 0.6): rare shingles keep the
    self-join small — the scale-appropriate variant."""
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), ngram=3, threshold=0.6)


SQL_DEDUP_JACCARD3 = "WITH " + SQL_TOKS + """,
g AS (
  SELECT doc_id AS id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE [] END) AS grams
  FROM toks
),
s AS (SELECT id, unnest(grams) AS sh FROM g WHERE len(grams) > 0),
sizes AS (SELECT id, count(*) AS n FROM s GROUP BY id),
cm AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
  FROM s a JOIN s b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       round(n_common * 1.0 / (na.n + nb.n - n_common), 6) AS jaccard
FROM cm
JOIN sizes na ON cm.id_a = na.id
JOIN sizes nb ON cm.id_b = nb.id
WHERE round(n_common * 1.0 / (na.n + nb.n - n_common), 6) >= 0.6"""


def q_dedup_simhash(spark, sf_dir):
    """32-bit SimHash signatures (tf-weighted bit majority over md5 bits)."""
    return dedup.simhash(_docs(spark, sf_dir), bits=32)


SQL_DEDUP_SIMHASH = "WITH " + SQL_POS + """,
tf AS (SELECT doc_id, term AS tok, count(*) AS tf FROM pos GROUP BY doc_id, term),
bits AS (
  SELECT doc_id, bit,
         sum(CASE WHEN ((strpos('0123456789abcdef',
                                substr(md5(tok), bit // 4 + 1, 1)) - 1)
                        >> (3 - bit % 4)) & 1 = 1
                  THEN tf ELSE -tf END) AS v
  FROM tf CROSS JOIN (SELECT unnest(range(32)) AS bit) b
  GROUP BY doc_id, bit
)
SELECT doc_id,
       string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY bit) AS simhash_bits
FROM bits GROUP BY doc_id"""


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk(
        emb.filter(F.col("vec_id") > 0), [float(x) for x in qvec], k=10
    )


SQL_ANN_COSINE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qx AS (SELECT generate_subscripts(qv, 1) AS i, unnest(qv)::DOUBLE AS qx FROM q),
ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS x
  FROM embeddings WHERE vec_id > 0
),
dots AS (
  SELECT vec_id, sum(x * qx) AS dot, sum(x * x) AS na
  FROM ex JOIN qx USING (i) GROUP BY vec_id
),
qn AS (SELECT sqrt(sum(qx * qx)) AS qnorm FROM qx)
SELECT vec_id, round(dot / (sqrt(na) * qnorm), 6) AS cosine
FROM dots CROSS JOIN qn
ORDER BY cosine DESC, vec_id LIMIT 10"""


def q_emb_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cosine >= 0.9)."""
    return dedup.embedding_neardup_pairs(_emb(spark, sf_dir), threshold=0.9)


SQL_EMB_NEARDUP = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS x
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         sum(a.x * b.x) AS dot, sum(a.x * a.x) AS na, sum(b.x * b.x) AS nb
  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT id_a, id_b, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
FROM pairs WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.9"""


def q_ta_langid(spark, sf_dir):
    return textstats.lang_id(_docs(spark, sf_dir))


SQL_TA_LANGID = "WITH " + SQL_TOKS + f"""
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
            WHEN len(list_filter(toks, t -> list_contains({textstats.EN_MARKERS!r}, t))) > 0 THEN 'en'
            ELSE 'other' END AS lang_pred,
       len(list_filter(toks, t -> list_contains({textstats.EN_MARKERS!r}, t))) AS en_marker_hits
FROM toks"""


def q_ta_quality(spark, sf_dir):
    return textstats.quality_score(_docs(spark, sf_dir))


SQL_TA_QUALITY = "WITH " + SQL_TOKS + f""",
m AS (
  SELECT doc_id, text IS NOT NULL AS has_text, len(toks) AS n_tok,
         length(coalesce(text,'')) AS n_chars,
         CASE WHEN length(coalesce(text,'')) > 0
              THEN length(regexp_replace(lower(coalesce(text,'')), '[^a-z]', '', 'g'))
                   * 1.0 / length(coalesce(text,''))
              ELSE 0.0 END AS alpha_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> list_contains({textstats.EN_MARKERS!r}, t)))
                   * 1.0 / len(toks)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks)
              ELSE 0.0 END AS mean_wlen
  FROM toks
)
SELECT doc_id, has_text, n_tok AS n_tokens,
       round(0.25 * (CASE WHEN n_chars >= 100 AND n_chars <= 20000 THEN 1.0 ELSE 0.5 END)::DOUBLE
             + 0.35 * alpha_ratio
             + 0.2 * least(stop_ratio * 5, 1.0::DOUBLE)
             + 0.2 * (CASE WHEN mean_wlen >= 3.0 AND mean_wlen <= 10.0 THEN 1.0 ELSE 0.5 END)::DOUBLE,
             4) AS quality
FROM m"""


def q_ta_tokencount(spark, sf_dir):
    return textstats.token_counts(_docs(spark, sf_dir))


SQL_TA_TOKENCOUNT = r"""
SELECT doc_id,
       len(list_filter(string_split_regex(coalesce(text,''), '\s+'),
                       t -> length(t) > 0)) AS n_ws_tokens,
       len(regexp_extract_all(lower(coalesce(text,'')), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens
FROM documents"""


def q_ta_fingerprint(spark, sf_dir):
    return textstats.fingerprint(_docs(spark, sf_dir), k=8)


SQL_TA_FINGERPRINT = """
WITH g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN length(lower(text)) >= 8
           THEN list_transform(range(1, length(lower(text)) - 6),
                               i -> substr(lower(text), i, 8))
           ELSE [] END) AS grams
  FROM documents
)
SELECT doc_id,
       list_aggregate(list_transform(grams, s -> md5(s)), 'min') AS fingerprint,
       len(grams) AS n_shingles
FROM g"""


# ---------------------------------------------------------------------------
# Spark-only entries (no SQL-expressible oracle -> driver rows-only check)
# ---------------------------------------------------------------------------

def _entry_index_dir(sf_dir: str) -> str:
    import hashlib as _h
    import tempfile

    from document_retrieval_system_spark.operators.codec import FORMAT_VERSION

    tag = _h.md5(f"{sf_dir}|v{FORMAT_VERSION}".encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"drs_entry_index_{tag}")


def _ensure_entry_index(spark, sf_dir: str):
    """Build (once per sf_dir) a compressed sharded index over the
    documents table using the SQL-expressible analyzer, so the WAND query
    below is checkable against the DuckDB BM25 oracle."""
    from document_retrieval_system_spark.operators.index_build import (
        IndexReader,
        build_index,
    )

    idx = _entry_index_dir(sf_dir)
    marker = os.path.join(idx, "_done")
    if not os.path.exists(marker):
        docs = _docs(spark, sf_dir)
        pages = docs.select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
            F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            F.col("text"),
            F.lit("en").alias("lang"),
        )
        build_index(spark, pages, idx, n_shards=8, analyzer=simple_process_text)
        with open(marker, "w") as fh:
            fh.write("ok")
    return IndexReader(spark, idx)


def q_r3_bm25_wand(spark, sf_dir):
    """R3 pruned path: block-max WAND over a real compressed index built
    from the documents table — must hash-match the DuckDB BM25 SQL."""
    from document_retrieval_system_spark.operators.wand import bm25_wand_search

    reader = _ensure_entry_index(spark, sf_dir)
    # k larger than the corpus: no top-k boundary, so md5-vs-bigint
    # tiebreak order cannot change the (order-insensitive) result set.
    res = bm25_wand_search(
        reader, " ".join(BM25_TERMS), "en", 10**6, 0.0, analyzer=simple_process_text
    )
    # url is "doc://<doc_id>"; map back to the bigint doc_id for comparison
    return res.select(
        F.expr("cast(substring(url, 7) as bigint)").alias("doc_id"),
        F.round("score", 6).alias("score"),
    ).orderBy(F.desc("score"), F.asc("doc_id"))


def q_b5_boolean_rpn(spark, sf_dir):
    """B3-B5: full boolean language '(data OR scan) AND join NOT filter'
    evaluated by the RPN stack machine over the compressed index."""
    from document_retrieval_system_spark.operators.boolean_rpn import (
        boolean_rpn_search,
    )

    reader = _ensure_entry_index(spark, sf_dir)
    hits = boolean_rpn_search(reader, "(data OR scan) AND join NOT filter")
    docs = reader.docs().select("shard", "local_no", "url")
    return (
        hits.join(docs, ["shard", "local_no"])
        .select(F.expr("cast(substring(url, 7) as bigint)").alias("doc_id"))
        .orderBy("doc_id")
    )


SQL_B5_RPN = "WITH " + SQL_TFS + """,
s_data AS (SELECT doc_id FROM tfs WHERE term = 'data'),
s_scan AS (SELECT doc_id FROM tfs WHERE term = 'scan'),
s_join AS (SELECT doc_id FROM tfs WHERE term = 'join'),
s_filter AS (SELECT doc_id FROM tfs WHERE term = 'filter')
SELECT doc_id FROM (
  SELECT doc_id FROM (
    SELECT doc_id FROM s_data UNION SELECT doc_id FROM s_scan
  ) INTERSECT SELECT doc_id FROM s_join
  EXCEPT SELECT doc_id FROM s_filter
) ORDER BY doc_id"""


def q_ann_lsh_topk(spark, sf_dir):
    """ANN scale path: random-hyperplane LSH bucketing + exact rerank."""
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.lsh_topk(
        emb.filter(F.col("vec_id") > 0), [float(x) for x in qvec],
        k=10, sig_bits=12, hamming_probe=4,
    )


def q_t8_highlights(spark, sf_dir):
    """T8 snippets over the BM25 top-k (reference highlight algorithm)."""
    from document_retrieval_system_spark.operators.highlight import make_highlights

    docs = _docs(spark, sf_dir)
    top = (
        _bm25_scores(docs)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def hl(text):
        return pd.Series([make_highlights(t or "", BM25_TERMS) for t in text])

    return top.select(
        "doc_id", F.round("score", 6).alias("score"),
        F.size(hl(F.col("text"))).alias("n_highlights"),
    ).orderBy(F.desc("score"), F.asc("doc_id"))


def q_mm_features(spark, sf_dir):
    """Multimodal plumbing: binary payload -> feature vector (stub decode)."""
    from document_retrieval_system_spark.sources.multimodal import (
        extract_features,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, 64)
    feats = extract_features(media)
    return feats.select(
        "media_id", "kind", "n_bytes",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 4).alias("feature_sum"),
    )


def q_s4_extract_pages(spark, sf_dir):
    """S4 byte-identity extractor over 200 synthetic pages (rows-only in
    the driver; byte-identity itself is pytest-asserted vs the oracle)."""
    from document_retrieval_system_spark.sources.corpus import pages_df
    from document_retrieval_system_spark.sources.html_extract import with_extracted_text

    pages = with_extracted_text(pages_df(spark, 200))
    return pages.select(
        "url", "lang", F.length("text").alias("text_len"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_md5"),
    )


QUERIES = {
    "i1_doc_term_stats": (q_i1_doc_term_stats, SQL_I1),
    "i3_term_stats": (q_i3_term_stats, SQL_I3),
    "i4_corpus_stats": (q_i4_corpus_stats, SQL_I4),
    "r3_bm25_topk": (q_r3_bm25_topk, SQL_R3),
    "r3_bm25_wand": (
        q_r3_bm25_wand,
        SQL_R3.replace("ORDER BY score DESC, doc_id LIMIT 20",
                       "ORDER BY score DESC, doc_id"),
    ),
    "r1_tfidf_topk": (q_r1_tfidf_topk, SQL_R1),
    "b1_boolean_single": (q_b1_boolean_single, SQL_B1),
    "b2_boolean_and": (q_b2_boolean_and, SQL_B2_AND),
    "b2_boolean_or": (q_b2_boolean_or, SQL_B2_OR),
    "b2_boolean_not": (q_b2_boolean_not, SQL_B2_NOT),
    "b5_boolean_rpn": (q_b5_boolean_rpn, SQL_B5_RPN),
    "b7_phrase": (q_b7_phrase, SQL_B7),
    "b6_near": (q_b6_near, SQL_B6),
    "u2_boost_rescore": (q_u2_boost_rescore, SQL_U2),
    "u5_time_decay": (q_u5_time_decay, SQL_U5),
    "u7_content_length": (q_u7_content_length, SQL_U7),
    "u8_keyword_density": (q_u8_keyword_density, SQL_U8),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_DEDUP_MINHASH),
    "dedup_ngram_jaccard": (q_dedup_jaccard, SQL_DEDUP_JACCARD),
    "dedup_ngram_jaccard3": (q_dedup_jaccard3, SQL_DEDUP_JACCARD3),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "emb_neardup": (q_emb_neardup, SQL_EMB_NEARDUP),
    "ann_cosine_topk": (q_ann_cosine_topk, SQL_ANN_COSINE),
    "ta_langid": (q_ta_langid, SQL_TA_LANGID),
    "ta_quality": (q_ta_quality, SQL_TA_QUALITY),
    "ta_tokencount": (q_ta_tokencount, SQL_TA_TOKENCOUNT),
    "ta_fingerprint": (q_ta_fingerprint, SQL_TA_FINGERPRINT),
    # Spark-only (rows-only driver check)
    "ann_lsh_topk": (q_ann_lsh_topk, None),
    "t8_highlights": (q_t8_highlights, None),
    "mm_features": (q_mm_features, None),
    "s4_extract_pages": (q_s4_extract_pages, None),
}
