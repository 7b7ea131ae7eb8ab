"""Rule-based rescoring (SURVEY.md §2.6, U1-U8) as column expressions.

Transcribed from /root/reference/core/rules/rule_engine.py and
config/rules_config.yaml.  The reference mutates SearchResult.score in
Python loops over the top-k list; here every rule is a Spark column
expression applied to the top-k DataFrame (joined with document text), so
the same code path works on 20 rows or 20 million.

Reference semantics preserved exactly:
- boost words (:174-192): score multiplied by the rule weight once PER
  MATCHING WORD present in the content (the reference loops words inside
  the rule);
- domain rules (:195-212): multiplied ONCE if any matched domain word
  appears in the content; the detected domain is the FIRST (dict order)
  whose boost_words intersect the query (:122-132);
- doc-type weights (:215-227): multiply by weights[doc_type];
- time decay (:230-262): age_months = (now - warc_ts)/(30*24*3600);
  skipped if age > max_age_months (24); else score *= exp(-0.1*age);
- custom rules: content-length (:294-324, *0.8 if len<100) and
  keyword-density (:326-375, *0.9 if <0.005, *1.2 if >0.05).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# config/rules_config.yaml:4-59
DEFAULT_RULES = {
    "exclusion_words": ["广告", "赞助内容", "confidential"],
    "boost_words": [
        {"words": ["重要", "关键", "核心"], "weight": 1.5},
        {"words": ["紧急", "立即"], "weight": 2.0},
    ],
    "time_boost": {"enabled": True, "decay_rate": 0.1, "max_age_months": 24},
    "domain_rules": {
        "technical": {"boost_words": ["算法", "框架", "架构", "代码", "开发"], "weight": 1.3},
        "business": {"boost_words": ["方案", "规划", "战略", "市场", "客户"], "weight": 1.2},
    },
    "document_type_weights": {"pdf": 1.0, "docx": 1.0, "html": 0.9, "txt": 0.8, "xlsx": 0.7},
}


def process_query(query: str, rules: dict = DEFAULT_RULES) -> dict:
    """U1 (rule_engine.py:86-155): driver-side rule metadata for a query.
    (The exclusion-word pass is a faithful no-op — every branch of the
    reference passes, :104-119.)"""
    metadata: dict = {}
    for domain, drules in rules.get("domain_rules", {}).items():
        matches = [w for w in drules.get("boost_words", []) if w.lower() in query.lower()]
        if matches:
            metadata["domain"] = domain
            metadata["domain_weight"] = drules.get("weight", 1.0)
            metadata["domain_matched_words"] = matches
            break
    boost_matches = []
    for rule in rules.get("boost_words", []):
        matches = [w for w in rule["words"] if w.lower() in query.lower()]
        if matches:
            boost_matches.append({"words": matches, "weight": rule["weight"]})
    if boost_matches:
        metadata["boost_matches"] = boost_matches
    return metadata


def _content_lower(text_col: str) -> Column:
    return F.lower(F.coalesce(F.col(text_col), F.lit("")))


def apply_result_rules(
    results: DataFrame,
    query: str,
    rules: dict = DEFAULT_RULES,
    text_col: str = "text",
    score_col: str = "score",
    doc_type_col: str | None = None,
    warc_ts_col: str | None = "warc_ts",
    now_epoch: float | None = None,
) -> DataFrame:
    """U2-U6 (rule_engine.py:157-267) over a top-k DataFrame.

    ``now_epoch`` must be passed explicitly for determinism (tests pin
    it); production callers pass time.time().
    """
    meta = process_query(query, rules)
    content = _content_lower(text_col)
    score = F.col(score_col)

    # U2 boost words — one multiplication per matching word (:185-189)
    for rule in meta.get("boost_matches", []):
        for word in rule["words"]:
            score = score * F.when(
                content.contains(word.lower()), F.lit(float(rule["weight"]))
            ).otherwise(F.lit(1.0))

    # U3 domain — single multiplication if any matched word present (:205-208)
    if "domain" in meta:
        any_match = F.lit(False)
        for word in meta["domain_matched_words"]:
            any_match = any_match | content.contains(word.lower())
        score = score * F.when(
            any_match, F.lit(float(meta["domain_weight"]))
        ).otherwise(F.lit(1.0))

    # U4 doc-type weight (:215-227)
    if doc_type_col is not None:
        weights = rules.get("document_type_weights", {})
        expr = F.lit(1.0)
        for dt, w in weights.items():
            expr = F.when(F.col(doc_type_col) == dt, F.lit(float(w))).otherwise(expr)
        score = score * expr

    # U5 time decay (:230-262)
    tb = rules.get("time_boost", {})
    if tb.get("enabled") and warc_ts_col is not None and now_epoch is not None:
        age_months = (
            (F.lit(float(now_epoch)) - F.unix_timestamp(F.col(warc_ts_col)))
            / F.lit(30.0 * 24 * 60 * 60)
        )
        decay = F.exp(-F.lit(float(tb.get("decay_rate", 0.1))) * age_months)
        score = score * F.when(
            age_months > float(tb.get("max_age_months", 24)), F.lit(1.0)
        ).otherwise(decay)

    out = results.withColumn(score_col, score)
    # U6 re-sort (:265)
    return out.orderBy(F.desc(score_col), F.asc("doc_id"))


def rule_content_length(results: DataFrame, min_length: int = 100,
                        text_col: str = "text", score_col: str = "score") -> DataFrame:
    """U7 (:294-324)."""
    length = F.length(F.coalesce(F.col(text_col), F.lit("")))
    return results.withColumn(
        score_col,
        F.when(length < min_length, F.col(score_col) * 0.8).otherwise(F.col(score_col)),
    ).orderBy(F.desc(score_col), F.asc("doc_id"))


def rule_keyword_density(results: DataFrame, query: str, min_density: float = 0.005,
                         text_col: str = "text", score_col: str = "score") -> DataFrame:
    """U8 (:326-375): density = sum of substring counts / whitespace words."""
    terms = [t for t in query.lower().split() if t]
    if not terms:
        return results
    content = _content_lower(text_col)
    total_len = F.size(F.split(F.trim(content), r"\s+"))
    count_sum = F.lit(0)
    for t in terms:
        # occurrences of t as substring: (len - len(remove(t))) / len(t)
        count_sum = count_sum + (
            (F.length(content) - F.length(F.replace(content, F.lit(t), F.lit(""))))
            / F.lit(len(t))
        ).cast("long")
    density = F.when(total_len > 0, count_sum / total_len).otherwise(F.lit(None))
    return (
        results.withColumn("_density", density)
        .withColumn(
            score_col,
            F.when(F.col("_density").isNull(), F.col(score_col))
            .when(F.col("_density") < min_density, F.col(score_col) * 0.9)
            .when(F.col("_density") > 0.05, F.col(score_col) * 1.2)
            .otherwise(F.col(score_col)),
        )
        .drop("_density")
        .orderBy(F.desc(score_col), F.asc("doc_id"))
    )
