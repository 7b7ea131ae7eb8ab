"""Model-based quality filtering — the CCNet/fastText pipeline leg.

Heuristic signals (`textstats.quality_score`) catch degenerate shape;
the model pass catches degenerate *content*: a linear classifier over
hashed bag-of-ngrams features (the fastText architecture with a single
linear layer, as used by CCNet's Wikipedia-vs-crawl filter) scores each
document, and scoring is PURE COLUMN EXPRESSIONS — map-only, no
shuffle, no UDF, so at 100 TB it rides the same scan as every other
per-doc signal.

Design for cross-engine bit-exactness (the DuckDB oracle hash-checks
the scores):

- Features: distinct word unigrams + bigrams of the `simple_tokens`
  tokenizer, hashed into ``dim`` buckets via the md5-prefix family
  already proven engine-identical for MinHash
  (``conv(substring(md5(g),1,12),16,10) % dim``).
- Weights are fitted OFFLINE in numpy (deterministic full-batch
  logistic regression on an md5-ranked sample — the
  `similarity.ivf_centroids` pattern) and shipped QUANTIZED to int64 at
  scale 2^20.  The per-doc accumulation is therefore an INTEGER sum —
  associative and order-independent, immune to float reordering across
  engines — and only the final normalization touches doubles, with an
  identical literal expression on both sides.
- logit = sum(w_int[bucket(g)]) / (n_grams * 2^20) + bias; the output
  keeps the raw logit (`qm_score`) and `keep = logit >= 0`.  No sigmoid
  in the compared output: exp() is not bit-specified across runtimes,
  and the decision boundary is the same either way.

Reference anchor: the reference has no model-based filter (its quality
signals end at `search_engine.py` rule rescoring); this operator is the
LLM-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.textstats import (
    simple_tokens,
    word_ngrams,
)

QM_DIM = 512          # hashed feature buckets
QM_SCALE = 1 << 20    # weight quantization scale
QM_ITERS = 300
QM_LR = 1.0


def _py_tokens(text: str) -> list[str]:
    """Python twin of textstats.simple_tokens (lower, [^a-z] -> space,
    keep tokens of length >= 2) — used only by the offline fit."""
    return [t for t in re.sub(r"[^a-z]", " ", (text or "").lower()).split(" ")
            if len(t) >= 2]


def _py_grams(text: str) -> list[str]:
    toks = _py_tokens(text)
    grams = list(toks)
    grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    seen: set[str] = set()
    out = []
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _py_bucket(gram: str, dim: int = QM_DIM) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:12], 16) % dim


def featurize(texts: list[str], dim: int = QM_DIM) -> np.ndarray:
    """Averaged hashed-gram count vectors (float64, rows sum to 1 unless
    the doc has no grams)."""
    x = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        grams = _py_grams(t)
        if not grams:
            continue
        for g in grams:
            x[i, _py_bucket(g, dim)] += 1.0
        x[i] /= len(grams)
    return x


def fit_quality_model(pos_texts: list[str], neg_texts: list[str],
                      dim: int = QM_DIM, iters: int = QM_ITERS,
                      lr: float = QM_LR) -> tuple[np.ndarray, float]:
    """Deterministic full-batch logistic regression: returns (w, b) with
    positive = keep.  Fixed iteration count, float64, no data-dependent
    stopping — the same inputs always yield the same bits."""
    x = np.vstack([featurize(pos_texts, dim), featurize(neg_texts, dim)])
    y = np.concatenate([np.ones(len(pos_texts)), np.zeros(len(neg_texts))])
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    m = len(y)
    for _ in range(iters):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        w -= lr * (x.T @ err) / m
        b -= lr * float(err.mean())
    return w, b


def quantize_weights(w: np.ndarray, scale: int = QM_SCALE) -> list[int]:
    return [int(v) for v in np.round(w * scale).astype(np.int64)]


def _bucket_expr(g: Column | str, dim: int) -> Column:
    g = F.col(g) if isinstance(g, str) else g
    return F.conv(F.substring(F.md5(g), 1, 12), 16, 10).cast("long") % dim


def doc_grams(text_col: Column) -> Column:
    """Distinct unigram+bigram feature grams of a text column (bigrams
    contain a space, so the two families cannot collide)."""
    toks = simple_tokens(text_col)
    return F.array_distinct(F.concat(toks, word_ngrams(toks, 2)))


def score_quality_model(df: DataFrame, w_int: list[int], bias: float,
                        dim: int = QM_DIM, scale: int = QM_SCALE,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, qm_score, keep) for every document — map-only column plan.

    The weight table is ONE array literal (constant-folded by Catalyst,
    so the per-gram lookup inside the fold touches a materialized
    literal, not a rebuilt array — the PQ ADC distance-table pattern);
    the fold accumulates int64 exactly, and the single double division +
    addition at the end is the identical expression the DuckDB oracle
    runs."""
    w_lit = F.expr("array(" + ",".join(f"{v}L" for v in w_int) + ")")
    grams = doc_grams(F.coalesce(F.col(text_col), F.lit("")))
    df = df.withColumn("_grams", grams)
    sum_int = F.aggregate(
        F.col("_grams"), F.lit(0).cast("long"),
        lambda acc, g: acc + F.element_at(w_lit, (_bucket_expr(g, dim) + 1).cast("int")),
    )
    n = F.size("_grams")
    logit = F.when(n == 0, F.lit(float(bias))).otherwise(
        sum_int.cast("double") / (n.cast("double") * F.lit(float(scale)))
        + F.lit(float(bias))
    )
    return (
        df.withColumn("qm_score", logit)
        .select(
            F.col(id_col),
            "qm_score",
            (F.col("qm_score") >= 0.0).alias("keep"),
        )
    )


def score_sql(w_int: list[int], bias: float, dim: int = QM_DIM,
              scale: int = QM_SCALE, docs_cte: str = "documents") -> str:
    """DuckDB twin of score_quality_model over a relation named
    ``docs_cte`` with (doc_id, text) — same tokenizer, same md5 bucket,
    same integer accumulation, same final double expression."""
    return f"""
SELECT doc_id, qm_score, qm_score >= 0.0 AS keep FROM (
  SELECT doc_id,
         CASE WHEN len(grams) = 0 THEN {bias!r}
              ELSE CAST(list_sum(list_transform(grams,
                     g -> qmw[(('0x' || substr(md5(g), 1, 12))::BIGINT % {dim} + 1)::INT]
                   )) AS DOUBLE)
                   / (CAST(len(grams) AS DOUBLE) * {float(scale)!r}) + {bias!r}
         END AS qm_score
  FROM (
    SELECT doc_id,
           list_distinct(toks || CASE WHEN len(toks) >= 2
             THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
             ELSE [] END) AS grams,
           [{",".join(str(v) for v in w_int)}]::BIGINT[] AS qmw
    FROM (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(lower(coalesce(text, '')),
                                                     '[^a-z]', ' ', 'g'), ' '),
                         t -> length(t) >= 2) AS toks
      FROM {docs_cte}
    )
  )
)"""
