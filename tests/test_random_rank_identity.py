"""Randomized rank-identity: random corpora + random queries, Spark ==
oracle for BM25 (exhaustive + WAND) and TF-IDF.  Catches tie/edge cases
the fixed corpus might miss (identical docs, df==N terms, k boundaries,
min_score interplay)."""

import random
import shutil
import tempfile

import pytest

from document_retrieval_system_spark.operators.index_build import (
    IndexReader,
    build_index,
)
from document_retrieval_system_spark.operators.search import bm25_search, tfidf_search
from document_retrieval_system_spark.operators.wand import bm25_wand_search
from document_retrieval_system_spark.oracle import OracleEngine, doc_id_of

# letters only: the analyzer strips digits and drops 1-char tokens
VOCAB = [f"w{chr(97 + i // 6)}{chr(97 + i % 6)}" for i in range(40)]


def _random_corpus(seed: int, n_docs: int):
    rng = random.Random(seed)
    pages = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.1:  # exact duplicates -> score ties
            text = pages[rng.randrange(len(pages))][1]
        else:
            n = rng.randint(0, 60)
            # zipf-ish head + uniform tail
            words = [
                VOCAB[min(int(rng.expovariate(0.15)), len(VOCAB) - 1)]
                for _ in range(n)
            ]
            text = " ".join(words)
        pages.append((f"https://r{seed}.example.com/{i}", text))
    return pages


def _random_queries(seed: int):
    rng = random.Random(seed * 31 + 7)
    qs = []
    for _ in range(6):
        n = rng.randint(1, 4)
        terms = [rng.choice(VOCAB + ["zzzoov"]) for _ in range(n)]
        k = rng.choice([1, 3, 10, 1000])
        ms = rng.choice([0.0, 0.1, 0.5])
        qs.append((" ".join(terms), k, ms))
    return qs


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_corpus_rank_identity(spark, seed):
    pages = _random_corpus(seed, 80)
    df = spark.createDataFrame(
        [(u, None, t, "en") for u, t in pages],
        "url string, html binary, text string, lang string",
    ).selectExpr("url", "timestamp('2025-01-01') as warc_ts", "html", "text", "lang")

    # analyzer: the full reference pipeline (stемming applies to w1..w40
    # trivially: porter leaves them unchanged)
    oracle = OracleEngine([(doc_id_of(u), t, "en") for u, t in pages])

    idx = tempfile.mkdtemp(prefix=f"drs_rand_{seed}_")
    try:
        build_index(spark, df, idx, n_shards=4)
        reader = IndexReader(spark, idx)
        for query, k, ms in _random_queries(seed):
            want_bm = oracle.bm25(query, "en", k, ms)
            got_bm = [(r["doc_id"], r["score"]) for r in
                      bm25_search(reader, query, "en", k, ms).collect()]
            assert [g[0] for g in got_bm] == [w[0] for w in want_bm], (query, k, ms)
            for (gd, gs), (_wd, ws) in zip(got_bm, want_bm):
                assert gs == pytest.approx(ws, rel=1e-9), (query, gd)

            got_wand = [(r["doc_id"], r["score"]) for r in
                        bm25_wand_search(reader, query, "en", k, ms).collect()]
            assert got_wand == got_bm or [
                (d, pytest.approx(s, rel=1e-12)) for d, s in got_wand
            ] == got_bm, (query, k, ms)

            want_tf = oracle.tfidf(query, "en", k, ms)
            got_tf = [(r["doc_id"], r["score"]) for r in
                      tfidf_search(reader, query, "en", k, ms).collect()]
            assert [g[0] for g in got_tf] == [w[0] for w in want_tf], (query, k, ms)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
