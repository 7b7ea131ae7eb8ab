"""Term/shard skew soak (SURVEY.md §2.7 heavy-term mandate).

Builds an index over a deliberately skewed corpus — one term in ~50% of
documents, one shard holding ~40% of them — and measures the posting
build stage per partition, asserting the design claims hold under skew:

- the (shard, term) group key spreads a heavy term across every shard,
  so no partition of the block-build stage holds more than one shard's
  share of it (max per-shard df fraction ~ 1/n_shards);
- straggler bound: the slowest non-empty partition of the build stage
  stays within a small factor of the median;
- blocks stay bounded under skew: every block's n <= BLOCK_SIZE.

Run: python tools/bench_skew.py   (prints one JSON line)
The pytest twin (tests/test_skew_soak.py) runs a smaller corpus with
hard assertions.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.analyze import doc_term_rows
from document_retrieval_system_spark.operators.codec import BLOCK_SIZE
from document_retrieval_system_spark.operators.index_build import (
    ListAccumulatorParam,
    add_doc_identity,
    assign_local_no,
    build_postings,
    tokenize_docs,
)
from document_retrieval_system_spark.sources.corpus import EN_VOCAB

HOT_TERM = "hotterm"


def skewed_pages(spark, n_docs: int, n_shards: int,
                 hot_shard_frac: float = 0.4, seed: int = 7):
    """Text-only pages with a hot term (p=0.5, tf 1-3) and a hot shard:
    candidate urls are pre-assigned to shards and resampled so one shard
    holds ~hot_shard_frac of the corpus."""
    cand = [f"https://skew{i}.example.com/p/{i}" for i in range(3 * n_docs)]
    cdf = add_doc_identity(
        spark.createDataFrame([(u,) for u in cand], "url string"), n_shards
    ).select("url", "shard").collect()
    hot = [r["url"] for r in cdf if r["shard"] == 0]
    rest = [r["url"] for r in cdf if r["shard"] != 0]
    n_hot = min(int(n_docs * hot_shard_frac), len(hot))
    urls = hot[:n_hot] + rest[: n_docs - n_hot]

    import random

    rows = []
    for i, u in enumerate(urls):
        rng = random.Random((seed << 32) ^ i)
        words = rng.choices(EN_VOCAB, k=30)
        if i % 2 == 0:
            for _ in range(1 + i % 3):
                words.insert(rng.randrange(len(words) + 1), HOT_TERM)
        rows.append((u, " ".join(words)))
    return spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def run_soak(spark, n_docs: int = 12_000, n_shards: int = 8,
             hot_shard_frac: float = 0.4) -> dict:
    from document_retrieval_system_spark.operators.textstats import (
        simple_process_text,
    )

    pages = skewed_pages(spark, n_docs, n_shards, hot_shard_frac)
    base = add_doc_identity(pages, n_shards)
    tok = assign_local_no(
        tokenize_docs(base, analyzer=simple_process_text)
    ).persist()
    try:
        acc = spark.sparkContext.accumulator([], ListAccumulatorParam())
        t0 = time.time()
        blocks = build_postings(doc_term_rows(tok), timing_acc=acc).localCheckpoint(
            eager=True
        )
        build_sec = time.time() - t0

        shard_counts = {
            r["shard"]: r["count"]
            for r in tok.groupBy("shard").count().collect()
        }
        hot_blocks = blocks.filter(F.col("term") == HOT_TERM)
        hot_stats = hot_blocks.groupBy("shard").agg(
            F.max("df_local").alias("df"),
            F.count("*").alias("n_blocks"),
            F.max("n").alias("max_n"),
        ).collect()
        hot_df_by_shard = {r["shard"]: r["df"] for r in hot_stats}
        total_hot = sum(hot_df_by_shard.values())
        max_block_n = blocks.agg(F.max("n")).collect()[0][0]

        times = [t for (_p, t, r) in acc.value if r > 0]
        rows = [r for (_p, t, r) in acc.value if r > 0]
        med_t = statistics.median(times)
        med_r = statistics.median(rows)
        return {
            "n_docs": n_docs,
            "n_shards": n_shards,
            "shard_doc_counts": {str(k): v for k, v in sorted(shard_counts.items())},
            "hot_term": {
                "total_df": total_hot,
                "df_by_shard": {str(k): v for k, v in sorted(hot_df_by_shard.items())},
                "max_shard_frac": round(max(hot_df_by_shard.values()) / total_hot, 4),
                "n_shards_present": len(hot_df_by_shard),
                "max_block_n": max(r["max_n"] for r in hot_stats),
            },
            "max_block_n": int(max_block_n),
            "block_size": BLOCK_SIZE,
            "build_sec": round(build_sec, 3),
            "postings_stage_partitions": {
                "n_nonempty": len(times),
                "time_max": round(max(times), 4),
                "time_median": round(med_t, 4),
                "time_ratio": round(max(times) / med_t, 3),
                "rows_max": max(rows),
                "rows_median": med_r,
                "rows_ratio": round(max(rows) / med_r, 3),
            },
        }
    finally:
        tok.unpersist()


def main() -> None:
    import os

    from document_retrieval_system_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("drs-skew", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = run_soak(spark, n_docs=40_000, n_shards=16)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
