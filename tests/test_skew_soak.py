"""Heavy-term / hot-shard skew soak (SURVEY.md §2.7): the (shard, term)
posting group key must bound what any one reducer holds of a heavy term,
the block builder's partitions must stay straggler-free, and blocks must
stay BLOCK_SIZE-bounded under skew.  tools/bench_skew.py is the larger
recorded twin (numbers in BENCH/BASELINE.md)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import bench_skew


def test_skew_soak_straggler_and_block_bounds(spark):
    out = bench_skew.run_soak(spark, n_docs=6_000, n_shards=8,
                              hot_shard_frac=0.4)

    # hot shard actually constructed (~40% of docs in shard 0)
    counts = out["shard_doc_counts"]
    assert counts["0"] >= 0.3 * out["n_docs"]

    hot = out["hot_term"]
    # heavy term present in half the corpus...
    assert hot["total_df"] >= 0.45 * out["n_docs"]
    # ...and spread over EVERY shard: no reducer ever holds more than the
    # hot shard's share of it (the salted-aggregation design claim)
    assert hot["n_shards_present"] == out["n_shards"]
    assert hot["max_shard_frac"] <= 0.5  # ~hot_shard_frac, never ~1.0

    # blocks bounded under skew
    assert out["max_block_n"] <= out["block_size"]
    assert hot["max_block_n"] <= out["block_size"]

    # straggler bound on the block-build stage: slowest non-empty
    # partition within a small factor of the median (rows deterministic,
    # time with local-mode jitter headroom)
    parts = out["postings_stage_partitions"]
    assert parts["rows_ratio"] <= 3.0, parts
    assert parts["time_ratio"] <= 5.0, parts
