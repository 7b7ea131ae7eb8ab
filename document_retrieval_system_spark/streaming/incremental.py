"""Incremental index maintenance via Structured Streaming.

The reference "refreshes" by synchronously rescanning the filesystem and
skipping docs whose mtime is unchanged (retrieval_core.py:177-215,
indexer.py:405-411).  The Spark-native equivalent is a file-source stream
of new page batches feeding ``foreachBatch``, which appends **delta
segments** to the same index layout used by the batch builder:

  new pages ──readStream (parquet dir)
            ──foreachBatch── tokenize -> posting blocks -> append under
              postings/ with a fresh segment id; manifest row per batch
              (checkpointed by Spark's streaming offsets + our manifest).

Queries read base + delta segments transparently (they're all rows of the
same postings table; ``local_no`` for streamed docs continues beyond the
batch maximum per shard).  Periodic compaction = re-running the batch
builder over the union — exactly Iceberg's merge-on-read vs compaction
trade.  The mtime skip-check maps to dropping incoming urls whose
warc_ts <= the already-indexed timestamp (I6, indexer.py:443-445).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.analyze import doc_term_rows
from document_retrieval_system_spark.operators.index_build import (
    IndexPaths,
    add_doc_identity,
    build_postings,
    finalize_index,
    tokenize_docs,
)
from document_retrieval_system_spark.sources.corpus import PAGES_DDL


def _append_batch(spark: SparkSession, batch_df: DataFrame, batch_id: int,
                  paths: IndexPaths, n_shards: int) -> None:
    if batch_df.isEmpty():
        return
    docs = add_doc_identity(batch_df, n_shards)

    # I6 incremental-upsert guard: drop urls already indexed with
    # warc_ts >= incoming (indexer.py:443-445).
    try:
        existing = spark.read.parquet(paths.docs).select(
            "doc_id", F.col("warc_ts").alias("old_ts")
        )
        docs = (
            docs.join(existing, "doc_id", "left")
            .filter(F.col("old_ts").isNull() | (F.col("warc_ts") > F.col("old_ts")))
            .drop("old_ts")
        )
        offsets = {
            r["shard"]: r["mx"]
            for r in spark.read.parquet(paths.docs)
            .groupBy("shard").agg(F.max("local_no").alias("mx")).collect()
        }
    except Exception:
        offsets = {}

    if docs.isEmpty():
        return

    # continue local_no numbering after the existing docs of each shard
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("doc_id")
    off_expr = F.lit(0).cast("long")
    for shard, mx in offsets.items():
        off_expr = F.when(F.col("shard") == shard, F.lit(mx + 1)).otherwise(off_expr)
    docs = docs.withColumn(
        "local_no", (F.row_number().over(w) - 1).cast("long") + off_expr
    )
    # localCheckpoint (eager) truncates lineage: tok's plan reads
    # paths.docs for the upsert guard, and the docs append below would
    # otherwise poison any recomputation (the re-read guard would see the
    # batch's own rows and filter the whole batch out of the postings
    # write).  On a cluster use checkpoint() with a reliable dir instead.
    tok = tokenize_docs(docs).localCheckpoint(eager=True)
    tok.select(
        "shard", "local_no", "doc_id", "url", "warc_ts", "lang",
        "title", "text", "doc_len",
    ).write.partitionBy("shard").mode("append").parquet(paths.docs)
    build_postings(doc_term_rows(tok)).write.partitionBy("shard").mode(
        "append"
    ).parquet(paths.postings)
    tok.groupBy("shard").agg(
        F.count("*").alias("docs_parsed"),
        F.sum(F.when(F.col("doc_len") > 0, 1).otherwise(0)).alias("docs_indexed"),
    ).withColumn("postings_emitted", F.lit(None).cast("long")) \
     .withColumn("blocks", F.lit(None).cast("long")) \
     .withColumn("doc_bytes", F.lit(None).cast("long")) \
     .withColumn("tf_bytes", F.lit(None).cast("long")) \
     .withColumn("dl_bytes", F.lit(None).cast("long")) \
     .withColumn("pos_bytes", F.lit(None).cast("long")) \
     .withColumn("status", F.lit(f"stream-batch-{batch_id}")) \
     .coalesce(1).write.mode("append").parquet(paths.manifest)


def run_incremental(spark: SparkSession, incoming_dir: str, index_dir: str,
                    checkpoint_dir: str, n_shards: int = 32,
                    finalize: bool = True) -> None:
    """Process all currently-available new-page files once (availableNow),
    then refresh global stats.  Long-running deployments drop
    availableNow and leave the stream up."""
    paths = IndexPaths(index_dir)
    stream = (
        spark.readStream.schema(PAGES_DDL).parquet(incoming_dir)
    )
    query = (
        stream.writeStream.foreachBatch(
            lambda df, bid: _append_batch(spark, df, bid, paths, n_shards)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if finalize:
        finalize_index(spark, paths)
