"""Incremental index maintenance via Structured Streaming.

The reference "refreshes" by synchronously rescanning the filesystem and
skipping docs whose mtime is unchanged (retrieval_core.py:177-215), and
calls remove_document before re-adding a changed file (indexer.py:405-411).
The Spark-native equivalent is a file-source stream of new page batches
feeding ``foreachBatch``:

- **inserts** (urls never seen) append **delta segments** to the same
  index layout the batch builder writes: docs + posting blocks under a
  fresh ``local_no`` range per shard, manifest row per batch.
- **updates** (url re-sent with newer warc_ts) map the reference's
  remove-then-add: the affected shards' docs and postings partitions are
  REWRITTEN without the superseded rows (dynamic partition overwrite),
  so no stale version survives — queries can never see the same doc_id
  twice and df/corpus stats never double-count.  Untouched shards keep
  the pure-append fast path.
- re-sends with warc_ts <= the indexed version are dropped (the mtime
  skip-check, indexer.py:443-445).

Queries read base + delta segments transparently (all rows of the same
postings table).  Periodic compaction = re-running the batch builder
over the union — exactly Iceberg's merge-on-read vs compaction trade;
the per-shard rewrite here is merge-on-WRITE for updates, which keeps
every query path (WAND, boolean, phrase) free of tombstone filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.analyze import doc_term_rows
from document_retrieval_system_spark.operators.index_build import (
    IndexPaths,
    add_doc_identity,
    assign_local_no,
    build_postings,
    finalize_index,
    fs_delete,
    fs_exists,
    tokenize_docs,
)
from document_retrieval_system_spark.sources.corpus import PAGES_DDL

DOC_COLS = [
    "shard", "local_no", "doc_id", "url", "warc_ts", "lang",
    "title", "text", "doc_len",
]


def _manifest_rows(tok: DataFrame, status: str) -> DataFrame:
    return (
        tok.groupBy("shard")
        .agg(
            F.count("*").alias("docs_parsed"),
            F.sum(F.when(F.col("doc_len") > 0, 1).otherwise(0)).alias("docs_indexed"),
        )
        .withColumn("postings_emitted", F.lit(None).cast("long"))
        .withColumn("blocks", F.lit(None).cast("long"))
        .withColumn("doc_bytes", F.lit(None).cast("long"))
        .withColumn("tf_bytes", F.lit(None).cast("long"))
        .withColumn("dl_bytes", F.lit(None).cast("long"))
        .withColumn("pos_bytes", F.lit(None).cast("long"))
        .withColumn("status", F.lit(status))
    )


def _append_inserts(spark: SparkSession, ins: DataFrame, batch_id: int,
                    paths: IndexPaths, have_docs: bool) -> None:
    """Pure-append fast path for shards with no superseded versions."""
    offsets = {}
    if have_docs:
        offsets = {
            r["shard"]: r["mx"]
            for r in spark.read.parquet(paths.docs)
            .groupBy("shard").agg(F.max("local_no").alias("mx")).collect()
        }
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("doc_id")
    off_expr = F.lit(0).cast("long")
    for shard, mx in offsets.items():
        off_expr = F.when(F.col("shard") == shard, F.lit(mx + 1)).otherwise(off_expr)
    ins = ins.withColumn(
        "local_no", (F.row_number().over(w) - 1).cast("long") + off_expr
    )
    # localCheckpoint (eager) truncates lineage: the plan reads paths.docs
    # (offsets + upsert guard) and the append below would poison any
    # recomputation.  On a cluster use checkpoint() with a reliable dir.
    tok = tokenize_docs(ins).localCheckpoint(eager=True)
    tok.select(*DOC_COLS).write.partitionBy("shard").mode("append").parquet(paths.docs)
    build_postings(doc_term_rows(tok)).write.partitionBy("shard").mode(
        "append"
    ).parquet(paths.postings)
    _manifest_rows(tok, f"stream-batch-{batch_id}").coalesce(1).write.mode(
        "append"
    ).parquet(paths.manifest)


def _rewrite_updated_shards(spark: SparkSession, batch_aff: DataFrame,
                            affected: list[int], batch_id: int,
                            paths: IndexPaths) -> None:
    """remove_document equivalent (indexer.py:405-411) at shard
    granularity: rebuild the affected shards' docs + postings from
    (old rows minus superseded doc_ids) + (this batch's rows), with
    fresh dense local_no, and swap them in via dynamic partition
    overwrite.  Bounded by the updated shards — untouched shards are
    never read or written."""
    superseded = batch_aff.select("doc_id")
    old = spark.read.parquet(paths.docs).filter(
        F.col("shard").isin([int(s) for s in affected])
    )
    survivors = old.join(superseded, "doc_id", "left_anti").select(
        "url", "warc_ts",
        F.lit(None).cast("binary").alias("html"),
        "text", "lang", "doc_id", "shard",
        # keep the stored title: re-analysis of extracted text would
        # otherwise regress title to the url basename
        F.col("title").alias("_old_title"),
    )
    fresh = batch_aff.select(
        "url", "warc_ts", "html", "text", "lang", "doc_id", "shard",
        F.lit(None).cast("string").alias("_old_title"),
    )
    union = survivors.unionByName(fresh)
    tok = assign_local_no(tokenize_docs(union))
    tok = tok.withColumn(
        "title", F.coalesce("_old_title", "title")
    ).drop("_old_title")
    # the plan reads paths.docs which is about to be overwritten — freeze
    tok = tok.localCheckpoint(eager=True)
    blocks = build_postings(doc_term_rows(tok)).localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            tok.select(*DOC_COLS)
            .repartition(len(affected), "shard")
            .sortWithinPartitions("local_no")
            .write.partitionBy("shard").mode("overwrite").parquet(paths.docs)
        )
        (
            blocks.repartition(len(affected), "shard")
            .sortWithinPartitions("term", "block_no")
            .write.partitionBy("shard").mode("overwrite").parquet(paths.postings)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # a shard whose rebuilt postings are EMPTY (every surviving doc
    # tokenizes empty) is absent from `blocks`, so dynamic overwrite left
    # its stale partition behind — drop it explicitly
    import os

    got = {r["shard"] for r in blocks.select("shard").distinct().collect()}
    for s in set(int(x) for x in affected) - got:
        fs_delete(spark, os.path.join(paths.postings, f"shard={s}"))
    _manifest_rows(tok, f"stream-update-batch-{batch_id}").coalesce(1).write.mode(
        "append"
    ).parquet(paths.manifest)


def _append_batch(spark: SparkSession, batch_df: DataFrame, batch_id: int,
                  paths: IndexPaths, n_shards: int) -> None:
    if batch_df.isEmpty():
        return
    docs = add_doc_identity(batch_df, n_shards)

    # I6 incremental-upsert guard: drop urls already indexed with
    # warc_ts >= incoming (indexer.py:443-445); flag true updates.
    have_docs = fs_exists(spark, paths.docs)
    if have_docs:
        existing = spark.read.parquet(paths.docs).select(
            "doc_id", F.col("warc_ts").alias("old_ts")
        )
        docs = (
            docs.join(existing, "doc_id", "left")
            .filter(F.col("old_ts").isNull() | (F.col("warc_ts") > F.col("old_ts")))
            .withColumn("is_update", F.col("old_ts").isNotNull())
            .drop("old_ts")
        )
    else:
        docs = docs.withColumn("is_update", F.lit(False))
    # freeze before ANY write below mutates paths this plan reads
    docs = docs.localCheckpoint(eager=True)
    if docs.isEmpty():
        return

    affected = [
        int(r["shard"])
        for r in docs.filter("is_update").select("shard").distinct().collect()
    ]
    ins = docs.drop("is_update")
    if affected:
        ins = ins.filter(~F.col("shard").isin(affected))
    if not ins.isEmpty():
        _append_inserts(spark, ins, batch_id, paths, have_docs)
    if affected:
        batch_aff = docs.drop("is_update").filter(F.col("shard").isin(affected))
        _rewrite_updated_shards(spark, batch_aff, affected, batch_id, paths)


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
