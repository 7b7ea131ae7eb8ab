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

import os

from document_retrieval_system_spark.operators.analyze import doc_term_rows
from document_retrieval_system_spark.operators.index_build import (
    MANIFEST_COLS,
    IndexPaths,
    add_doc_identity,
    block_counter_agg,
    build_postings,
    decoded_term_rows,
    finalize_index,
    fs_delete,
    fs_exists,
    fs_touch,
    tokenize_docs,
    _read_postings_or_empty,
)
from document_retrieval_system_spark.sources.corpus import PAGES_DDL

# test fault injection: called between the docs overwrite and the
# postings overwrite of a shard rewrite (the replay crash window)
_AFTER_DOCS_WRITE_HOOK = None

DOC_COLS = [
    "shard", "local_no", "doc_id", "url", "warc_ts", "lang",
    "title", "text", "doc_len",
]


def _manifest_rows(tok: DataFrame, status: str, kind: str = "append",
                   blocks: DataFrame | None = None) -> DataFrame:
    """One manifest event row per shard of ``tok`` (columns =
    MANIFEST_COLS).  ``blocks`` adds posting/compression counters —
    append-delta counters for kind='append', full post-event shard
    totals for kind='snapshot' (manifest_stats relies on this)."""
    base = tok.groupBy("shard").agg(
        F.count("*").alias("docs_parsed"),
        F.sum(F.when(F.col("doc_len") > 0, 1).otherwise(0)).alias("docs_indexed"),
    )
    if blocks is None:
        for c in ["postings_emitted", "blocks", "doc_bytes", "tf_bytes",
                  "dl_bytes", "pos_bytes"]:
            base = base.withColumn(c, F.lit(None).cast("long"))
    else:
        base = base.join(block_counter_agg(blocks), "shard", "left")
    return (
        base.withColumn("status", F.lit(status))
        .withColumn("kind", F.lit(kind))
        .withColumn("committed_at", F.current_timestamp())
        .select(*MANIFEST_COLS)
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

    # url order within the batch — same locality rule as assign_local_no
    w = Window.partitionBy("shard").orderBy("url")
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
    blocks = build_postings(doc_term_rows(tok)).localCheckpoint(eager=True)
    blocks.write.partitionBy("shard").mode("append").parquet(paths.postings)
    _manifest_rows(
        tok, f"stream-batch-{batch_id}", kind="append", blocks=blocks
    ).coalesce(1).write.mode("append").parquet(paths.manifest)


def _rewrite_updated_shards(spark: SparkSession, batch_aff: DataFrame,
                            affected: list[int], batch_id: int,
                            paths: IndexPaths) -> None:
    """remove_document equivalent (indexer.py:405-411) at shard
    granularity: rebuild the affected shards' docs + postings from
    (old rows minus superseded doc_ids) + (this batch's rows), with
    fresh dense local_no, and swap them in via dynamic partition
    overwrite.  Bounded by the updated shards — untouched shards are
    never read or written.

    Analyzer work is proportional to the BATCH, not the shard (r2
    re-tokenized every surviving doc of an updated shard — ~250k
    re-analyses to update 1 doc): survivors keep their stored docs-table
    row, and their posting rows are recovered from the existing
    compressed blocks (``decoded_term_rows`` — vectorized codec + byte
    slicing) and re-blocked together with the fresh rows' postings.

    ``local_no`` is STABLE: survivors keep their ordinal forever and
    fresh rows (including new versions of updated docs) allocate past
    the shard's current max, leaving holes where versions died.  This is
    the crash-replay correctness anchor: a docs↔postings join on
    (shard, local_no) can never misattribute rows, because an ordinal is
    bound to exactly one doc version for the life of the shard — after a
    crash between the docs and postings overwrites, surviving ordinals
    still mean the same docs, and orphaned posting ordinals (a rewritten
    doc's old number) simply have no docs row and drop out of the inner
    join below.  (Renumbering survivors densely — the r2 design — made
    replay silently shift every posting row one doc over whenever the
    crashed attempt inserted a new doc into the shard.)  The holes cost
    only slightly larger docID deltas; gap-aligned block splitting
    already handles sparse ranges."""
    superseded = batch_aff.select("doc_id")
    shard_filter = F.col("shard").isin([int(s) for s in affected])
    old_docs = spark.read.parquet(paths.docs).filter(shard_filter)
    # first-ever batch crash window: docs appended, postings never
    # created — replay must see an empty blocks frame, not PATH_NOT_FOUND
    old_blocks = _read_postings_or_empty(spark, paths).filter(shard_filter)

    # the ONLY analyzer invocation: this batch's rows (checkpointed so the
    # two consumers below don't re-run the UDF)
    fresh_tok = tokenize_docs(batch_aff).localCheckpoint(eager=True)

    surv_meta = (
        old_docs.join(superseded, "doc_id", "left_anti")
        .select("doc_id", "url", "warc_ts", "lang", "title", "text", "doc_len",
                "shard", "local_no")
    )
    # fresh rows allocate past max(local_no) over ALL old rows (superseded
    # included) so no ordinal is ever reused by a different doc version
    from pyspark.sql import Window

    base = old_docs.groupBy("shard").agg(F.max("local_no").alias("_base"))
    # url order within the batch — same locality rule as assign_local_no
    w = Window.partitionBy("shard").orderBy("url")
    fresh_meta = (
        fresh_tok.select("doc_id", "url", "warc_ts", "lang", "title", "text",
                         "doc_len", "shard")
        .join(base, "shard", "left")
        .withColumn(
            "local_no",
            (F.coalesce(F.col("_base"), F.lit(-1).cast("long"))
             + F.row_number().over(w)).cast("long"),
        )
        .drop("_base")
    )
    tok = surv_meta.unionByName(fresh_meta)
    # the plan reads paths.docs which is about to be overwritten — freeze
    tok = tok.localCheckpoint(eager=True)
    new_no = tok.select("doc_id", "shard", "local_no")

    # fresh posting rows: fused-UDF terms joined to the fresh numbering
    fresh_rows = doc_term_rows(
        fresh_tok.select("doc_id", "doc_len", "terms", "shard")
        .join(new_no, ["doc_id", "shard"])
    )
    # survivor posting rows keep their ordinals: the (shard, local_no)
    # inner join drops orphans (ordinals no docs row claims — superseded
    # versions after a crashed attempt), the anti-join drops this batch's
    # superseded docs
    old_map = old_docs.select("shard", "local_no", "doc_id")
    surv_rows = (
        decoded_term_rows(old_blocks)
        .join(old_map, ["shard", "local_no"])
        .join(superseded, "doc_id", "left_anti")
        .select("shard", "local_no", "term", "tf", "pos_bytes", "doc_len")
    )
    blocks = build_postings(
        fresh_rows.unionByName(surv_rows)
    ).localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            tok.select(*DOC_COLS)
            .repartition(len(affected), "shard")
            .sortWithinPartitions("local_no")
            .write.partitionBy("shard").mode("overwrite").parquet(paths.docs)
        )
        if _AFTER_DOCS_WRITE_HOOK is not None:
            _AFTER_DOCS_WRITE_HOOK()
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
    got = {r["shard"] for r in blocks.select("shard").distinct().collect()}
    for s in set(int(x) for x in affected) - got:
        fs_delete(spark, os.path.join(paths.postings, f"shard={s}"))
    # snapshot rows: docs_parsed counts THIS batch's parses only (the
    # lineage event — survivors were not re-parsed), posting counters are
    # the full post-rewrite shard totals, superseding earlier history
    _manifest_rows(
        fresh_tok, f"stream-update-batch-{batch_id}", kind="snapshot",
        blocks=blocks,
    ).coalesce(1).write.mode("append").parquet(paths.manifest)


def _intent_marker(paths: IndexPaths, batch_id: int) -> str:
    return os.path.join(paths.root, "stream_intents", f"batch-{batch_id}")


def _append_batch(spark: SparkSession, batch_df: DataFrame, batch_id: int,
                  paths: IndexPaths, n_shards: int) -> None:
    if batch_df.isEmpty():
        return
    docs = add_doc_identity(batch_df, n_shards)

    # Idempotency across crash/replay: an intent marker is written before
    # ANY mutation and deleted only after the manifest commit.  If this
    # batch_id's marker already exists, a previous attempt died mid-write
    # (e.g. docs overwritten, postings not — Structured Streaming then
    # replays the same batch, whose rows now carry warc_ts EQUAL to the
    # stored ones).  The strict `>` guard would silently drop those rows
    # and leave docs/postings numbering divergent forever; under an
    # incomplete marker the guard widens to `>=` and every equal-ts
    # re-send routes through the shard rewrite, which rebuilds from
    # (survivors ∪ batch) and is idempotent by construction.
    intent = _intent_marker(paths, batch_id)
    replay_incomplete = fs_exists(spark, intent)

    # I6 incremental-upsert guard: drop urls already indexed with
    # warc_ts >= incoming (indexer.py:443-445); flag true updates.
    have_docs = fs_exists(spark, paths.docs)
    if have_docs:
        existing = spark.read.parquet(paths.docs).select(
            "doc_id", F.col("warc_ts").alias("old_ts")
        )
        newer = (
            (F.col("warc_ts") >= F.col("old_ts")) if replay_incomplete
            else (F.col("warc_ts") > F.col("old_ts"))
        )
        docs = (
            docs.join(existing, "doc_id", "left")
            .filter(F.col("old_ts").isNull() | newer)
            .withColumn("is_update", F.col("old_ts").isNotNull())
            .drop("old_ts")
        )
    else:
        docs = docs.withColumn("is_update", F.lit(False))
    # freeze before ANY write below mutates paths this plan reads
    docs = docs.localCheckpoint(eager=True)
    if docs.isEmpty():
        fs_delete(spark, intent)  # nothing to redo; clear a stale marker
        return

    affected = [
        int(r["shard"])
        for r in docs.filter("is_update").select("shard").distinct().collect()
    ]
    ins = docs.drop("is_update")
    if affected:
        ins = ins.filter(~F.col("shard").isin(affected))
    fs_touch(spark, intent)  # intent BEFORE the first mutation
    if not ins.isEmpty():
        _append_inserts(spark, ins, batch_id, paths, have_docs)
    if affected:
        batch_aff = docs.drop("is_update").filter(F.col("shard").isin(affected))
        _rewrite_updated_shards(spark, batch_aff, affected, batch_id, paths)
    fs_delete(spark, intent)  # commit point: marker gone = batch complete


def compact_shards(spark: SparkSession, paths: IndexPaths,
                   shards: list[int] | None = None) -> None:
    """Merge delta posting segments — the compaction half of the
    documented Iceberg merge-on-read analogue (module docstring): after N
    append batches a (shard, term) posting list is scattered over N small
    segments, each with its own (possibly single-posting) blocks and its
    own block-max rows for WAND to sweep.  Compaction decodes every
    posting row of the target shards (vectorized codec; position payloads
    byte-sliced, never re-encoded; the analyzer NEVER runs) and re-runs
    the batch block builder, collapsing the segments into one gap-aligned
    BLOCK_SIZE-packed segment per (shard, term).  Docs partitions are
    untouched; query results are identical with fewer, fuller blocks.

    A deployment runs this on a cadence (every N stream batches / when a
    shard's manifest shows segment count above a threshold).

    The rewrite itself is ``rebuild_shard_postings`` (decode → re-block →
    dynamic overwrite → snapshot manifest rows, docs join dropping any
    orphans), guarded by the maintenance intent marker: a crash between
    the postings overwrite and the manifest snapshot would otherwise
    leave the shard's counters stale with no record that a rewrite
    happened — the surviving marker repairs it on the next entry."""
    from document_retrieval_system_spark.operators.index_build import (
        maintenance_intent_path,
        rebuild_shard_postings,
        repair_maintenance,
        write_maintenance_intent,
    )

    repair_maintenance(spark, paths)
    if shards is None:
        shards = sorted(
            r["shard"]
            for r in _read_postings_or_empty(spark, paths)
            .select("shard").distinct().collect()
        )
    if not shards:
        return
    write_maintenance_intent(spark, paths, "compaction", list(shards))
    rebuild_shard_postings(spark, paths, list(shards), status="compaction")
    fs_delete(spark, maintenance_intent_path(paths))


def run_incremental(spark: SparkSession, incoming_dir: str, index_dir: str,
                    checkpoint_dir: str, n_shards: int = 32,
                    finalize: bool = True, compact: bool = False) -> None:
    """Process all currently-available new-page files once (availableNow),
    then refresh global stats.  Long-running deployments drop
    availableNow and leave the stream up."""
    paths = IndexPaths(index_dir)
    from document_retrieval_system_spark.operators.index_build import (
        repair_maintenance,
    )

    if fs_exists(spark, paths.docs):
        repair_maintenance(spark, paths)
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
    if compact:
        compact_shards(spark, paths)
    if finalize:
        finalize_index(spark, paths)
