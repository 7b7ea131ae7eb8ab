"""Distributed inverted-index construction (SURVEY.md §2.3, §3.2).

Replaces the reference's single-threaded dict mutation
(indexer.py:377-426 + add_document :44-93) with a two-shuffle Spark plan:

  pages ──map── doc_id=md5(url), shard=pmod(xxhash64(doc_id), n_shards)
        ──map── ONE fused Arrow UDF: extract_text -> tokenize -> per-doc
                term stats (I1, indexer.py:59-67), positions pre-varbyte'd;
                html dropped here so no shuffle ever moves page bytes
        ──shuffle 1── row_number over (shard, doc_id)  -> dense local_no
        ──shuffle 2── repartition(shard, term) + sorted-run mapInPandas
                      -> delta+varbyte posting blocks with block-max
                         metadata (max_tf, min_dl)
        ──write── postings/ docs/ partitioned by shard, sorted by term

Design notes for 10^12 docs / 1000 executors:

- **Document-sharded index.** Each shard holds complete postings for its
  doc subset; queries fan out over shards (classic distributed IR), which
  is what lets block-max WAND run document-at-a-time per shard with no
  cross-shard coordination, and bounds heavy-term posting lists by shard
  size (natural skew cap — the "salted aggregation": a heavy term's
  groupBy key space is (shard, term), never a single reducer).
- **Dense per-shard docIDs.** ``local_no`` = row_number within shard —
  sorted dense ids make docID deltas ~1 varbyte.  Global identity stays
  (shard, local_no) <-> doc_id in the docs table.
- **Block-max metadata is avgdl-independent.** Blocks store (max_tf,
  min_dl); the BM25 upper bound tf_norm(max_tf, min_dl, avgdl) is
  computed at query time, so bounds stay valid when the corpus (and
  avgdl) grows across incremental builds.
- **Resumable waves + lineage** (north_star): shards are processed in
  waves; each wave appends its partitions and then its manifest rows
  (data-before-marker ordering).  ``build_index(resume=True)`` skips
  shards already in the manifest.  The manifest carries per-shard
  counters: docs parsed, docs indexed, postings emitted, bytes compressed
  — the reference has only a tqdm bar (indexer.py:403).
- The table layout (partition column ``shard``, files sorted by term,
  append + marker commits) is exactly an Iceberg partition spec +
  snapshot commit; Iceberg jars aren't in this sandbox so the tables are
  plain partitioned Parquet with the same contract.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.analyze import doc_term_rows
from document_retrieval_system_spark.operators.codec import (
    BLOCK_SIZE,
    delta_encode,
    vb_encode,
)

class ListAccumulatorParam:
    """AccumulatorParam for list-append accumulators (per-partition
    timing records).  Lives in the package (not a tools/ script) so
    executors can unpickle it."""

    def zero(self, v):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


POSTINGS_SCHEMA = (
    "shard int, term string, block_no int, n int, first_doc long, last_doc long, "
    "df_local int, cf_local long, max_tf int, min_dl int, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, pos_bytes binary"
)

DEFAULT_N_SHARDS = 32


def add_doc_identity(pages: DataFrame, n_shards: int) -> DataFrame:
    """doc_id = md5(url) (datasource_manager.py:246-258); shard = hash mod."""
    return pages.withColumn("doc_id", F.md5(F.col("url"))).withColumn(
        "shard", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards)).cast("int")
    )


def assign_local_no(docs: DataFrame) -> DataFrame:
    """Dense per-shard ordinal, assigned in URL sort order.

    URL-ordered docIDs are the classic IR assignment for web corpora:
    pages of one host/topic share vocabulary and sort adjacent, so a
    term's postings concentrate in docID ranges instead of spreading
    i.i.d.  That locality is what block-max metadata exploits — WAND
    pruning on md5-ordered ordinals (r1-r3) was structurally impossible
    because hashing whitens the docID axis (measured decoded_frac ~1.0
    regardless of corpus clustering).  It also tightens delta+varbyte:
    hot hosts yield dense ordinal runs.  One task per shard sorts its
    urls; at larger scale raise n_shards so the sort fits an executor."""
    w = Window.partitionBy("shard").orderBy("url")
    return docs.withColumn("local_no", (F.row_number().over(w) - 1).cast("long"))


def tokenize_docs(docs: DataFrame, analyzer=None) -> DataFrame:
    """Fill text from html (byte-identical extractor) + analyze, in ONE
    fused Arrow UDF stage; drops the raw html column afterwards so no
    downstream shuffle ever moves page bytes."""
    from document_retrieval_system_spark.functions.analyzer import process_text
    from document_retrieval_system_spark.operators.analyze import (
        make_extract_tokenize_udf,
    )

    udf = make_extract_tokenize_udf(analyzer or process_text)
    out = docs.withColumn(
        "_et", udf(F.col("html"), F.col("url"), F.col("text"), F.col("lang"))
    )
    return (
        out.withColumn("title", F.col("_et.title"))
        .withColumn("text", F.col("_et.text"))
        .withColumn("doc_len", F.col("_et.doc_len"))
        .withColumn("terms", F.col("_et.terms"))
        .drop("_et", "html")
    )


_BLOCK_COLS = [
    "shard", "term", "block_no", "n", "first_doc", "last_doc", "df_local",
    "cf_local", "max_tf", "min_dl", "doc_bytes", "tf_bytes", "dl_bytes",
    "pos_bytes",
]


# Split a term's posting run at docID gaps wider than GAP_SPLIT_MIN and
# 16x the run's mean spacing: a block whose [first_doc, last_doc] range
# straddles an empty stretch of the docID axis advertises its (large)
# upper bound over documents it cannot score, which poisons block-max
# pruning exactly where it should win (rare terms clustered by the
# docID locality of URL-sorted web corpora).  Gap-aligned boundaries
# cost a few extra block rows and nothing else — n is stored per block.
GAP_SPLIT_MIN = 4096
GAP_SPLIT_FACTOR = 16


def _gap_splits(docs: np.ndarray) -> list[int]:
    if docs.size < 2:
        return []
    gaps = np.diff(docs.astype(np.int64))
    span = int(docs[-1]) - int(docs[0]) + 1
    thresh = max(GAP_SPLIT_MIN, GAP_SPLIT_FACTOR * span // docs.size)
    return (np.nonzero(gaps > thresh)[0] + 1).tolist()


def _emit_group_blocks(out: dict, shard: int, term: str, docs, tfs, dls, poss):
    df_local = int(docs.size)
    cf_local = int(tfs.sum())
    bounds = [0] + _gap_splits(docs) + [df_local]
    slices = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        for b0 in range(lo, hi, BLOCK_SIZE):
            slices.append(slice(b0, min(b0 + BLOCK_SIZE, hi)))
    for block_no, sl in enumerate(slices):
        d, t, l = docs[sl], tfs[sl], dls[sl]
        out["shard"].append(shard)
        out["term"].append(term)
        out["block_no"].append(block_no)
        out["n"].append(int(d.size))
        out["first_doc"].append(int(d[0]))
        out["last_doc"].append(int(d[-1]))
        out["df_local"].append(df_local)
        out["cf_local"].append(cf_local)
        out["max_tf"].append(int(t.max()))
        out["min_dl"].append(int(l.min()))
        out["doc_bytes"].append(vb_encode(delta_encode(d)))
        out["tf_bytes"].append(vb_encode(t))
        out["dl_bytes"].append(vb_encode(l))
        # per-(doc, term) payloads were varbyte-encoded in the fused map
        # stage; the block payload is their docID-ordered concatenation
        # (byte-identical to encode_positions over the raw lists)
        out["pos_bytes"].append(b"".join(poss[sl]))


def _blocks_from_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    """pdf sorted by (shard, term, local_no): vectorized group detection,
    then per-group numpy slicing — no per-group pandas frames."""
    n = len(pdf)
    shard_arr = pdf["shard"].to_numpy()
    term_arr = pdf["term"].to_numpy(dtype=object)
    docs_all = pdf["local_no"].to_numpy().astype(np.uint64)
    tfs_all = pdf["tf"].to_numpy().astype(np.uint64)
    dls_all = pdf["doc_len"].to_numpy().astype(np.uint64)
    poss_all = pdf["pos_bytes"].to_numpy()
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (term_arr[1:] != term_arr[:-1]) | (shard_arr[1:] != shard_arr[:-1])
    starts = np.nonzero(change)[0]
    ends = np.concatenate([starts[1:], [n]])
    out: dict = {c: [] for c in _BLOCK_COLS}
    for s, e in zip(starts, ends):
        _emit_group_blocks(
            out, int(shard_arr[s]), term_arr[s],
            docs_all[s:e], tfs_all[s:e], dls_all[s:e], poss_all[s:e],
        )
    return pd.DataFrame(out)


def build_postings(term_rows: DataFrame, timing_acc=None) -> DataFrame:
    """Shuffle by (shard, term), sort runs, build blocks batch-at-a-time.

    Group contiguity is guaranteed by hash repartitioning on the full
    group key + sortWithinPartitions; Arrow batches may still split a
    group, so a carry buffer defers the trailing (possibly incomplete)
    group of each batch.  (A groupBy().applyInPandas here costs one
    pandas frame per (shard, term) — ~80k tiny groups on the test corpus
    — and measured ~2.5x slower than this batched form.)

    The (shard, term) key is the term-skew design claim (SURVEY.md §2.7):
    a heavy term's rows hash across every shard, so no reducer ever holds
    more of it than one shard's share.  ``timing_acc`` (a list
    accumulator) records (partition_id, elapsed_sec, rows) per partition
    of this stage so a soak test can assert the straggler bound.
    """
    src = term_rows.repartition("shard", "term").sortWithinPartitions(
        "shard", "term", "local_no"
    )

    def build(batches):
        import time

        from pyspark import TaskContext

        t_start = time.perf_counter()
        n_rows = 0
        carry: pd.DataFrame | None = None
        for pdf in batches:
            n_rows += len(pdf)
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_shard = pdf["shard"].iat[-1]
            last_term = pdf["term"].iat[-1]
            trailing = (
                (pdf["shard"].to_numpy() == last_shard)
                & (pdf["term"].to_numpy(dtype=object) == last_term)
            )
            n_last = int(trailing[::-1].cumprod().sum())
            carry = pdf.iloc[len(pdf) - n_last:].copy()
            body = pdf.iloc[: len(pdf) - n_last]
            if len(body):
                yield _blocks_from_sorted(body)
        if carry is not None and len(carry):
            yield _blocks_from_sorted(carry)
        if timing_acc is not None:
            ctx = TaskContext.get()
            timing_acc.add([(
                ctx.partitionId() if ctx is not None else -1,
                time.perf_counter() - t_start,
                n_rows,
            )])

    return src.mapInPandas(build, POSTINGS_SCHEMA)


DECODED_ROW_SCHEMA = (
    "shard int, local_no long, term string, tf int, pos_bytes binary, doc_len int"
)


def decoded_term_rows(blocks: DataFrame) -> DataFrame:
    """Decode posting blocks back into ``build_postings`` input rows
    (shard, local_no, term, tf, pos_bytes, doc_len).

    Per-(doc, term) position payloads are recovered by SLICING the block
    payload at varbyte boundaries (``split_position_payloads``), never
    decoded+re-encoded — re-blocking is byte-identical.  This is the
    cheap currency for index maintenance: vectorized codec work instead
    of re-running the Python analyzer over stored text (measured ~790
    docs/s/core for the analyzer vs memory-bandwidth for the codec)."""
    from document_retrieval_system_spark.operators.codec import (
        delta_decode,
        split_position_payloads,
        vb_decode,
    )

    src = blocks.select(
        "shard", "term", "n", "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes"
    )

    def decode(batches):
        for pdf in batches:
            shards, terms, locs, tfs_o, poss, dls_o = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                docs = delta_decode(vb_decode(row.doc_bytes)).astype(np.int64)
                tf_arr = vb_decode(row.tf_bytes).astype(np.int32)
                dl_arr = vb_decode(row.dl_bytes).astype(np.int32)
                segs = split_position_payloads(row.pos_bytes, int(row.n))
                shards.append(np.full(docs.size, row.shard, dtype=np.int32))
                terms.extend([row.term] * docs.size)
                locs.append(docs)
                tfs_o.append(tf_arr)
                dls_o.append(dl_arr)
                poss.extend(segs)
            if not terms:
                yield pd.DataFrame(
                    {"shard": pd.Series(dtype="int32"),
                     "local_no": pd.Series(dtype="int64"),
                     "term": pd.Series(dtype="object"),
                     "tf": pd.Series(dtype="int32"),
                     "pos_bytes": pd.Series(dtype="object"),
                     "doc_len": pd.Series(dtype="int32")}
                )
                continue
            yield pd.DataFrame(
                {"shard": np.concatenate(shards),
                 "local_no": np.concatenate(locs),
                 "term": terms,
                 "tf": np.concatenate(tfs_o),
                 "pos_bytes": poss,
                 "doc_len": np.concatenate(dls_o)}
            )

    return src.mapInPandas(decode, DECODED_ROW_SCHEMA)


class IndexPaths:
    def __init__(self, index_dir: str):
        self.root = index_dir
        self.postings = os.path.join(index_dir, "postings")
        self.docs = os.path.join(index_dir, "docs")
        self.term_stats = os.path.join(index_dir, "term_stats")
        self.corpus_stats = os.path.join(index_dir, "corpus_stats")
        self.doc_norms = os.path.join(index_dir, "doc_norms")
        self.manifest = os.path.join(index_dir, "manifest")


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence via the Hadoop FileSystem API — correct for local paths
    AND object stores (s3a://, gs://...), unlike os.path."""
    fs, hpath = _hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def fs_touch(spark: SparkSession, path: str) -> None:
    """Create an (empty) marker directory via the Hadoop FileSystem API."""
    fs, hpath = _hadoop_fs(spark, path)
    fs.mkdirs(hpath)


def fs_delete(spark: SparkSession, path: str) -> None:
    """Recursive delete via the Hadoop FileSystem API.  shutil.rmtree on
    an s3:// URI is a silent no-op — a 'fresh' build would then append
    onto the previous index."""
    fs, hpath = _hadoop_fs(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file via the Hadoop FileSystem API (overwrite)."""
    fs, hpath = _hadoop_fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def fs_read_text(spark: SparkSession, path: str) -> str:
    """Read a small text file via the Hadoop FileSystem API."""
    fs, hpath = _hadoop_fs(spark, path)
    stream = fs.open(hpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _read_postings_or_empty(spark: SparkSession, paths: IndexPaths) -> DataFrame:
    """Postings table, or an empty frame when no blocks exist yet (a wave
    whose documents all tokenize empty writes no posting files).  Only
    the path-missing case maps to 'empty'; real read errors (corruption,
    permissions, transient store failures) propagate instead of being
    silently treated as an empty index."""
    if not fs_exists(spark, paths.postings):
        return spark.createDataFrame([], POSTINGS_SCHEMA)
    return spark.read.parquet(paths.postings)


def _done_shards(spark: SparkSession, paths: IndexPaths) -> set[int]:
    if not fs_exists(spark, paths.manifest):
        return set()
    rows = spark.read.parquet(paths.manifest).select("shard").collect()
    return {r["shard"] for r in rows}


# the manifest is an append-only event log; every writer emits this exact
# column set.  ``kind`` gives rows aggregate semantics: an 'append' row's
# posting counters describe segments ADDED by that event (build waves,
# stream insert batches), a 'snapshot' row's counters describe the FULL
# post-event state of its shard (shard rewrite, compaction) and supersede
# everything earlier — see manifest_stats.
# the docs-table schema, shared by every writer (build, merge) — one
# definition so a new column cannot silently vanish from one path
DOC_TABLE_COLS = [
    "shard", "local_no", "doc_id", "url", "warc_ts", "lang",
    "title", "text", "doc_len",
]

MANIFEST_COLS = [
    "shard", "docs_parsed", "docs_indexed", "postings_emitted", "blocks",
    "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes", "status", "kind",
    "committed_at",
]


def block_counter_agg(blocks: DataFrame) -> DataFrame:
    """Per-shard posting/compression counters over a blocks frame — the
    one definition every manifest writer shares."""
    return blocks.groupBy("shard").agg(
        F.sum("n").alias("postings_emitted"),
        F.count("*").alias("blocks"),
        F.sum(F.length("doc_bytes")).alias("doc_bytes"),
        F.sum(F.length("tf_bytes")).alias("tf_bytes"),
        F.sum(F.length("dl_bytes")).alias("dl_bytes"),
        F.sum(F.length("pos_bytes")).alias("pos_bytes"),
    )


def manifest_stats(manifest: DataFrame) -> dict:
    """Index totals from the manifest event log, honoring row semantics
    (summing the raw rows double-counts):

    - a replayed stream batch re-appends rows for the same (shard,
      batch) — possibly under a DIFFERENT status, because the replay
      routes equal-warc_ts rows through the shard REWRITE path
      ('stream-update-batch-N') where the first attempt appended
      ('stream-batch-N') — so rows dedupe on the batch id embedded in
      the status, latest committed row wins;
    - posting counters of a shard are (its latest 'snapshot' row if any)
      + 'append' rows committed after it; earlier posting history for
      that shard is superseded (the snapshot event rewrote the shard);
    - docs_parsed/docs_indexed are parse-lineage and always sum (over
      the deduped rows)."""
    evt = F.regexp_extract(F.col("status"), r"(batch-\d+)$", 1)
    w = Window.partitionBy("shard", "_evt").orderBy(
        F.col("committed_at").desc(), F.col("kind").desc()
    )
    m1 = (
        manifest.withColumn(
            "_evt", F.when(evt != "", evt).otherwise(F.col("status"))
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_evt")
    )
    ws = Window.partitionBy("shard").orderBy(F.col("committed_at").desc())
    snaps = (
        m1.filter(F.col("kind") == "snapshot")
        .withColumn("_sn", F.row_number().over(ws))
        .filter(F.col("_sn") == 1)
        .select("shard", F.col("committed_at").alias("_snap_ts"))
    )
    live = m1.join(snaps, "shard", "left").filter(
        F.col("_snap_ts").isNull()
        | (F.col("committed_at") > F.col("_snap_ts"))
        | ((F.col("kind") == "snapshot")
           & (F.col("committed_at") == F.col("_snap_ts")))
    )
    row = (
        m1.agg(
            F.sum("docs_parsed").alias("docs_parsed"),
            F.sum("docs_indexed").alias("docs_indexed"),
        )
        .crossJoin(
            live.agg(
                F.sum("postings_emitted").alias("postings"),
                F.sum("blocks").alias("blocks"),
                (F.sum("doc_bytes") + F.sum("tf_bytes") + F.sum("dl_bytes")
                 + F.sum("pos_bytes")).alias("compressed_bytes"),
            )
        )
        .collect()[0]
    )
    return row.asDict()


def index_history(manifest: DataFrame) -> DataFrame:
    """DESCRIBE HISTORY for the index — the Iceberg/Delta snapshot-log
    view of the append-only manifest: one row per committed event in
    commit order, with a dense 1-based version number.  `kind` tells
    whether the event added segments ('append') or superseded a
    shard's history ('snapshot' — compaction, delete-rewrite,
    stream-update)."""
    w = Window.orderBy("committed_at", "shard", "status")
    return (
        manifest.select("committed_at", "kind", "status", "shard",
                        "docs_indexed", "postings_emitted", "blocks")
        .withColumn("version", F.row_number().over(w))
        .select("version", "committed_at", "kind", "status", "shard",
                "docs_indexed", "postings_emitted", "blocks")
        .orderBy("version")
    )


def manifest_stats_asof(manifest: DataFrame, as_of) -> dict:
    """Index totals AS OF a past commit time — time travel over the
    lineage log: replaying only events with committed_at <= as_of
    through the same snapshot-supersedes-appends reduction yields
    exactly the totals `manifest_stats` reported when `as_of` was
    now.  (Data files are rewritten in place by maintenance, so the
    *rows* of old versions are not retrievable — this is stats/lineage
    time travel, the audit question "what did the index hold before
    yesterday's compaction", not a full Iceberg snapshot store.)

    `as_of` is anything Spark can compare to a timestamp column —
    a datetime, or an ISO string (cast below pins string inputs)."""
    bound = F.lit(as_of).cast("timestamp")
    return manifest_stats(manifest.filter(F.col("committed_at") <= bound))


TARGET_DOCS_PER_SHARD = 250_000


def auto_n_shards(n_docs: int) -> int:
    """Shard count sized so each shard's docID-ordinal sort and WAND
    kernel stay executor-local and bounded (~250k docs/shard):

      corpus        shards   docs/shard
      240 (tests)   8        30
      10^6          8        125k
      10^9          4096     ~244k
      10^12         2^22     ~238k

    Power of two so incremental growth re-shards predictably; floor of 8
    keeps small builds parallel."""
    import math

    n = max(1, int(math.ceil(n_docs / TARGET_DOCS_PER_SHARD)))
    return max(8, 1 << (n - 1).bit_length())


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    n_shards: int | None = DEFAULT_N_SHARDS,
    wave_size: int | None = None,
    resume: bool = False,
    finalize: bool = True,
    analyzer=None,
) -> IndexPaths:
    """Build (or resume) the sharded compressed index under ``index_dir``.

    ``n_shards=None``: derived from the input size via ``auto_n_shards``
    (one counting pass over the source).

    ``wave_size``: shards per commit wave (None = all pending in one
    wave).  Each wave appends docs+postings partitions for its shards,
    then appends manifest rows — the manifest row IS the per-partition
    checkpoint; on resume, shards present in the manifest are skipped
    without recomputation.  Data partitions for shards NOT in the
    manifest are deleted before reprocessing: a crash between the docs
    append and the manifest commit leaves orphaned partitions that a
    naive re-append would duplicate.
    """
    paths = IndexPaths(index_dir)
    if n_shards is None:
        n_shards = auto_n_shards(pages.count())
    done = _done_shards(spark, paths) if resume else set()
    pending = [s for s in range(n_shards) if s not in done]
    if not resume:
        # fresh build: clear any previous index (overwrite semantics);
        # Hadoop FS delete so object-store paths clear too
        fs_delete(spark, index_dir)
    else:
        # crash-window repair: drop partial partitions of unfinished
        # shards (data-before-marker means no manifest row => the
        # partition contents are not trustworthy)
        for s in pending:
            fs_delete(spark, os.path.join(paths.docs, f"shard={s}"))
            fs_delete(spark, os.path.join(paths.postings, f"shard={s}"))

    waves = (
        [pending]
        if wave_size is None
        else [pending[i : i + wave_size] for i in range(0, len(pending), wave_size)]
    )

    base = add_doc_identity(pages, n_shards)
    for wave in waves:
        if not wave:
            continue
        docs = base.filter(F.col("shard").isin([int(s) for s in wave]))
        # tokenize BEFORE the ordinal shuffle: the window then moves
        # text+tokens, never raw html bytes.  The explicit shard
        # repartition comes BEFORE the ordinal window (r6): the window
        # requires hash-by-shard distribution, so placing the write's
        # repartition first lets the window reuse that one exchange —
        # previously the wide tokenized rows crossed two exchanges per
        # wave (window's own + the write's).
        tok = assign_local_no(
            tokenize_docs(docs, analyzer=analyzer)
            .repartition(max(len(wave), 1), "shard")
        ).persist()
        try:
            doc_cols = tok.select(*DOC_TABLE_COLS)
            (
                doc_cols.sortWithinPartitions("local_no")
                .write.partitionBy("shard")
                .mode("append")
                .parquet(paths.docs)
            )
            blocks = build_postings(doc_term_rows(tok))
            # one task (and so ~one file) per shard: compressed block rows
            # are small, and the term-sorted layout gives row-group
            # min/max pruning for term-IN filters at query time.
            (
                blocks.repartition(len(wave), "shard")
                .sortWithinPartitions("term", "block_no")
                .write.partitionBy("shard")
                .mode("append")
                .parquet(paths.postings)
            )
            # lineage counters per shard — committed AFTER the data it
            # describes, so a manifest row implies complete partitions.
            docs_agg = tok.groupBy("shard").agg(
                F.count("*").alias("docs_parsed"),
                F.sum(F.when(F.col("doc_len") > 0, 1).otherwise(0)).alias("docs_indexed"),
            )
            blk = _read_postings_or_empty(spark, paths).filter(
                F.col("shard").isin([int(s) for s in wave])
            )
            blk_agg = block_counter_agg(blk)
            manifest = (
                docs_agg.join(blk_agg, "shard", "left")
                .withColumn("status", F.lit("done"))
                .withColumn("kind", F.lit("append"))
                .withColumn("committed_at", F.current_timestamp())
                .select(*MANIFEST_COLS)
            )
            manifest.coalesce(1).write.mode("append").parquet(paths.manifest)
        finally:
            tok.unpersist()

    if finalize:
        finalize_index(spark, paths)
    return paths


def finalize_index(spark: SparkSession, paths: IndexPaths) -> None:
    """Global-stat passes that depend on the FULL corpus (rerun after any
    incremental wave, mirroring the reference's compute_doc_weights after
    every build, indexer.py:423)."""
    docs = spark.read.parquet(paths.docs)
    blocks = _read_postings_or_empty(spark, paths)

    # corpus stats (I4): only docs with tokens count (indexer.py:53-54,86-90)
    corpus = docs.filter(F.col("doc_len") > 0).agg(
        F.count("*").alias("total_docs"),
        F.avg("doc_len").alias("avg_doc_length"),
        F.sum("doc_len").alias("total_tokens"),
    )
    corpus.coalesce(1).write.mode("overwrite").parquet(paths.corpus_stats)

    # term stats (I3): global df/cf from per-shard partial aggregates —
    # the two-stage "salted" aggregation: big groupBy was (shard, term),
    # this second stage reduces tiny per-shard rows.
    term_stats = (
        blocks.filter(F.col("block_no") == 0)
        .groupBy("term")
        .agg(
            F.sum("df_local").alias("df"),
            F.sum("cf_local").alias("cf"),
        )
    )
    term_stats.write.mode("overwrite").parquet(paths.term_stats)

    # TF-IDF doc norms (I7): ||(tf * ln(N/df))_t||_2 per doc, computed by
    # decoding the index (term-major) and re-grouping by doc — replaces
    # the reference's O(V x D) loop (indexer.py:254-271).
    from document_retrieval_system_spark.operators.search import flat_postings

    n_docs = corpus.collect()[0]["total_docs"]
    ts = spark.read.parquet(paths.term_stats)
    # join df at BLOCK granularity (one row per term-block, ~100x fewer
    # rows than postings), then decode with idf attached — the per-doc
    # groupBy is the only posting-cardinality shuffle in this pass
    blocks_with_df = blocks.select(
        "shard", "term", "n", "doc_bytes", "tf_bytes", "dl_bytes"
    ).join(ts.select("term", "df"), "term")
    flat = flat_postings(blocks_with_df, with_positions=False, extra_cols=["df"])
    weighted = flat.withColumn(
        "w", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    norms = (
        weighted.groupBy("shard", "local_no")
        .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("tfidf_veclen"))
    )
    norms.write.mode("overwrite").parquet(paths.doc_norms)


# ---------------------------------------------------------------------------
# Maintenance rewrites (delete / compaction) + crash-replay repair
# ---------------------------------------------------------------------------

# test fault injection: called between the postings overwrite and the
# manifest snapshot append of a maintenance rewrite (the crash window a
# surviving intent marker repairs)
_AFTER_POSTINGS_REWRITE_HOOK = None

_MAINT_INTENT_FILE = "maintenance_intent.json"


def maintenance_intent_path(paths: IndexPaths) -> str:
    return os.path.join(paths.root, _MAINT_INTENT_FILE)


def write_maintenance_intent(spark: SparkSession, paths: IndexPaths,
                             op: str, shards: list[int]) -> None:
    import json

    fs_write_text(
        spark, maintenance_intent_path(paths),
        json.dumps({"op": op, "shards": [int(s) for s in shards]}),
    )


def rebuild_shard_postings(spark: SparkSession, paths: IndexPaths,
                           shards: list[int], status: str) -> None:
    """Rebuild the posting partitions of ``shards`` from (decoded current
    postings ∩ current docs), dynamic-overwrite them, and append snapshot
    manifest rows.  Pure codec work — position payloads byte-sliced, the
    analyzer never runs.

    This one primitive backs three operations:
    - **delete** (docs rows already dropped): the docs join filters the
      deleted docs' orphaned posting rows out;
    - **compaction**: N delta segments per (shard, term) re-block into
      one gap-aligned run (a no-orphan rebuild);
    - **crash repair**: a maintenance op that died between its two
      overwrites left postings referencing docs that no longer exist (or
      a missing manifest snapshot); re-running the rebuild from current
      state is idempotent and converges to the op's intended outcome.
    """
    shard_filter = F.col("shard").isin([int(s) for s in shards])
    doc_map = (
        spark.read.parquet(paths.docs).filter(shard_filter)
        .select("shard", "local_no")
    )
    old_blocks = _read_postings_or_empty(spark, paths).filter(shard_filter)
    rows = (
        decoded_term_rows(old_blocks)
        .join(doc_map, ["shard", "local_no"])  # inner join drops orphans
        .select("shard", "local_no", "term", "tf", "pos_bytes", "doc_len")
    )
    # lineage reads paths.postings, which is overwritten below — freeze
    blocks = build_postings(rows).localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            blocks.repartition(max(len(shards), 1), "shard")
            .sortWithinPartitions("term", "block_no")
            .write.partitionBy("shard").mode("overwrite").parquet(paths.postings)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite only replaces partitions PRESENT in the written
    # frame: a shard left with no postings must have its stale partition
    # deleted explicitly or its old blocks silently survive
    blk_shards = {r["shard"] for r in blocks.select("shard").distinct().collect()}
    for s in {int(x) for x in shards} - blk_shards:
        fs_delete(spark, os.path.join(paths.postings, f"shard={s}"))
    if _AFTER_POSTINGS_REWRITE_HOOK is not None:
        _AFTER_POSTINGS_REWRITE_HOOK()
    # snapshot rows for EVERY target shard (zero counters where emptied —
    # without them manifest_stats would keep the pre-rewrite counts)
    aff_df = spark.createDataFrame([(int(s),) for s in shards], "shard int")
    (
        aff_df.join(block_counter_agg(blocks), "shard", "left")
        .na.fill(0, ["postings_emitted", "blocks", "doc_bytes", "tf_bytes",
                     "dl_bytes", "pos_bytes"])
        .withColumn("docs_parsed", F.lit(None).cast("long"))
        .withColumn("docs_indexed", F.lit(None).cast("long"))
        .withColumn("status", F.lit(status))
        .withColumn("kind", F.lit("snapshot"))
        .withColumn("committed_at", F.current_timestamp())
        .select(*MANIFEST_COLS)
        .coalesce(1).write.mode("append").parquet(paths.manifest)
    )


def repair_maintenance(spark: SparkSession, paths: IndexPaths) -> dict | None:
    """Repair after a maintenance op (delete / compaction) crashed
    mid-rewrite: a surviving intent marker names the shards whose docs
    and postings may be out of step (docs overwritten, postings not, or
    the manifest snapshot missing).  The repair re-runs the shard rebuild
    from CURRENT state — restoring per-shard consistency, not the crashed
    op's intent: a delete that died before its docs overwrite simply did
    not happen, and the caller retries it.  Returns the repaired intent,
    or None if the index is clean.  Runs automatically at the start of
    delete_documents / compact_shards / run_incremental."""
    import json

    p = maintenance_intent_path(paths)
    if not fs_exists(spark, p):
        return None
    intent = json.loads(fs_read_text(spark, p))
    rebuild_shard_postings(
        spark, paths, intent["shards"], status=f"repair-{intent['op']}"
    )
    finalize_index(spark, paths)
    fs_delete(spark, p)
    return intent


class IndexReader:
    """Lazy handles on the index tables + broadcast-able corpus scalars."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.paths = IndexPaths(index_dir)

    def docs(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.docs)

    def postings(self) -> DataFrame:
        return _read_postings_or_empty(self.spark, self.paths)

    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.term_stats)

    def doc_norms(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.doc_norms)

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.manifest)

    def corpus(self) -> dict:
        row = self.spark.read.parquet(self.paths.corpus_stats).collect()[0]
        return {
            "total_docs": row["total_docs"],
            "avg_doc_length": float(row["avg_doc_length"] or 0.0),
            "total_tokens": row["total_tokens"],
        }
