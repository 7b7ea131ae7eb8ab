"""Structured-Streaming incremental index maintenance: new page batches
appended as delta segments must be query-visible and upsert-guarded."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators.index_build import (
    IndexReader,
    build_index,
)
from document_retrieval_system_spark.operators.search import bm25_search
from document_retrieval_system_spark.sources.corpus import PAGES_DDL, gen_pages_pandas
from document_retrieval_system_spark.streaming.incremental import run_incremental

SHARDS = 4


@pytest.fixture(scope="module")
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"drs_stream_{k}_") for k in
         ("index", "incoming", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def test_incremental_update_replaces_old_version(spark):
    """A url re-sent with NEWER warc_ts must supersede the old version
    everywhere: one doc row, no stale postings, stats not double-counted
    (reference remove_document-then-add, indexer.py:405-411)."""
    import datetime

    d = {k: tempfile.mkdtemp(prefix=f"drs_upd_{k}_") for k in
         ("index", "incoming", "ckpt")}
    try:
        base_pd = gen_pages_pandas(30)
        build_index(spark, spark.createDataFrame(base_pd, PAGES_DDL),
                    d["index"], n_shards=SHARDS)
        r = IndexReader(spark, d["index"])
        targets = r.docs().select("url", "warc_ts").orderBy("url").limit(5).collect()
        t_urls = {t["url"] for t in targets}
        upd = [
            (t["url"], t["warc_ts"] + datetime.timedelta(days=1), None,
             "updated streaming content markertermxyz", "en")
            for t in targets
        ]
        new = gen_pages_pandas(3, start=30)
        spark.createDataFrame(upd, PAGES_DDL).write.mode("overwrite").parquet(
            d["incoming"] + "/b1"
        )
        spark.createDataFrame(new, PAGES_DDL).write.mode("append").parquet(
            d["incoming"] + "/b1"
        )
        run_incremental(spark, d["incoming"] + "/b1", d["index"], d["ckpt"],
                        n_shards=SHARDS)

        r2 = IndexReader(spark, d["index"])
        # exactly one version per url; no double-counted stats
        assert r2.docs().count() == 33
        assert r2.docs().groupBy("doc_id").count().filter("count > 1").count() == 0
        assert (
            r2.docs().groupBy("shard", "local_no").count()
            .filter("count > 1").count() == 0
        )
        assert r2.corpus()["total_docs"] == 33
        # new content searchable, attributed to exactly the updated urls
        hits = bm25_search(r2, "markertermxyz", "en", 100, 0.0).collect()
        assert {h["url"] for h in hits} == t_urls
        # old version really gone: updated docs carry only the new text
        for row in r2.docs().filter(F.col("url").isin(list(t_urls))).collect():
            assert row["text"].startswith("updated streaming"), row["url"]

        # stale postings gone: streamed-updated index == batch rebuild of
        # the equivalent corpus, score-identical
        oneshot = tempfile.mkdtemp(prefix="drs_upd_oneshot_")
        try:
            kept = base_pd[~base_pd["url"].isin(t_urls)]
            allpages = spark.createDataFrame(kept, PAGES_DDL).unionByName(
                spark.createDataFrame(upd, PAGES_DDL)
            ).unionByName(spark.createDataFrame(new, PAGES_DDL))
            build_index(spark, allpages, oneshot, n_shards=SHARDS)
            for q, lang in (("数据 算法", "zh"), ("markertermxyz content", "en")):
                a = {(row["doc_id"], round(row["score"], 9))
                     for row in bm25_search(r2, q, lang, 200, 0.0).collect()}
                b = {(row["doc_id"], round(row["score"], 9))
                     for row in bm25_search(IndexReader(spark, oneshot),
                                            q, lang, 200, 0.0).collect()}
                assert a == b, q
        finally:
            shutil.rmtree(oneshot, ignore_errors=True)
    finally:
        for p in d.values():
            shutil.rmtree(p, ignore_errors=True)


def test_incremental_append_and_upsert_guard(spark, dirs):
    # base index: pages 0..79
    base = spark.createDataFrame(gen_pages_pandas(80), PAGES_DDL)
    build_index(spark, base, dirs["index"], n_shards=SHARDS)
    r = IndexReader(spark, dirs["index"])
    n_base = r.docs().count()
    assert n_base == 80

    # stream in: 40 new pages + 10 re-sent old pages (same warc_ts ->
    # must be skipped by the I6 upsert guard)
    new = gen_pages_pandas(40, start=80)
    resent = gen_pages_pandas(10, start=0)
    spark.createDataFrame(new, PAGES_DDL).write.mode("overwrite").parquet(
        dirs["incoming"] + "/b1"
    )
    spark.createDataFrame(resent, PAGES_DDL).write.mode("append").parquet(
        dirs["incoming"] + "/b1"
    )
    run_incremental(spark, dirs["incoming"] + "/b1", dirs["index"],
                    dirs["ckpt"], n_shards=SHARDS)

    r2 = IndexReader(spark, dirs["index"])
    assert r2.docs().count() == 120  # 80 base + 40 new, 10 resends skipped
    # no duplicate doc_ids
    assert r2.docs().groupBy("doc_id").count().filter("count > 1").count() == 0
    # local_no stays unique per shard (delta segment numbering continues)
    assert (
        r2.docs().groupBy("shard", "local_no").count().filter("count > 1").count() == 0
    )

    # streamed docs are searchable with correct global stats
    oneshot_dir = tempfile.mkdtemp(prefix="drs_stream_oneshot_")
    try:
        allpages = spark.createDataFrame(gen_pages_pandas(120), PAGES_DDL)
        build_index(spark, allpages, oneshot_dir, n_shards=SHARDS)
        a = {(row["doc_id"], round(row["score"], 9))
             for row in bm25_search(r2, "数据 算法", "zh", 200, 0.0).collect()}
        b = {(row["doc_id"], round(row["score"], 9))
             for row in bm25_search(IndexReader(spark, oneshot_dir),
                                    "数据 算法", "zh", 200, 0.0).collect()}
        assert {d for d, _ in a} == {d for d, _ in b}
        assert a == b  # identical scores: streaming append == batch rebuild
    finally:
        shutil.rmtree(oneshot_dir, ignore_errors=True)


def _score_set(reader, q, lang="zh"):
    return {(row["doc_id"], round(row["score"], 9))
            for row in bm25_search(reader, q, lang, 200, 0.0).collect()}


def test_update_rewrite_analyzer_bounded_by_batch(spark, monkeypatch):
    """r3 contract: a shard rewrite re-tokenizes ONLY the batch's rows —
    survivor postings come from the codec, never the analyzer (r2 re-ran
    the full analyzer over every surviving doc of an updated shard)."""
    import datetime

    from document_retrieval_system_spark.streaming import incremental as inc

    d = {k: tempfile.mkdtemp(prefix=f"drs_cnt_{k}_") for k in
         ("index", "incoming", "ckpt")}
    try:
        base = gen_pages_pandas(60)
        build_index(spark, spark.createDataFrame(base, PAGES_DDL),
                    d["index"], n_shards=2)  # 2 shards -> ~30 docs/shard
        r = IndexReader(spark, d["index"])
        targets = r.docs().select("url", "warc_ts").orderBy("url").limit(3).collect()
        upd = [
            (t["url"], t["warc_ts"] + datetime.timedelta(days=1), None,
             "rewritten doc countertermabc", "en")
            for t in targets
        ]

        tokenized_rows = []
        real = inc.tokenize_docs

        def counting_tokenize(docs, analyzer=None):
            tokenized_rows.append(docs.count())
            return real(docs, analyzer=analyzer)

        monkeypatch.setattr(inc, "tokenize_docs", counting_tokenize)
        spark.createDataFrame(upd, PAGES_DDL).write.mode("overwrite").parquet(
            d["incoming"] + "/b1"
        )
        run_incremental(spark, d["incoming"] + "/b1", d["index"], d["ckpt"],
                        n_shards=2)
        # analyzer input == batch size (3), NOT the ~30-60 shard survivors
        assert sum(tokenized_rows) == 3, tokenized_rows

        r2 = IndexReader(spark, d["index"])
        assert r2.docs().count() == 60
        hits = bm25_search(r2, "countertermabc", "en", 100, 0.0).collect()
        assert {h["url"] for h in hits} == {t["url"] for t in targets}
        # survivor postings byte-round-tripped: streamed == batch rebuild
        oneshot = tempfile.mkdtemp(prefix="drs_cnt_oneshot_")
        try:
            t_urls = {t["url"] for t in targets}
            kept = base[~base["url"].isin(t_urls)]
            allpages = spark.createDataFrame(kept, PAGES_DDL).unionByName(
                spark.createDataFrame(upd, PAGES_DDL))
            build_index(spark, allpages, oneshot, n_shards=2)
            ro = IndexReader(spark, oneshot)
            for q, lang in (("数据 算法", "zh"), ("countertermabc doc", "en")):
                assert _score_set(r2, q, lang) == _score_set(ro, q, lang), q
        finally:
            shutil.rmtree(oneshot, ignore_errors=True)
    finally:
        for p in d.values():
            shutil.rmtree(p, ignore_errors=True)


def test_crash_replay_between_docs_and_postings_is_idempotent(spark, monkeypatch):
    """The replay crash window (ADVICE r2): docs partitions overwritten,
    crash before the postings overwrite, Structured Streaming re-runs the
    SAME batch whose warc_ts now EQUALS the stored ones.  The intent
    marker + widened (>=) guard must re-run the full shard rewrite; the
    strict guard alone would skip the rows and leave postings pointing at
    the pre-rewrite numbering forever."""
    import datetime

    from document_retrieval_system_spark.operators.index_build import IndexPaths
    from document_retrieval_system_spark.streaming import incremental as inc

    d = {"index": tempfile.mkdtemp(prefix="drs_crash_index_")}
    oneshot = tempfile.mkdtemp(prefix="drs_crash_oneshot_")
    try:
        base = gen_pages_pandas(40)
        build_index(spark, spark.createDataFrame(base, PAGES_DDL),
                    d["index"], n_shards=2)
        r = IndexReader(spark, d["index"])
        targets = r.docs().select("url", "warc_ts").orderBy("url").limit(4).collect()
        upd = [
            (t["url"], t["warc_ts"] + datetime.timedelta(days=1), None,
             "crashy update replaytermqq", "en")
            for t in targets
        ]
        batch = spark.createDataFrame(upd, PAGES_DDL)
        paths = IndexPaths(d["index"])

        def boom():
            raise RuntimeError("injected crash between docs and postings")

        monkeypatch.setattr(inc, "_AFTER_DOCS_WRITE_HOOK", boom)
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="injected crash"):
            inc._append_batch(spark, batch, 7, paths, 2)
        # crash state: new docs written, postings stale, marker present
        from document_retrieval_system_spark.operators.index_build import fs_exists
        assert fs_exists(spark, inc._intent_marker(paths, 7))

        monkeypatch.setattr(inc, "_AFTER_DOCS_WRITE_HOOK", None)
        inc._append_batch(spark, batch, 7, paths, 2)  # foreachBatch replay
        assert not fs_exists(spark, inc._intent_marker(paths, 7))
        from document_retrieval_system_spark.operators.index_build import (
            finalize_index,
        )
        finalize_index(spark, paths)

        r2 = IndexReader(spark, d["index"])
        assert r2.docs().count() == 40
        assert (r2.docs().groupBy("shard", "local_no").count()
                .filter("count > 1").count() == 0)
        t_urls = {t["url"] for t in targets}
        hits = bm25_search(r2, "replaytermqq", "en", 100, 0.0).collect()
        assert {h["url"] for h in hits} == t_urls
        # full equivalence with a batch rebuild (docs/postings numbering
        # coherent — the silent-corruption mode this guards against)
        kept = base[~base["url"].isin(t_urls)]
        allpages = spark.createDataFrame(kept, PAGES_DDL).unionByName(
            spark.createDataFrame(upd, PAGES_DDL))
        build_index(spark, allpages, oneshot, n_shards=2)
        ro = IndexReader(spark, oneshot)
        for q, lang in (("数据 算法", "zh"), ("replaytermqq update", "en")):
            assert _score_set(r2, q, lang) == _score_set(ro, q, lang), q
    finally:
        shutil.rmtree(d["index"], ignore_errors=True)
        shutil.rmtree(oneshot, ignore_errors=True)


def test_compaction_merges_delta_segments(spark):
    """After N append batches, compaction must collapse per-batch posting
    segments: identical query results, strictly fewer block rows, and a
    manifest row recording the compaction wave."""
    from document_retrieval_system_spark.operators.index_build import IndexPaths
    from document_retrieval_system_spark.streaming.incremental import (
        compact_shards,
    )

    d = {k: tempfile.mkdtemp(prefix=f"drs_cpt_{k}_") for k in
         ("index", "incoming", "ckpt")}
    try:
        build_index(spark, spark.createDataFrame(gen_pages_pandas(30), PAGES_DDL),
                    d["index"], n_shards=2)
        # three delta batches of inserts -> up to 4 segments per term
        for i in range(3):
            pages = gen_pages_pandas(10, start=30 + 10 * i)
            spark.createDataFrame(pages, PAGES_DDL).write.mode(
                "overwrite").parquet(d["incoming"] + f"/b{i}")
            run_incremental(spark, d["incoming"] + f"/b{i}", d["index"],
                            d["ckpt"] + f"/c{i}", n_shards=2)
        r = IndexReader(spark, d["index"])
        pre_blocks = r.postings().count()
        pre = {q: _score_set(r, q) for q in ("数据 算法", "系统 人工智能")}
        # multi-segment state must actually exist pre-compaction
        assert (r.postings().groupBy("shard", "term", "block_no").count()
                .filter("count > 1").count() > 0)

        paths = IndexPaths(d["index"])
        compact_shards(spark, paths)

        r2 = IndexReader(spark, d["index"])
        post_blocks = r2.postings().count()
        assert post_blocks < pre_blocks, (pre_blocks, post_blocks)
        # one segment per (shard, term): block_no unique again
        assert (r2.postings().groupBy("shard", "term", "block_no").count()
                .filter("count > 1").count() == 0)
        for q, want in pre.items():
            assert _score_set(r2, q) == want, q
        manifest = r2.manifest()
        assert manifest.filter("status = 'compaction'").count() > 0
    finally:
        for p in d.values():
            shutil.rmtree(p, ignore_errors=True)
