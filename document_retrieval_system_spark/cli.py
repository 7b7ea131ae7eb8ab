"""spark-submit entry point (north_star packaging contract).

Package the engine and run on a cluster:

    python tools/make_pyfiles_zip.py          # -> dist/drs_spark.zip
    spark-submit --py-files dist/drs_spark.zip \\
        document_retrieval_system_spark/cli.py build \\
        --pages s3://bucket/pages/ --index s3://bucket/index/ --shards 4096

Subcommands mirror the reference CLI (main.py --rebuild-index / --query):

    build   — build or resume the sharded compressed index
    query   — BM25 (WAND) / tfidf / boolean top-k against an index
    stream  — incremental append from a directory of new page batches
    merge   — merge segment indexes into one (newest wins on doc_id)
    fsck    — audit index integrity (exit 1 on violations)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# allow `python document_retrieval_system_spark/cli.py` without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="drs-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build or resume the index")
    b.add_argument("--pages", help="parquet dir of pages")
    b.add_argument("--files", help="directory of raw .html/.htm/.txt/.pdf/"
                                   ".docx/.xlsx files to ingest (S1-S7)")
    b.add_argument("--warc", help="directory of .warc[.gz]/.wet[.gz] web "
                                  "archives to ingest (one archive per task)")
    b.add_argument("--index", required=True, help="index output dir")
    b.add_argument("--shards", default="32",
                   help="shard count, or 'auto' to size from the corpus "
                        "(~250k docs/shard, power of two)")
    b.add_argument("--wave-size", type=int, default=None)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--synthetic", type=int, default=None,
                   help="generate N synthetic pages instead of reading --pages")

    q = sub.add_parser("query", help="run a query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--algorithm", default="bm25",
                   choices=["bm25", "bm25_exhaustive", "tfidf", "boolean"])
    q.add_argument("--lang", default="zh")
    q.add_argument("--max-results", type=int, default=20)  # app_config.yaml:33
    q.add_argument("--min-score", type=float, default=0.3)  # app_config.yaml:34
    q.add_argument("--highlight", action="store_true")

    s = sub.add_parser("stream", help="incremental append from new pages")
    s.add_argument("--incoming", required=True)
    s.add_argument("--index", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--shards", type=int, default=32)

    m = sub.add_parser("merge", help="merge segment indexes into one")
    m.add_argument("--src", required=True, action="append",
                   help="source index dir (repeat; oldest first — later "
                        "segments supersede on doc_id)")
    m.add_argument("--out", required=True, help="merged index output dir "
                                                "(must be a fresh path)")
    m.add_argument("--shards", default="auto",
                   help="merged shard count, or 'auto'")

    f = sub.add_parser("fsck", help="audit index integrity")
    f.add_argument("--index", required=True)

    h = sub.add_parser("history",
                       help="lineage log (DESCRIBE HISTORY); optional "
                            "totals as of a commit time")
    h.add_argument("--index", required=True)
    h.add_argument("--asof", default=None,
                   help="ISO timestamp: also print index totals as of "
                        "this commit time")

    args = ap.parse_args(argv)

    from document_retrieval_system_spark.session import get_spark

    spark = get_spark("drs-cli")
    try:
        if args.cmd == "build":
            from document_retrieval_system_spark.operators.index_build import (
                IndexReader,
                build_index,
            )

            if args.synthetic:
                from document_retrieval_system_spark.sources.corpus import pages_df

                pages = pages_df(spark, args.synthetic)
            elif args.files:
                from document_retrieval_system_spark.sources.tables import (
                    read_pages_from_files,
                )

                pages = read_pages_from_files(spark, args.files)
            elif args.warc:
                from document_retrieval_system_spark.sources.warc import (
                    warc_pages_df,
                )

                pages = warc_pages_df(spark, args.warc)
            elif args.pages:
                pages = spark.read.parquet(args.pages)
            else:
                ap.error("build requires one of --pages, --files, "
                         "--warc, --synthetic")
            n_shards = None if str(args.shards) == "auto" else int(args.shards)
            build_index(spark, pages, args.index, n_shards=n_shards,
                        wave_size=args.wave_size, resume=args.resume)
            reader = IndexReader(spark, args.index)
            print(json.dumps({"corpus": reader.corpus()}))
            reader.manifest().orderBy("shard").show(100, truncate=False)
        elif args.cmd == "query":
            from document_retrieval_system_spark.operators.index_build import IndexReader
            from document_retrieval_system_spark.operators.search import (
                bm25_search,
                boolean_search,
                tfidf_search,
            )
            from document_retrieval_system_spark.operators.wand import bm25_wand_search

            reader = IndexReader(spark, args.index)
            fn = {
                "bm25": bm25_wand_search,
                "bm25_exhaustive": bm25_search,
                "tfidf": tfidf_search,
                "boolean": boolean_search,
            }[args.algorithm]
            res = fn(reader, args.query, args.lang, args.max_results, args.min_score)
            if args.highlight:
                from document_retrieval_system_spark.operators.highlight import (
                    with_highlights,
                )

                docs = reader.docs().select("shard", "local_no", "text")
                res = (
                    with_highlights(
                        res.join(docs, ["shard", "local_no"]), args.query, args.lang
                    )
                    .drop("text")
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                )
            for row in res.collect():
                print(json.dumps(row.asDict(), ensure_ascii=False, default=str))
        elif args.cmd == "stream":
            from document_retrieval_system_spark.streaming.incremental import (
                run_incremental,
            )

            run_incremental(spark, args.incoming, args.index, args.checkpoint,
                            n_shards=args.shards)
        elif args.cmd == "merge":
            from document_retrieval_system_spark.operators.index_build import (
                IndexReader,
            )
            from document_retrieval_system_spark.operators.merge import (
                merge_indexes,
            )

            n_shards = None if str(args.shards) == "auto" else int(args.shards)
            merge_indexes(spark, args.src, args.out, n_shards=n_shards)
            print(json.dumps({"merged": args.out,
                              "corpus": IndexReader(spark, args.out).corpus()}))
        elif args.cmd == "fsck":
            from document_retrieval_system_spark.operators.fsck import (
                fsck_index,
            )

            v = fsck_index(spark, args.index)
            rows = v.collect()
            for row in rows:
                print(json.dumps(row.asDict(), ensure_ascii=False))
            print(json.dumps({"index": args.index,
                              "violations": len(rows),
                              "clean": not rows}))
            return 0 if not rows else 1
        elif args.cmd == "history":
            from document_retrieval_system_spark.operators.index_build import (
                IndexReader,
                index_history,
                manifest_stats_asof,
            )

            reader = IndexReader(spark, args.index)
            index_history(reader.manifest()).show(1000, truncate=False)
            if args.asof:
                print(json.dumps(
                    {"asof": args.asof,
                     **manifest_stats_asof(reader.manifest(), args.asof)},
                    default=str))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
