"""The north rule's packaging claim, actually exercised: build
dist/drs_spark.zip and run a real ``spark-submit --py-files`` job from a
directory where the repo package is NOT importable — the zip must carry
everything (analyzer dictionaries and stopword lists are embedded .py,
so a source zip is self-contained)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import tempfile
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
from document_retrieval_system_spark.operators.index_build import (
    IndexReader,
    build_index,
)
from document_retrieval_system_spark.operators.search import bm25_search
from document_retrieval_system_spark.sources.corpus import PAGES_DDL, gen_pages_pandas

idx = tempfile.mkdtemp(prefix="drs_submit_idx_")
build_index(spark, spark.createDataFrame(gen_pages_pandas(30), PAGES_DDL),
            idx, n_shards=2)
hits = bm25_search(IndexReader(spark, idx), "数据 算法", "zh", 5, 0.0).collect()
assert hits and all(h["score"] > 0 for h in hits)
print("SUBMIT_OK", len(hits))
"""


def test_spark_submit_pyfiles(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py")],
        check=True, cwd=REPO,
    )
    zip_path = os.path.join(REPO, "dist", "drs_spark.zip")
    submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    job = tmp_path / "job.py"
    job.write_text(JOB, encoding="utf-8")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    res = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=2",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, str(job)],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600,
        env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SUBMIT_OK" in res.stdout, (res.stdout[-1000:], res.stderr[-2000:])
