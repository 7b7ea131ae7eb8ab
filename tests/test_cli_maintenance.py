"""CLI maintenance subcommands (merge / fsck) exercised through a real
``python cli.py`` process: build two segments, merge them, audit clean;
fsck exits non-zero once the index is corrupted."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "document_retrieval_system_spark", "cli.py")


def _run(*args):
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    return subprocess.run(
        [sys.executable, CLI, *args],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env,
    )


def test_cli_merge_then_fsck(tmp_path):
    seg0, seg1 = str(tmp_path / "seg0"), str(tmp_path / "seg1")
    merged = str(tmp_path / "merged")
    for d, n in [(seg0, "20"), (seg1, "25")]:
        res = _run("build", "--synthetic", n, "--index", d, "--shards", "2")
        assert res.returncode == 0, res.stderr[-3000:]

    res = _run("merge", "--src", seg0, "--src", seg1,
               "--out", merged, "--shards", "3")
    assert res.returncode == 0, res.stderr[-3000:]
    info = json.loads(
        [line for line in res.stdout.splitlines() if line.startswith("{")][-1]
    )
    assert info["merged"] == merged
    # the two synthetic corpora overlap on urls (same generator ids
    # 0..19), so the merged corpus is the UNION (<= 25 docs, not 45 —
    # proves the doc_id supersede ran)
    assert 20 <= info["corpus"]["total_docs"] <= 25

    res = _run("fsck", "--index", merged)
    assert res.returncode == 0, res.stderr[-3000:]
    assert json.loads(res.stdout.splitlines()[-1])["clean"] is True

    # corrupt: drop one shard's docs partition -> orphaned postings
    shutil.rmtree(os.path.join(merged, "docs", "shard=0"))
    res = _run("fsck", "--index", merged)
    assert res.returncode == 1, res.stderr[-3000:]
    assert any("orphan_posting" in line for line in res.stdout.splitlines())


def test_cli_history(tmp_path):
    idx = str(tmp_path / "hist_idx")
    res = _run("build", "--synthetic", "20", "--index", idx, "--shards", "2")
    assert res.returncode == 0, res.stderr[-3000:]
    res = _run("history", "--index", idx, "--asof", "2099-01-01")
    assert res.returncode == 0, res.stderr[-3000:]
    assert "version" in res.stdout and "append" in res.stdout
    asof = json.loads(
        [line for line in res.stdout.splitlines() if line.startswith("{")][-1]
    )
    assert asof["asof"] == "2099-01-01"
    assert asof["postings"] > 0
