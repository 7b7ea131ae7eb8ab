"""Host-conditioned boilerplate removal (operators/boilerplate.py)."""

from __future__ import annotations

import pytest

from document_retrieval_system_spark.operators.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)

NAV = "home about contact"
FOOT = "copyright 2025 acme"


def _pages(spark):
    # host a: 4 pages sharing NAV + FOOT; "rare line" on 1 page only;
    # page a3 is ALL boilerplate; a0 repeats NAV twice within the page.
    # host b: 2 pages sharing NAV -> below min_pages=3, never flagged.
    rows = [
        (0, "a", NAV + "\n" + NAV + "\nalpha unique\n" + FOOT),
        (1, "a", NAV + "\nbeta unique\nrare line\n" + FOOT),
        (2, "a", NAV + "\ngamma unique\n\n" + FOOT),
        (3, "a", NAV + "\n" + FOOT),
        (4, "b", NAV + "\ndelta unique"),
        (5, "b", NAV + "\nepsilon unique"),
    ]
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


def test_boiler_detection(spark):
    got = {
        (r["host"], r["line"], r["n_pages"], r["host_pages"])
        for r in boilerplate_lines(_pages(spark), min_pages=3,
                                   min_frac=0.5).collect()
    }
    assert got == {("a", NAV, 4, 4), ("a", FOOT, 4, 4)}


def test_strip_reassembles_in_order_and_keeps_empty_doc(spark):
    out = {r["doc_id"]: r for r in
           strip_boilerplate(_pages(spark), min_pages=3,
                             min_frac=0.5).collect()}
    assert len(out) == 6  # no doc silently dropped
    assert out[0]["text"] == "alpha unique"          # both NAV copies gone
    assert out[0]["n_removed"] == 3 and out[0]["n_lines"] == 4
    assert out[1]["text"] == "beta unique\nrare line"
    assert out[2]["text"] == "gamma unique\n"        # empty line kept
    assert out[3]["text"] == "" and out[3]["n_removed"] == 2
    # host b below min_pages: untouched
    assert out[4]["text"] == NAV + "\ndelta unique"
    assert out[4]["n_removed"] == 0


def test_min_frac_boundary(spark):
    # a line on exactly half a host's pages: >= keeps it flagged at 0.5,
    # a stricter 0.6 releases it.
    rows = [(i, "h", ("promo line\n" if i < 2 else "") + f"body {i}")
            for i in range(4)]
    pages = spark.createDataFrame(rows, "doc_id long, host string, text string")
    flagged = {r["line"] for r in
               boilerplate_lines(pages, min_pages=2, min_frac=0.5).collect()}
    assert flagged == {"promo line"}
    assert boilerplate_lines(pages, min_pages=2, min_frac=0.6).count() == 0


def test_empty_lines_never_flagged(spark):
    rows = [(i, "h", f"\n\nbody {i}\n\n") for i in range(6)]
    pages = spark.createDataFrame(rows, "doc_id long, host string, text string")
    assert boilerplate_lines(pages, min_pages=2, min_frac=0.1).count() == 0
    out = strip_boilerplate(pages, min_pages=2, min_frac=0.1).collect()
    assert all(r["n_removed"] == 0 for r in out)
    assert all(r["text"] == f"\n\nbody {r['doc_id']}\n\n" for r in out)


def test_same_line_other_host_untouched(spark):
    # NAV is boilerplate on host a (3/3 pages) but content on host c
    # (1/3 pages): host-conditioning must keep c's copy.
    rows = [(i, "a", NAV + f"\nbody a{i}") for i in range(3)]
    rows += [(10, "c", NAV + "\nbody c0"), (11, "c", "body c1"),
             (12, "c", "body c2")]
    pages = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {r["doc_id"]: r["text"] for r in
           strip_boilerplate(pages, min_pages=2, min_frac=0.5).collect()}
    assert out[0] == "body a0"
    assert out[10] == NAV + "\nbody c0"


def test_no_cartesian_in_plan(spark):
    plan = strip_boilerplate(_pages(spark))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
