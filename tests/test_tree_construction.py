"""Tree-construction corpus for minidom, in the html5lib-tests format.

The reference parses HTML with BeautifulSoup+html5lib
(/root/reference/core/datasource/parsers/html_parser.py:55); neither
library nor the public html5lib-tests repository is reachable in this
sandbox, so tests/data/tree_construction.dat carries spec-derived cases
written in the html5lib-tests #data/#document format, focused on the
error-recovery classes the extractor's structural queries touch:
implied end tags (p, li/dt/dd, tr/td/th, headings, option), scope
barriers (button, td/th, caption), raw-text elements, stray end tags,
and deep table-row recovery.

Expected trees are html5lib's output NORMALIZED by the two documented
divergences below.  Anything else that differs is a bug.

DOCUMENTED DIVERGENCES (minidom vs html5lib), each pinned by an
extractor-output INVARIANCE test at the bottom of this file (wrapping a
fragment the way html5lib would synthesize wrappers changes nothing the
extractor returns):

1. No <html>/<head>/<body> wrapper synthesis.  The extractor only uses
   document-order find_all / find from the root and get_text; wrapper
   elements contain no text and are never selection targets.  The one
   reachable tree delta — a leading <title>, which html5lib parents
   into <head> (decomposed as a FILTER_TAG) and we keep at the root —
   is also invariant: a root-level title sits outside every content
   tag, heading query, and main-region candidate.
   (test_divergence1_wrapper_synthesis_is_extractor_invariant)
2. No <tbody>/<colgroup> synthesis inside <table>.  The synthesized
   wrapper is attribute-less and never a query target; find_all
   ("tr"/"td") and get_text see the same nodes in the same order.
   (test_divergence2_tbody_synthesis_is_extractor_invariant)
(Formerly-documented divergence 3 — stray table parts outside a table
kept as elements — is CLOSED as of r4: start tags for
caption/col/colgroup/tbody/td/tfoot/th/thead/tr with no open table are
ignored per the "in body" rules, so their text stays inline exactly as
html5lib leaves it.  It had to be implemented rather than argued:
inside a main region the kept <td> WAS reachable (td is a content tag)
and emitted its text twice — see
test_stray_td_outside_table_is_ignored_like_html5lib.)
(Formerly-documented divergence 4 — no adoption agency — is CLOSED as
of r3: minidom implements the list of active formatting elements
(markers, Noah's Ark clause, reconstruction on text/start tags) and the
full 8-iteration adoption agency algorithm, so misnested formatting
(<b>a<p>x</b>c, <b><i>a</b>b</i>, nested-div splits, the <a>-in-<a>
rule) produces html5lib-identical trees; the agency cases at the end of
tree_construction.dat pin it.)
"""

from __future__ import annotations

import os

import pytest

from document_retrieval_system_spark.sources.minidom import (
    Element,
    TextNode,
    parse_html,
)

DAT = os.path.join(os.path.dirname(__file__), "data", "tree_construction.dat")


def load_cases() -> list[tuple[str, str]]:
    cases = []
    with open(DAT, encoding="utf-8") as f:
        text = f.read()
    for chunk in text.split("#data\n"):
        chunk = chunk.strip("\n")
        if not chunk:
            continue
        data, _, doc = chunk.partition("\n#document\n")
        cases.append((data, doc.rstrip("\n")))
    return cases


def serialize(el: Element, depth: int = 0, out: list[str] | None = None) -> str:
    if out is None:
        out = []
    for child in el.children:
        pad = "| " + "  " * depth
        if isinstance(child, TextNode):
            out.append(f'{pad}"{child.data}"')
        else:
            out.append(f"{pad}<{child.name}>")
            for k in sorted(child.attrs):
                out.append(f'| {"  " * (depth + 1)}{k}="{child.attrs[k]}"')
            serialize(child, depth + 1, out)
    return "\n".join(out)


@pytest.mark.parametrize(
    "data,expected", load_cases(), ids=[d[:40] for d, _ in load_cases()]
)
def test_tree_construction(data: str, expected: str):
    got = serialize(parse_html(data))
    assert got == expected, f"\n--input--\n{data}\n--got--\n{got}\n--want--\n{expected}"


# ---------------------------------------------------------------------------
# Divergence unreachability proofs: the two remaining (documented)
# divergences vs html5lib are wrapper-synthesis ones; these tests prove
# extractor-output invariance, not just argue it.
# ---------------------------------------------------------------------------

def _extract(html: str) -> dict:
    from document_retrieval_system_spark.sources.html_extract import extract_html

    return extract_html(html.encode(), "https://x.example/page/1")


_LONG = "carrying well over twenty characters of body text here"


def test_divergence1_wrapper_synthesis_is_extractor_invariant():
    """No html/head/body synthesis: wrapping any fragment in the
    wrappers html5lib would synthesize (including moving leading
    head-content into an explicit <head>) changes NOTHING the extractor
    returns — wrappers carry no text and are never query targets.  The
    one reachable tree delta is a leading <title> (html5lib parents it
    into <head>, which FILTER_TAGS decomposes; we keep it at the root)
    — also invariant, because a root-level title is outside every
    content tag / heading / main-region candidate."""
    fragments = [d for d, _ in load_cases()]
    for frag in fragments:
        bare = _extract(frag)
        wrapped = _extract(f"<html><head></head><body>{frag}</body></html>")
        assert bare["content"] == wrapped["content"], frag

    # leading head-content: html5lib puts these in <head> (decomposed as
    # FILTER_TAGS); we keep title at root — content AND title invariant
    head_bits = '<title>The doc title</title><meta name="a" content="b">'
    body = f'<p>{_LONG}</p><div id="main-content"><p>{_LONG} two</p></div>'
    bare = _extract(head_bits + body)
    wrapped = _extract(
        f"<html><head>{head_bits}</head><body>{body}</body></html>"
    )
    assert bare["content"] == wrapped["content"]
    assert bare["title"] == wrapped["title"] == "The doc title"
    assert "doc title" not in bare["content"]


def test_divergence2_tbody_synthesis_is_extractor_invariant():
    """No tbody synthesis: an explicit (attribute-less) <tbody> — exactly
    what html5lib would synthesize — around the row group changes no
    extractor output, in both the main-region and fallback branches, and
    find_all('tr'/'td') / get_text see identical nodes either way."""
    row = f"<tr><td>cell {_LONG}</td><td>second {_LONG}</td></tr>"
    cases = [
        f'<div id="main-content"><table>{row}{row}</table></div>',
        f"<h1>Heading over five chars</h1><table>{row}</table>",
    ]
    for bare_html in cases:
        with_tbody = bare_html.replace(
            f"<table>{row}", f"<table><tbody>{row}"
        ).replace("</table>", "</tbody></table>")
        assert with_tbody != bare_html
        assert _extract(bare_html)["content"] == _extract(with_tbody)["content"]

    # parser-level: same td/tr node text in the same order
    bare_tree = parse_html(cases[0])
    tb_tree = parse_html(
        cases[0].replace("<table>", "<table><tbody>").replace(
            "</table>", "</tbody></table>"
        )
    )
    for name in ("tr", "td"):
        assert [e.get_text(strip=True) for e in bare_tree.find_all(name)] == [
            e.get_text(strip=True) for e in tb_tree.find_all(name)
        ]
    assert bare_tree.get_text() == tb_tree.get_text()
