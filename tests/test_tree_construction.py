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

Expected trees are html5lib's output NORMALIZED by the three documented
divergences below.  Anything else that differs is a bug.

DOCUMENTED DIVERGENCES (minidom vs html5lib), each with the reason it
cannot change extractor output (sources/html_extract.py):

1. No <html>/<head>/<body> wrapper synthesis.  The extractor only uses
   document-order find_all / find from the root and get_text; wrapper
   elements contain no text and are never selection targets, so their
   absence changes neither traversal order nor any query result.
2. No <tbody>/<colgroup> synthesis inside <table>.  The extractor never
   queries table-section tags; find_all("tr"/"td") and get_text see the
   same nodes in the same order either way.
3. Stray table parts outside a table (e.g. a bare <td>) are kept as
   elements instead of being dropped-but-text-kept (html5lib "in body"
   ignores the tags).  get_text is identical; the noise filter targets
   class/id attributes, which these synthetic strays don't carry, and
   the main-content candidates do not include td/tr.
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
