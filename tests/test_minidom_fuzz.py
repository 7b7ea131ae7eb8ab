"""Tag-soup robustness for the minidom tree builder: the HTML5
error-recovery machinery (implied end tags, scope barriers, active
formatting + adoption agency) must terminate on ANY input and never
lose or duplicate text.

Invariants:
- parse_html completes (no exception, bounded time);
- the concatenated text content equals the input's character data —
  the agency MOVES nodes between parents, it never clones TextNodes,
  so text is preserved exactly and (outside foster-parenting, which
  only table contexts trigger) in input order.
"""

from __future__ import annotations

import random

from document_retrieval_system_spark.sources.minidom import parse_html

# no raw-text elements (their content swallows subsequent markup) and no
# table tags in the ORDER alphabet (foster parenting may legally reorder)
_ORDER_TAGS = ["b", "i", "em", "strong", "a", "p", "div", "span", "li",
               "ul", "dt", "dd", "h1", "h3", "button", "option", "nobr"]
_ALL_TAGS = _ORDER_TAGS + ["table", "tr", "td", "th", "caption", "object",
                           "marquee", "br", "img"]


def _soup(rng: random.Random, tags: list[str], n: int) -> tuple[str, str]:
    parts, text = [], []
    for i in range(n):
        r = rng.random()
        if r < 0.4:
            parts.append(f"<{rng.choice(tags)}>")
        elif r < 0.7:
            parts.append(f"</{rng.choice(tags)}>")
        else:
            t = f"t{i} "
            parts.append(t)
            text.append(t)
    return "".join(parts), "".join(text)


def test_fuzz_text_preserved_in_order():
    rng = random.Random(0xD5)
    for trial in range(300):
        html, want = _soup(rng, _ORDER_TAGS, rng.randrange(1, 120))
        got = parse_html(html).get_text()
        assert got == want, f"trial {trial}: {html!r}"


def test_fuzz_with_table_tags_text_multiset_preserved():
    rng = random.Random(0xA7)
    for trial in range(300):
        html, want = _soup(rng, _ALL_TAGS, rng.randrange(1, 120))
        got = parse_html(html).get_text()
        assert sorted(got) == sorted(want), f"trial {trial}: {html!r}"


def test_pathological_formatting_bounded():
    """Noah's Ark caps identical active-formatting entries at 3, so
    pathological unclosed-formatting streams can't make reconstruction
    quadratic: every text node re-opens at most 3 <b> clones."""
    import time

    html = "<b>x<p>" * 3000
    t0 = time.time()
    root = parse_html(html)
    dt = time.time() - t0
    assert dt < 5.0, f"pathological parse took {dt:.1f}s"
    assert root.get_text() == "x" * 3000
