"""A tiny HTML DOM on top of ``html.parser`` (stdlib, dependency-free).

The reference parses HTML with BeautifulSoup+html5lib
(/root/reference/core/datasource/parsers/html_parser.py:55).  Neither is
installed here, so this module provides the minimal subset of the bs4 API
the extractor algorithm needs, with matching semantics:

- document-order ``find_all`` / ``find`` with tag-name lists, ``True``
  (any tag), and attribute filters (present / exact string / compiled
  regex; the multi-valued ``class`` attribute matches if any single class
  token matches, like bs4);
- ``get_text(strip=True)``: every descendant string stripped, empties
  dropped, joined with '' (bs4 ``separator=''`` default);
- ``decompose()``: detach the subtree from the document.

Parsing details: void elements never take children; content of
``<script>``/``<style>`` is raw text (html.parser CDATA mode); mismatched
end tags pop to the nearest open tag of that name and are otherwise
ignored.  The synthetic corpus is well-formed, so html5lib's error
recovery quirks are out of scope (documented divergence).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser as _StdHTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class TextNode:
    __slots__ = ("data", "parent")

    def __init__(self, data: str, parent: "Element | None"):
        self.data = data
        self.parent = parent


class Element:
    __slots__ = ("name", "attrs", "children", "parent", "_decomposed")

    def __init__(self, name: str, attrs: dict[str, str] | None = None,
                 parent: "Element | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list[Element | TextNode] = []
        self.parent = parent
        self._decomposed = False

    # -- tree ops ----------------------------------------------------------
    def append(self, node: "Element | TextNode") -> None:
        node.parent = self
        self.children.append(node)

    def decompose(self) -> None:
        """Detach this subtree from the document (bs4 Tag.decompose)."""
        self._decomposed = True
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
        self.parent = None

    # -- queries -----------------------------------------------------------
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    @property
    def class_list(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def _iter_elements(self):
        """Document-order descendant elements (self excluded)."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Element):
                yield node
                stack.extend(reversed(node.children))

    def _iter_strings(self):
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, TextNode):
                yield node.data
            else:
                stack.extend(reversed(node.children))

    def get_text(self, strip: bool = False) -> str:
        if strip:
            return "".join(s for s in (t.strip() for t in self._iter_strings()) if s)
        return "".join(self._iter_strings())

    def _matches(self, names, attrs) -> bool:
        if names is not True and names is not None:
            if isinstance(names, str):
                if self.name != names:
                    return False
            elif self.name not in names:
                return False
        if attrs:
            for key, want in attrs.items():
                if key not in self.attrs:
                    return False
                if want is True:
                    continue
                value = self.attrs[key]
                if isinstance(want, re.Pattern):
                    if key == "class":
                        # bs4: multi-valued attr — any single token may match
                        if not any(want.search(c) for c in self.class_list):
                            return False
                    elif not want.search(value):
                        return False
                elif isinstance(want, str):
                    if key == "class":
                        if want not in self.class_list:
                            return False
                    elif value != want:
                        return False
        return True

    def find_all(self, names=None, attrs=None, limit=None) -> list["Element"]:
        out: list[Element] = []
        for el in self._iter_elements():
            if el._matches(names, attrs):
                out.append(el)
                if limit is not None and len(out) >= limit:
                    break
        return out

    def find(self, names=None, attrs=None) -> "Element | None":
        hits = self.find_all(names, attrs, limit=1)
        return hits[0] if hits else None


# HTML5 tree construction: start tags that imply closing an open <p>
# ("closes a p element in button scope") — html5lib applies these; the
# stdlib parser does not, so we do it here for parity.
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption "
    "figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr main menu nav "
    "ol p pre section summary table ul".split()
)
_HEADINGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
# the HTML "special" category (tree construction spec / html5lib
# constants) — the li/dt/dd closing loops stop at these, EXCEPT
# address/div/p which they scan straight through
_SPECIAL = frozenset(
    "address applet area article aside base basefont bgsound blockquote "
    "body br button caption center col colgroup dd details dir div dl dt "
    "embed fieldset figcaption figure footer form frame frameset h1 h2 h3 "
    "h4 h5 h6 head header hgroup hr html iframe img input li link listing "
    "main marquee menu meta nav noembed noframes noscript object ol p "
    "param plaintext pre script section select source style summary table "
    "tbody td textarea tfoot th thead title tr track ul wbr xmp".split()
)
_LI_STOPS = _SPECIAL - frozenset(["address", "div", "p"])
# button scope (the p-closing scope): the base scope list + button
_SCOPE_BARRIERS = frozenset(
    "html body table caption td th applet object marquee template button "
    "[document]".split()
)
# item start tags: (close targets, scan stoppers beyond the barriers).
# an li must NOT close an li on the far side of a nested <ul> (the new
# li belongs INSIDE the nested list) but DOES scan through div/p; a td
# must not reach past its row.
_ITEM_RULES: dict[str, tuple[frozenset, frozenset]] = {
    "li": (frozenset(["li"]), _LI_STOPS),
    "dt": (frozenset(["dt", "dd"]), _LI_STOPS),
    "dd": (frozenset(["dt", "dd"]), _LI_STOPS),
    "tr": (frozenset(["tr", "td", "th"]),
           frozenset(["tbody", "thead", "tfoot"])),
    "td": (frozenset(["td", "th"]), frozenset(["tr", "tbody", "thead", "tfoot"])),
    "th": (frozenset(["td", "th"]), frozenset(["tr", "tbody", "thead", "tfoot"])),
}
_P_SET = frozenset(["p"])
_EMPTY = frozenset()
# fast no-op guard for the per-start-tag hot path
_NEEDS_CLOSE = _P_CLOSERS | frozenset(_ITEM_RULES) | frozenset(["option"])


class _TreeBuilder(_StdHTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack: list[Element] = [self.root]

    def _scan_close(self, targets: frozenset, stops: frozenset,
                    close_row: bool = False) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            name = self.stack[i].name
            if name in targets:
                cut = i
                if close_row and name in ("td", "th"):
                    # html5lib clears back to table-body context: a new
                    # row closes the open cell AND its row — cutting only
                    # the cell would nest the new row inside the old one
                    for j in range(i - 1, 0, -1):
                        n2 = self.stack[j].name
                        if n2 == "tr":
                            cut = j
                            break
                        if n2 in _SCOPE_BARRIERS or n2 in stops:
                            break
                del self.stack[cut:]
                return
            if name in _SCOPE_BARRIERS or name in stops:
                return

    def _implied_close(self, tag: str) -> None:
        if tag not in _NEEDS_CLOSE:
            return
        rule = _ITEM_RULES.get(tag)
        if rule is not None:
            self._scan_close(rule[0], rule[1], close_row=(tag == "tr"))
            if tag in ("li", "dt", "dd"):
                # spec step after the item loop: ALSO close an open p in
                # button scope (e.g. <div>a<p>b<li> puts li beside p)
                self._scan_close(_P_SET, _EMPTY)
            return
        if tag in _P_CLOSERS:
            self._scan_close(_P_SET, _EMPTY)
            if tag in _HEADINGS and self.stack[-1].name in _HEADINGS:
                # a heading start tag pops a heading CURRENT node
                del self.stack[-1:]
            return
        if tag == "option" and self.stack[-1].name == "option":
            # option closes only an option current node (no deep scan)
            del self.stack[-1:]

    def handle_starttag(self, tag, attrs):
        self._implied_close(tag)
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:  # first occurrence wins (bs4 behavior)
                attr_dict[k] = v if v is not None else ""
        el = Element(tag, attr_dict)
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        self.stack[-1].append(Element(tag, attr_dict))

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].append(TextNode(data, self.stack[-1]))


def parse_html(html: str) -> Element:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
