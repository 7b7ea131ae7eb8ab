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
# start tags that imply closing these same-level open elements first
_IMPLIED_END = {
    "li": frozenset(["li"]),
    "dt": frozenset(["dt", "dd"]),
    "dd": frozenset(["dt", "dd"]),
    "tr": frozenset(["tr", "td", "th"]),
    "td": frozenset(["td", "th"]),
    "th": frozenset(["td", "th"]),
    "option": frozenset(["option"]),
}
# elements that bound the upward scan (simplified button/table scope)
_SCOPE_BARRIERS = frozenset(
    "html body table caption applet object marquee template [document]".split()
)
# precomputed start-tag -> close-target set; absent = fast no-op (the
# overwhelmingly common case on the per-start-tag hot path)
_CLOSE_TARGETS: dict[str, frozenset] = {
    t: frozenset({"p"}) | _IMPLIED_END.get(t, frozenset()) for t in _P_CLOSERS
}
for _t, _v in _IMPLIED_END.items():
    _CLOSE_TARGETS.setdefault(_t, _v)


class _TreeBuilder(_StdHTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack: list[Element] = [self.root]

    def _implied_close(self, tag: str) -> None:
        targets = _CLOSE_TARGETS.get(tag)
        if targets is None:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            name = self.stack[i].name
            if name in targets:
                del self.stack[i:]
                return
            if name in _SCOPE_BARRIERS or (tag in ("td", "th") and name == "tr"):
                return

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
