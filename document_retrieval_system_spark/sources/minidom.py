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
``<script>``/``<style>`` is raw text (html.parser CDATA mode); HTML5
tree-construction error recovery is implemented for the classes web
text actually hits — implied end tags (p/li/dt/dd/tr/td/th/headings/
option), scope barriers, and the full active-formatting machinery
(markers, Noah's Ark, reconstruction, the 8-iteration adoption agency
algorithm) so misnested formatting tags produce html5lib-identical
trees, and stray table-part start tags outside a table are ignored per
the "in body" rules (r4 — keeping the element diverged inside main
regions).  The two remaining documented divergences (no html/head/body
wrapper synthesis, no tbody synthesis) are pure wrapper deltas; each
carries an extractor-output INVARIANCE test (not just an argument) in
tests/test_tree_construction.py.
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
        if isinstance(names, (list, tuple, set)):
            names = frozenset(names)
        out: list[Element] = []
        if not attrs and names is not None and names is not True:
            # hot path for the extractor's name-only scans: skip the
            # per-element _matches call
            if isinstance(names, str):
                for el in self._iter_elements():
                    if el.name == names:
                        out.append(el)
                        if limit is not None and len(out) >= limit:
                            break
            else:
                for el in self._iter_elements():
                    if el.name in names:
                        out.append(el)
                        if limit is not None and len(out) >= limit:
                            break
            return out
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

# the spec's formatting category: these participate in the list of
# active formatting elements + the adoption agency algorithm
_FORMATTING = frozenset(
    "a b big code em font i nobr s small strike strong tt u".split()
)
# start tags that insert a marker into the active formatting list (their
# end tags clear back to it) — formatting never reconstructs across these
_AFE_MARKER_TAGS = frozenset(
    "applet object marquee template caption td th".split()
)
# "in body" start-tag rules that do NOT reconstruct active formatting
# before inserting (block starters, list items, table machinery, raw-text
# heads); everything else — formatting tags, spans, buttons, images,
# "any other start tag" — reconstructs first, per spec
_NO_RECONSTRUCT = (
    _P_CLOSERS
    | frozenset(_ITEM_RULES)
    | frozenset(
        "hr html head body frame frameset form caption colgroup col "
        "tbody thead tfoot script style title textarea".split()
    )
)
_TABLE_FOSTER = frozenset(["table", "tbody", "tfoot", "thead", "tr"])
# spec "in body": start tags for table parts with NO open table are
# parse errors and the token is IGNORED (text content stays inline) —
# html5lib drops the element, so keeping it diverged on extractor
# queries that target td (closed r4)
_TABLE_PARTS = frozenset(
    "caption col colgroup tbody td tfoot th thead tr".split()
)


def _detach(node) -> None:
    if node.parent is not None:
        try:
            node.parent.children.remove(node)
        except ValueError:
            pass
    node.parent = None


def _contains(ancestor, node) -> bool:
    """True when ``node`` is ``ancestor`` or sits in its subtree."""
    while node is not None:
        if node is ancestor:
            return True
        node = node.parent
    return False


class _TreeBuilder(_StdHTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack: list[Element] = [self.root]
        # list of active formatting elements; None entries are markers
        self.afe: list[Element | None] = []

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
                # an implied cell/caption close clears formatting back to
                # the marker each popped cell inserted (one clear per
                # popped marker element)
                for el in self.stack[cut:]:
                    if el.name in _AFE_MARKER_TAGS:
                        self._clear_afe_to_marker()
                del self.stack[cut:]
                return
            if name in _SCOPE_BARRIERS or name in stops:
                return

    # -- active formatting elements (spec 13.2.4.3) -------------------------
    def _on_stack(self, el: Element) -> bool:
        return any(el is s for s in self.stack)

    def _clear_afe_to_marker(self) -> None:
        afe = self.afe
        while afe:
            e = afe.pop()
            if e is None:
                return

    def _afe_push(self, el: Element) -> None:
        # Noah's Ark clause: at most 3 entries with identical tag+attrs
        # since the last marker (bounds reconstruction on pathological
        # pages with thousands of unclosed <b>)
        same = []
        for e in reversed(self.afe):
            if e is None:
                break
            if e.name == el.name and e.attrs == el.attrs:
                same.append(e)
        if len(same) >= 3:
            self.afe.remove(same[-1])  # the earliest matching entry
        self.afe.append(el)

    def _afe_take(self, name: str) -> Element | None:
        """Last AFE entry with this tag name since the last marker."""
        for e in reversed(self.afe):
            if e is None:
                return None
            if e.name == name:
                return e
        return None

    def _reconstruct(self) -> None:
        """Re-open formatting elements that were implicitly closed (spec
        'reconstruct the active formatting elements'): clones of every
        trailing AFE entry not on the stack nest into the current node."""
        afe = self.afe
        if not afe:
            return
        last = afe[-1]
        if last is None or self._on_stack(last):
            return
        idx = len(afe) - 1
        while idx > 0 and afe[idx - 1] is not None and not self._on_stack(afe[idx - 1]):
            idx -= 1
        for k in range(idx, len(afe)):
            entry = afe[k]
            clone = Element(entry.name, dict(entry.attrs))
            self.stack[-1].append(clone)
            self.stack.append(clone)
            afe[k] = clone

    def _adoption_agency(self, subject: str) -> None:
        """The adoption agency algorithm (spec 13.2.6.4.7 'in body', end
        tag for a formatting element), identity-based.  Handles misnested
        formatting (<b>a<p>x</b>c) the way html5lib does: the formatting
        element is split around the intervening block, so text order AND
        per-block bucketing match the reference parser."""
        stack, afe = self.stack, self.afe
        cur = stack[-1]
        if cur.name == subject and not any(cur is e for e in afe):
            stack.pop()
            return
        for _ in range(8):
            fmt = self._afe_take(subject)
            if fmt is None:
                # "any other end tag": pop to the nearest open match, but
                # ABORT at the first special element — </b> inside an
                # open <td> must be ignored, not allowed to destroy the
                # enclosing cell/table structure (spec: 'if node is in
                # the special category ... ignore the token')
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].name == subject:
                        del stack[i:]
                        return
                    if stack[i].name in _SPECIAL:
                        return
                return
            if not self._on_stack(fmt):
                afe.remove(fmt)
                return
            si = stack.index(fmt)
            fb = None  # furthest block: first special element below fmt
            fbi = -1
            for i in range(si + 1, len(stack)):
                if stack[i].name in _SPECIAL:
                    fb, fbi = stack[i], i
                    break
            if fb is None:
                del stack[si:]
                afe.remove(fmt)
                return
            common = stack[si - 1]
            bookmark = afe.index(fmt)
            node_i = fbi
            last_node = fb
            inner = 0
            while True:
                inner += 1
                node_i -= 1
                node = stack[node_i]
                if node is fmt:
                    break
                in_afe = any(node is e for e in afe)
                if inner > 3 and in_afe:
                    afe.remove(node)
                    in_afe = False
                if not in_afe:
                    del stack[node_i]
                    continue
                clone = Element(node.name, dict(node.attrs))
                afe[afe.index(node)] = clone
                stack[node_i] = clone
                node = clone
                if last_node is fb:
                    bookmark = afe.index(node) + 1
                _detach(last_node)
                node.append(last_node)
                last_node = node
            _detach(last_node)
            table = None
            if common.name in _TABLE_FOSTER:
                for i in range(len(stack) - 1, -1, -1):
                    if stack[i].name == "table":
                        table = stack[i]
                        break
            if (table is not None and table.parent is not None
                    and not _contains(last_node, table.parent)):
                # foster parenting: insert immediately before the table
                tgt = table.parent
                last_node.parent = tgt
                tgt.children.insert(tgt.children.index(table), last_node)
            elif not _contains(last_node, common):
                common.append(last_node)
            else:
                # tag soup put every candidate parent inside last_node's
                # own subtree (spec states can't, ours can) — the root is
                # always cycle-free; never orphan text
                self.root.append(last_node)
            clone = Element(fmt.name, dict(fmt.attrs))
            for ch in fb.children:
                ch.parent = clone
            clone.children = fb.children
            fb.children = []
            fb.append(clone)
            bi = afe.index(fmt)
            afe.remove(fmt)
            if bookmark > bi:
                bookmark -= 1
            afe.insert(bookmark, clone)
            stack.remove(fmt)
            stack.insert(stack.index(fb) + 1, clone)

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

    def _table_open(self) -> bool:
        return any(el.name == "table" for el in self.stack)

    def handle_starttag(self, tag, attrs):
        if tag in _TABLE_PARTS and not self._table_open():
            return  # stray table part outside any table: ignore the token
        self._implied_close(tag)
        if tag == "a" and self._afe_take("a") is not None:
            # spec: an <a> with an open <a> in the formatting list acts
            # as if </a> was seen, then drops any leftover entry
            self._adoption_agency("a")
            left = self._afe_take("a")
            if left is not None:
                self.afe.remove(left)
                if self._on_stack(left):
                    self.stack.remove(left)
        if tag in _FORMATTING or tag not in _NO_RECONSTRUCT:
            self._reconstruct()
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:  # first occurrence wins (bs4 behavior)
                attr_dict[k] = v if v is not None else ""
        el = Element(tag, attr_dict)
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)
            if tag in _FORMATTING:
                self._afe_push(el)
            elif tag in _AFE_MARKER_TAGS:
                self.afe.append(None)

    def handle_startendtag(self, tag, attrs):
        if tag in _TABLE_PARTS and not self._table_open():
            return
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        self.stack[-1].append(Element(tag, attr_dict))

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        if tag in _FORMATTING:
            self._adoption_agency(tag)
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                # ANY popped marker element (e.g. </table> implicitly
                # closing an open td) clears the formatting list back to
                # its marker — keying on the end tag itself would leave a
                # stale marker that blocks reconstruction forever
                for el in self.stack[i:]:
                    if el.name in _AFE_MARKER_TAGS:
                        self._clear_afe_to_marker()
                del self.stack[i:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data):
        if data:
            # raw/RCDATA content never reconstructs formatting
            if self.stack[-1].name not in ("script", "style", "title",
                                           "textarea"):
                self._reconstruct()
            self.stack[-1].append(TextNode(data, self.stack[-1]))


def parse_html(html: str) -> Element:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
