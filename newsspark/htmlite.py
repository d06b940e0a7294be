"""htmlite — a tiny, total (never-raising), stdlib-only HTML document tree.

From-scratch replacement for the DOM layer the reference builds with
BeautifulSoup/lxml (reference: extractor.py:337, 467).  Implements exactly the
surface the reference uses:

- ``find(tag, attrs)`` / ``find_all(tag, attrs, limit)``  (extractor.py:99, 108, 142)
- ``select(selector)`` / ``select_one(selector)`` for the tiny CSS subset the
  reference needs: tag, ``#id``, ``.class``, ``tag.class``, ``tag[attr]``,
  descendant combinator, comma alternatives
  (extractor.py:118-127, 191, 473-474)
- ``get_text(sep)`` with optional subtree skipping, matching the reference's
  decompose(script/style/noscript)-then-get_text("\n") pattern
  (extractor.py:477-479, 490-493)

Parsing is built on ``html.parser.HTMLParser`` and is deliberately total: any
byte soup yields *some* tree.  Unclosed tags are closed implicitly; stray end
tags are ignored.  Attribute values are first-occurrence-wins; valueless
attributes map to ``""`` (mirrors bs4's behaviour that the reference relies on
via ``img.get('src') or img.get('data-src')``, extractor.py:131).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, List, Optional

# Tags that never take children (HTML5 void elements).
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Block-ish tags whose implicit nesting we normalize: a new <p> closes an open <p>.
_P_CLOSERS = frozenset("p li dt dd option tr td th".split())


class Node:
    """One element.  Text is stored as plain ``str`` entries in ``children``."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: Optional[dict] = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # Node | str
        self.parent: Optional["Node"] = None

    # -- attribute access -------------------------------------------------
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    @property
    def classes(self) -> List[str]:
        return self.attrs.get("class", "").split()

    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    # -- traversal ---------------------------------------------------------
    def iter_elements(self) -> Iterator["Node"]:
        """Pre-order DFS over descendant *elements* (document order)."""
        stack = list(reversed([c for c in self.children if isinstance(c, Node)]))
        while stack:
            node = stack.pop()
            yield node
            stack.extend(
                reversed([c for c in node.children if isinstance(c, Node)])
            )

    def ancestors(self) -> Iterator["Node"]:
        node = self.parent
        while node is not None:
            yield node
            node = node.parent

    # -- find API (bs4-shaped subset) ---------------------------------------
    def find(self, tag: Optional[str] = None, attrs: Optional[dict] = None):
        for node in self.iter_elements():
            if _matches_find(node, tag, attrs):
                return node
        return None

    def find_all(
        self,
        tag: Optional[str] = None,
        attrs: Optional[dict] = None,
        limit: Optional[int] = None,
    ) -> List["Node"]:
        out: List[Node] = []
        for node in self.iter_elements():
            if _matches_find(node, tag, attrs):
                out.append(node)
                if limit is not None and len(out) >= limit:
                    break
        return out

    # -- selector API --------------------------------------------------------
    def select(self, selector: str, limit: Optional[int] = None) -> List["Node"]:
        alts = _parse_selector(selector)
        out: List[Node] = []
        if len(alts) == 1:
            chain = alts[0]
            for node in self.iter_elements():
                if _matches_chain(node, chain):
                    out.append(node)
                    if limit is not None and len(out) >= limit:
                        break
            return out
        for node in self.iter_elements():
            if any(_matches_chain(node, chain) for chain in alts):
                out.append(node)
                if limit is not None and len(out) >= limit:
                    break
        return out

    def select_one(self, selector: str):
        found = self.select(selector, limit=1)
        return found[0] if found else None

    # -- text ----------------------------------------------------------------
    def get_text(self, sep: str = "", skip: frozenset = frozenset()) -> str:
        """Join all descendant text nodes with ``sep``, skipping subtrees whose
        tag is in ``skip`` (the decompose-equivalent, extractor.py:477-479)."""
        parts: List[str] = []
        self._collect_text(parts, skip)
        return sep.join(parts)

    def _collect_text(self, parts: List[str], skip: frozenset) -> None:
        for child in self.children:
            if isinstance(child, str):
                parts.append(child)
            elif child.tag not in skip:
                child._collect_text(parts, skip)

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Node {self.tag} id={self.id!r} class={self.attrs.get('class','')!r}>"


def _matches_find(node: Node, tag: Optional[str], attrs: Optional[dict]) -> bool:
    if tag is not None and node.tag != tag:
        return False
    if attrs:
        for key, want in attrs.items():
            have = node.attrs.get(key)
            if want is True:  # presence test (bs4 src=True)
                if have is None:
                    return False
            elif have != want:
                return False
    return True


# ---------------------------------------------------------------------------
# Selector subset
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<attrs>(?:\[[\w-]+(?:=[^\]]*)?\])*)$"
)
_ATTR_RE = re.compile(r"\[([\w-]+)(?:=([^\]]*))?\]")


def _parse_simple(token: str):
    m = _SIMPLE_RE.match(token)
    if not m:
        return None  # unsupported selector token -> matches nothing
    tag = m.group("tag")
    if tag == "*":
        tag = None
    node_id = m.group("id")[1:] if m.group("id") else None
    classes = [c for c in (m.group("classes") or "").split(".") if c]
    attrs = []
    for name, value in _ATTR_RE.findall(m.group("attrs") or ""):
        attrs.append((name, value.strip("'\"") if value else None))
    return (tag, node_id, classes, attrs)


_SELECTOR_CACHE: dict = {}


def _parse_selector(selector: str):
    """-> list of alternatives; each alternative is a descendant chain of
    parsed simple selectors (last = the target).  Memoized: the engine uses
    a fixed selector vocabulary, re-parsing per call dominated profiles."""
    cached = _SELECTOR_CACHE.get(selector)
    if cached is not None:
        return cached
    alts = []
    for alt in selector.split(","):
        chain = [_parse_simple(tok) for tok in alt.split()]
        if chain and all(c is not None for c in chain):
            alts.append(chain)
    if len(_SELECTOR_CACHE) < 4096:
        _SELECTOR_CACHE[selector] = alts
    return alts


def _matches_simple(node: Node, simple) -> bool:
    # hot path (hundreds of calls per page): plain loops, no generator
    # expressions, attrs dict touched directly
    tag, node_id, classes, attrs = simple
    if tag is not None and node.tag != tag:
        return False
    node_attrs = node.attrs
    if node_id is not None and node_attrs.get("id", "") != node_id:
        return False
    if classes:
        have = node_attrs.get("class", "").split()
        for c in classes:
            if c not in have:
                return False
    for name, value in attrs:
        got = node_attrs.get(name)
        if got is None:
            return False
        if value is not None and got != value:
            return False
    return True


def _matches_chain(node: Node, chain) -> bool:
    if not _matches_simple(node, chain[-1]):
        return False
    idx = len(chain) - 2  # remaining ancestors, rightmost first (no slice)
    if idx < 0:
        return True
    anc = node.parent
    while anc is not None and idx >= 0:
        if anc.tag != "[document]" and _matches_simple(anc, chain[idx]):
            idx -= 1
        anc = anc.parent
    return idx < 0


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

# Fast-path token shapes (strict SUBSETS of html.parser's tolerant grammar;
# anything they don't match falls back to the stdlib parse_* methods, so the
# tree is bit-identical to the pre-r6 builder — pinned by the differential
# fuzz in tests/test_htmlite_fast.py):
#   start tag: alnum name, whitespace-separated attrs that are either
#   valueless or double-quoted with no '&' (no entity unescape needed),
#   optional XHTML '/' immediately before '>'.
_FAST_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*(?:\s*=\s*\"[^\"&]*\")?)*)"
    r"\s*(/)?>"
)
_FAST_ATTR = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:\s*=\s*\"([^\"&]*)\")?"
)
from html import unescape as _unescape  # noqa: E402  (stdlib, like html.parser)
from html.parser import (  # noqa: E402  — the exact stdlib token grammars
    endtagfind as _endtagfind,
    starttagopen as _starttagopen,
)


class _TreeBuilder(HTMLParser):
    """html.parser subclass with a single-shot ``goahead``: the input is
    always fed whole (parse_html below), so the incremental-buffering
    bookkeeping (partial-token suspension, rawdata re-slicing, updatepos)
    is dead weight — and the overwhelmingly common token shapes (plain
    start/end tags with double-quoted attrs) take one precompiled regex
    match instead of the stdlib's 3-4.  All rare constructs (comments,
    declarations, PIs, single-quoted/unquoted/entity-bearing attrs, bogus
    markup, truncated tails) delegate to the unmodified stdlib parse_*
    methods, so tokenization semantics are unchanged."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack: List[Node] = [self.root]

    def updatepos(self, i, j):
        # line/column bookkeeping is diagnostics-only (getpos(), error
        # messages) and we use neither; the base implementation counts
        # newlines on every token and showed up at ~5% of the whole
        # cascade's CPU.  Parsing decisions never read lineno/offset.
        return j

    # -- single-shot driver --------------------------------------------------
    def goahead(self, end):
        # feed() calls goahead(0): defer; close() calls goahead(1): run once
        # over the complete document.  Mirrors the stdlib control flow minus
        # the wait-for-more-data branches (end is always 1 here).
        if not end:
            return
        rawdata = self.rawdata
        i, n = 0, len(rawdata)
        handle_data = self.handle_data
        stack = self.stack
        find = rawdata.find
        fast_start = _FAST_START.match
        fast_attr = _FAST_ATTR.finditer
        end_tag = _endtagfind.match
        while i < n:
            if self.cdata_elem:
                # inside <script>/<style>: everything up to the matching
                # </elem> is raw text; an unterminated block is dropped,
                # exactly like the stdlib end-of-input path
                match = self.interesting.search(rawdata, i)
                if not match:
                    i = n
                    break
                j = match.start()
                if i < j:
                    handle_data(rawdata[i:j])
                self.handle_endtag(self.cdata_elem)
                self.clear_cdata_mode()
                i = match.end()
                continue
            j = find("<", i)
            if j < 0:
                j = n
            if i < j:
                text = rawdata[i:j]
                if "&" in text:
                    text = _unescape(text)
                # inline handle_data (hot: ~27 calls/page)
                if text:
                    children = stack[-1].children
                    if children and isinstance(children[-1], str):
                        children[-1] += text
                    else:
                        children.append(text)
            i = j
            if i == n:
                break
            m = fast_start(rawdata, i)
            if m:
                tag = m.group(1).lower()
                attrs_src = m.group(2)
                attr_dict: dict = {}
                if attrs_src:
                    for am in fast_attr(attrs_src):
                        name = am.group(1).lower()
                        if name not in attr_dict:
                            attr_dict[name] = am.group(2) or ""
                if m.group(3) is None:
                    # plain start tag (stdlib handle_starttag path)
                    if tag in _P_CLOSERS and stack[-1].tag == tag:
                        stack.pop()  # implicit close: <p>a<p>b
                    node = Node(tag, attr_dict)
                    parent = stack[-1]
                    node.parent = parent
                    parent.children.append(node)
                    if tag not in VOID_TAGS:
                        stack.append(node)
                    if tag in self.CDATA_CONTENT_ELEMENTS:
                        self.set_cdata_mode(tag)
                else:
                    # XHTML self-closing (stdlib handle_startendtag path:
                    # no _P_CLOSERS pop, never pushed)
                    node = Node(tag, attr_dict)
                    parent = stack[-1]
                    node.parent = parent
                    parent.children.append(node)
                i = m.end()
                continue
            m = end_tag(rawdata, i)
            if m:
                # when endtagfind matches, the stdlib parse_endtag reduces
                # to exactly this (its first '>' IS this match's '>')
                self.handle_endtag(m.group(1).lower())
                i = m.end()
                continue
            # rare constructs: delegate to the unmodified stdlib methods
            startswith = rawdata.startswith
            if _starttagopen.match(rawdata, i):  # < + letter
                k = self.parse_starttag(i)
            elif startswith("</", i):
                k = self.parse_endtag(i)
            elif startswith("<!--", i):
                k = self.parse_comment(i)
            elif startswith("<?", i):
                k = self.parse_pi(i)
            elif startswith("<!", i):
                k = self.parse_html_declaration(i)
            elif (i + 1) < n:
                handle_data("<")
                k = i + 1
            else:
                break
            if k < 0:
                # truncated construct at EOF: the stdlib end=1 salvage
                k = rawdata.find(">", i + 1)
                if k < 0:
                    k = rawdata.find("<", i + 1)
                    if k < 0:
                        k = i + 1
                else:
                    k += 1
                if not self.cdata_elem:
                    handle_data(_unescape(rawdata[i:k]))
                else:
                    handle_data(rawdata[i:k])
            i = k
        if i < n and not self.cdata_elem:
            handle_data(_unescape(rawdata[i:n]))
        self.rawdata = ""

    # helpers
    def _append_node(self, tag: str, attrs, self_closing: bool) -> None:
        attr_dict: dict = {}
        for name, value in attrs:
            # html.parser already lowercases attr names; kept for direct
            # callers feeding mixed-case tuples
            name = name.lower()
            if name not in attr_dict:
                attr_dict[name] = value if value is not None else ""
        node = Node(tag, attr_dict)
        parent = self.stack[-1]
        node.parent = parent
        parent.children.append(node)
        if not self_closing and tag not in VOID_TAGS:
            self.stack.append(node)

    # HTMLParser hooks
    def handle_starttag(self, tag, attrs):
        if tag in _P_CLOSERS and self.stack[-1].tag == tag:
            self.stack.pop()  # implicit close: <p>a<p>b
        self._append_node(tag, attrs, self_closing=False)

    def handle_startendtag(self, tag, attrs):
        self._append_node(tag, attrs, self_closing=True)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if not data:
            return
        children = self.stack[-1].children
        if children and isinstance(children[-1], str):
            children[-1] += data
        else:
            children.append(data)


def parse_html(html: str) -> Node:
    """Total parse: any input string yields a document Node (never raises)."""
    builder = _TreeBuilder()
    try:
        builder.feed(html or "")
        builder.close()
    except Exception:
        # html.parser is robust, but stay total no matter what.
        pass
    return builder.root
