"""Minimal DOM on top of the stdlib ``html.parser`` — the rebuild's cheerio.

The reference parses pages with cheerio (packages/scrape/src/core/
DataExtractor.ts:85-131) and manipulates them with simple selectors
(tag / ``.class`` / ``#id`` — the full selector vocabulary used by
HTMLTransformer.ts:21-66 and the SERP parsers). This module provides exactly
that surface with zero third-party dependencies:

- lenient parsing (void elements, implicit ``<p>`` closing, stray end tags);
- document-order traversal;
- simple-selector queries ``tag``, ``.cls``, ``#id``, ``tag.cls``,
  ``tag[attr]``, ``tag[attr=val]`` plus a single descendant combinator
  ``"a h3"`` (what Google.ts:201-257 needs);
- node removal and attribute mutation;
- HTML re-serialization.

Not a general CSS engine by design — the supported subset is asserted by
tests and documented here.
"""

from __future__ import annotations

import re
from html import escape, unescape
from html.parser import HTMLParser
from types import MappingProxyType

# every \s-class character that is NOT plain ASCII whitespace (NBSP, thin
# space, line separator, ...) re-encodes as an entity on serialization —
# cheerio (decodeEntities) does the same for all non-ASCII, and it keeps
# the markdown string pre-pass (`\s+`) from collapsing characters the
# reference pipeline preserves
_UNICODE_WS = re.compile(r"[^\S \t\n\r\f\v]")


def _encode_ws(m: re.Match) -> str:
    ch = m.group(0)
    return "&nbsp;" if ch == "\xa0" else f"&#x{ord(ch):x};"

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Tags whose open auto-closes an open <p> (HTML5 parsing rules subset)
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption figure "
    "footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p pre section "
    "table ul".split()
)
RAW_TEXT_ELEMENTS = frozenset(("script", "style"))

BLOCK_TAGS = frozenset(
    "address article aside blockquote body center dd details dir div dl dt "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr html "
    "li main menu nav ol p pre section summary table tbody td tfoot th thead "
    "tr ul".split()
)


# allocation diet (measured: leaf nodes are ~half of a page's nodes and
# never hold attributes or children): text/comment/doctype nodes share one
# read-only empty mapping and the empty tuple instead of allocating a fresh
# dict + list each — two fewer heap objects per leaf, which is what the
# memory-bandwidth-bound 8->32 parse scaling wall is made of. The proxy is
# write-protected, so a bug that mutates a leaf's attrs raises instead of
# corrupting every other leaf.
_EMPTY_ATTRS: dict = MappingProxyType({})
_NO_CHILDREN: tuple = ()
_LEAF_KINDS = frozenset(("text", "comment", "doctype"))


class Node:
    __slots__ = ("kind", "tag", "attrs", "children", "parent", "text")

    def __init__(self, kind: str, tag: str = "", attrs: dict | None = None, text: str = ""):
        self.kind = kind  # 'document' | 'element' | 'text' | 'comment' | 'doctype'
        self.tag = tag
        if kind in _LEAF_KINDS:
            self.attrs = _EMPTY_ATTRS
            self.children = _NO_CHILDREN
        else:
            self.attrs: dict[str, str | None] = attrs or {}
            self.children: list[Node] = []
        self.parent: Node | None = None
        self.text = text

    # -- tree ops ---------------------------------------------------------
    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def iter(self):
        """Document-order traversal including self."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def elements(self):
        """Document-order element traversal — direct walk (wrapping
        ``iter`` doubled the generator overhead on the hottest path)."""
        stack = [self]
        while stack:
            node = stack.pop()
            if node.kind == "element":
                yield node
            stack.extend(reversed(node.children))

    # -- accessors --------------------------------------------------------
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def text_content(self) -> str:
        out: list[str] = []
        for n in self.iter():
            if n.kind == "text":
                out.append(n.text)
        return "".join(out)

    def next_sibling(self) -> "Node | None":
        if self.parent is None:
            return None
        sibs = self.parent.children
        i = sibs.index(self)
        return sibs[i + 1] if i + 1 < len(sibs) else None

    def prev_sibling(self) -> "Node | None":
        if self.parent is None:
            return None
        sibs = self.parent.children
        i = sibs.index(self)
        return sibs[i - 1] if i > 0 else None

    def ancestors(self):
        cur = self.parent
        while cur is not None:
            yield cur
            cur = cur.parent

    # -- selectors --------------------------------------------------------
    def select(self, selector: str) -> list["Node"]:
        """All elements under (and incl.) self matching a selector list.
        Inline iterative walk — the generator version paid one resumption
        per node per query (48k resumptions per 400-page batch measured),
        pure interpreter overhead on the hottest path."""
        matchers = _compiled_list(selector)
        out: list[Node] = []
        stack = [self]
        if len(matchers) == 1:
            m = matchers[0]
            while stack:
                node = stack.pop()
                if node.kind == "element" and m(node):
                    out.append(node)
                cs = node.children
                if cs:
                    stack.extend(reversed(cs))
            return out
        while stack:
            node = stack.pop()
            if node.kind == "element" and any(m(node) for m in matchers):
                out.append(node)
            cs = node.children
            if cs:
                stack.extend(reversed(cs))
        return out

    def select_one(self, selector: str) -> "Node | None":
        """First match in document order — early exit (callers probe with
        this inside per-node loops, so scanning the whole subtree for a
        full hit list was a measured hotspot)."""
        matchers = _compiled_list(selector)
        stack = [self]
        if len(matchers) == 1:
            m = matchers[0]
            while stack:
                node = stack.pop()
                if node.kind == "element" and m(node):
                    return node
                cs = node.children
                if cs:
                    stack.extend(reversed(cs))
            return None
        while stack:
            node = stack.pop()
            if node.kind == "element" and any(m(node) for m in matchers):
                return node
            cs = node.children
            if cs:
                stack.extend(reversed(cs))
        return None

    def remove_all(self, selector: str) -> int:
        hits = self.select(selector)
        for h in hits:
            h.detach()
        return len(hits)

    def remove_tags(self, tags) -> int:
        """Detach every element whose tag is in ``tags`` (a set of plain
        tag names) in ONE traversal. Equivalent to ``remove_all(t)`` per
        tag but avoids T full-tree selects plus the O(siblings)
        ``list.remove`` per hit (the parse-kernel allocation hotspot —
        VERDICT r3 #8); subtrees under a removed element are skipped just
        like ``detach`` leaves them unvisited."""
        removed = 0
        stack = [self]
        while stack:
            node = stack.pop()
            cs = node.children
            if not cs:
                continue
            kept = [c for c in cs
                    if not (c.kind == "element" and c.tag in tags)]
            if len(kept) != len(cs):
                removed += len(cs) - len(kept)
                for c in cs:
                    if c.kind == "element" and c.tag in tags:
                        c.parent = None
                node.children = kept
            stack.extend(kept)
        return removed

    # -- serialization ----------------------------------------------------
    def to_html(self) -> str:
        buf: list[str] = []
        self._serialize(buf)
        return "".join(buf)

    def inner_html(self) -> str:
        buf: list[str] = []
        for c in self.children:
            c._serialize(buf)
        return "".join(buf)

    def _serialize(self, buf: list[str]) -> None:
        if self.kind == "text":
            # unicode-whitespace -> entities (see _UNICODE_WS above); the
            # ASCII fast path skips the regex machinery — _UNICODE_WS can
            # only match non-ASCII, and isascii() is a C-level flag check
            t = escape(self.text, quote=False)
            buf.append(t if t.isascii() else _UNICODE_WS.sub(_encode_ws, t))
        elif self.kind == "comment":
            buf.append(f"<!--{self.text}-->")
        elif self.kind == "doctype":
            buf.append(f"<!{self.text}>")
        elif self.kind == "document":
            for c in self.children:
                c._serialize(buf)
        else:
            buf.append("<" + self.tag)
            for k, v in self.attrs.items():
                if v is None:
                    buf.append(f" {k}")
                else:
                    ev = escape(v)
                    if not ev.isascii():
                        ev = _UNICODE_WS.sub(_encode_ws, ev)
                    buf.append(f' {k}="{ev}"')
            buf.append(">")
            if self.tag in VOID_ELEMENTS:
                return
            if self.tag in RAW_TEXT_ELEMENTS:
                for c in self.children:
                    if c.kind == "text":
                        buf.append(c.text)  # raw, unescaped
                    else:
                        c._serialize(buf)
            else:
                for c in self.children:
                    c._serialize(buf)
            buf.append(f"</{self.tag}>")

    def __repr__(self) -> str:  # pragma: no cover
        if self.kind == "element":
            return f"<Node {self.tag} {self.attrs}>"
        return f"<Node {self.kind} {self.text[:30]!r}>"


_COMPILED_SELECTORS: dict[str, list] = {}


def _compiled_list(selector: str) -> list:
    """Cached compilation of a comma-separated selector list (selector
    strings are a small fixed vocabulary per job — compile once per
    process, not once per page)."""
    cached = _COMPILED_SELECTORS.get(selector)
    if cached is None:
        cached = [_compile_selector(s.strip()) for s in selector.split(",") if s.strip()]
        if len(_COMPILED_SELECTORS) > 512:
            _COMPILED_SELECTORS.clear()
        _COMPILED_SELECTORS[selector] = cached
    return cached


_SIMPLE_SEL = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)+)?"
    r"(?P<attr>\[[^\]]+\])?$"
)


def _compile_simple(sel: str):
    m = _SIMPLE_SEL.match(sel)
    if not m or not sel:
        return lambda e: False
    tag = m.group("tag")
    want_tag = tag.lower() if tag and tag != "*" else None
    want_id = m.group("id")[1:] if m.group("id") else None
    want_classes = m.group("classes")[1:].split(".") if m.group("classes") else []
    attr = m.group("attr")
    attr_name = attr_val = None
    if attr:
        inner = attr[1:-1]
        if "=" in inner:
            attr_name, attr_val = inner.split("=", 1)
            attr_val = attr_val.strip("\"'")
        else:
            attr_name = inner

    def match(e: Node) -> bool:
        if want_tag is not None and e.tag != want_tag:
            return False
        if want_id is not None and e.attrs.get("id") != want_id:
            return False
        if want_classes:
            cls = e.classes()
            if any(c not in cls for c in want_classes):
                return False
        if attr_name is not None:
            if attr_name not in e.attrs:
                return False
            if attr_val is not None and e.attrs.get(attr_name) != attr_val:
                return False
        return True

    return match


def _compile_selector(sel: str):
    parts = sel.split()
    if len(parts) == 1:
        return _compile_simple(parts[0])
    # descendant combinator chain: rightmost must match, each earlier part
    # must match some ancestor in order
    matchers = [_compile_simple(p) for p in parts]

    def match(e: Node) -> bool:
        if not matchers[-1](e):
            return False
        idx = len(matchers) - 2
        for anc in e.ancestors():
            if idx < 0:
                break
            if anc.kind == "element" and matchers[idx](anc):
                idx -= 1
        return idx < 0

    return match


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("document")
        self.stack: list[Node] = [self.root]

    # current insertion point
    @property
    def top(self) -> Node:
        return self.stack[-1]

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in _P_CLOSERS:
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break
                if self.stack[i].tag in ("div", "section", "article", "td", "li", "body", "html"):
                    break
        node = Node("element", tag, dict(attrs))
        self.top.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.top.append(Node("element", tag.lower(), dict(attrs)))

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.top.append(Node("text", text=data))

    def handle_comment(self, data):
        self.top.append(Node("comment", text=data))

    def handle_decl(self, decl):
        self.top.append(Node("doctype", text=decl))


# ---------------------------------------------------------------------------
# Fast tokenizer: a strict well-formed-HTML subset parsed with anchored C
# regexes and a direct tree build (no HTMLParser dispatch, no updatepos).
# ANY construct outside the subset — tolerant-only attribute syntax, bogus
# comments, marked sections, stray "<", unterminated raw text, end tags with
# attributes — returns None and parse_html falls back to the stdlib path, so
# behavior on arbitrary markup is unchanged (equivalence on the accepted
# subset is pinned by a property test + the synthetic-corpus golden test).
# This was the largest remaining parse-kernel hotspot (VERDICT r3 #8).

_FA_NAME = r"[a-zA-Z_:][-a-zA-Z0-9_:.]*"
_FAST_ATTR = re.compile(
    r"\s+(" + _FA_NAME + r")"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|(?![\"'])[^\s>]+))?")
_FAST_START = re.compile(
    r"<([a-zA-Z][-a-zA-Z0-9:_.]*)"
    r"((?:\s+" + _FA_NAME +
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|(?![\"'])[^\s>]+))?)*)"
    r"\s*(/?)>")
_FAST_END = re.compile(r"</\s*([a-zA-Z][-a-zA-Z0-9:_.]*)\s*>")
_FAST_COMMENT = re.compile(r"<!--(.*?)--\s*>", re.S)
_FAST_DOCTYPE = re.compile(r"<!((?i:doctype)[^>]*)>")
_FAST_PI = re.compile(r"<\?[^>]*>")
# raw-text close: the stdlib "interesting" probe is `</\s*elem`; we addi-
# tionally require `\s*>` right there and bail otherwise (stdlib would
# split the raw text into multiple data nodes around a non-matching probe)
_RAW_PROBE = {t: re.compile(r"</\s*%s" % t, re.I) for t in ("script", "style")}
_RAW_CLOSE = {t: re.compile(r"</\s*%s\s*>" % t, re.I) for t in ("script", "style")}
_P_BOUNDARY = ("div", "section", "article", "td", "li", "body", "html")


def _fast_parse(html: str) -> Node | None:
    root = Node("document")
    stack = [root]
    pos, n = 0, len(html)
    find = html.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            text = html[pos:]
            stack[-1].append(Node(
                "text", text=unescape(text) if "&" in text else text))
            break
        if lt > pos:
            text = html[pos:lt]
            stack[-1].append(Node(
                "text", text=unescape(text) if "&" in text else text))
        nxt = html[lt + 1] if lt + 1 < n else ""
        if nxt == "/":
            m = _FAST_END.match(html, lt)
            if m is None:
                return None
            tag = m.group(1).lower()
            pos = m.end()
            if tag in VOID_ELEMENTS:
                continue
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        if nxt == "!":
            if html.startswith("<!--", lt):
                m = _FAST_COMMENT.match(html, lt)
                if m is None:
                    return None
                stack[-1].append(Node("comment", text=m.group(1)))
            else:
                m = _FAST_DOCTYPE.match(html, lt)
                if m is None:
                    return None
                stack[-1].append(Node("doctype", text=m.group(1)))
            pos = m.end()
            continue
        if nxt == "?":
            m = _FAST_PI.match(html, lt)
            if m is None:
                return None
            pos = m.end()  # HTMLParser routes PIs to handle_pi: dropped
            continue
        m = _FAST_START.match(html, lt)
        if m is None:
            return None
        tag = m.group(1).lower()
        blob = m.group(2)
        attrs: dict = {}
        if blob:
            apos = 0
            for am in _FAST_ATTR.finditer(blob):
                if am.start() != apos:
                    return None
                apos = am.end()
                v = am.group(2)
                if v is not None:
                    if v[0] in "\"'":
                        v = v[1:-1]
                    if "&" in v:
                        v = unescape(v)
                attrs[am.group(1).lower()] = v
            if apos != len(blob):
                return None
        pos = m.end()
        if m.group(3):
            # self-closing mirrors handle_startendtag exactly: append only
            # — no p-closing, no push, no raw-text mode
            stack[-1].append(Node("element", tag, attrs))
            continue
        if tag in _P_CLOSERS:
            for i in range(len(stack) - 1, 0, -1):
                t = stack[i].tag
                if t == "p":
                    del stack[i:]
                    break
                if t in _P_BOUNDARY:
                    break
        node = Node("element", tag, attrs)
        stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            stack.append(node)
            if tag in _RAW_PROBE:  # script/style raw-text content
                pm = _RAW_PROBE[tag].search(html, pos)
                if pm is None:
                    return None  # unterminated: stdlib EOF semantics
                cm = _RAW_CLOSE[tag].match(html, pm.start())
                if cm is None:
                    return None  # probe hit that isn't a clean close
                raw = html[pos:pm.start()]
                if raw:
                    node.append(Node("text", text=raw))
                stack.pop()
                pos = cm.end()
    return root


def parse_html(html: str) -> Node:
    """Parse HTML into a document Node (lenient, never raises on markup)."""
    try:
        fast = _fast_parse(html)
    except Exception:
        fast = None
    if fast is not None:
        return fast
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass
    return builder.root
