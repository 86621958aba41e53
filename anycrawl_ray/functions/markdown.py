"""HTML -> Markdown, reproducing the reference's Turndown configuration.

Reference: packages/libs/src/html-to-markdown.ts:3-213 — Turndown with
default options (setext headings, ``*`` bullets, indented code blocks,
inline links) plus nine custom rules and two regex post-passes. The custom
rules replicated here:

- whitespace pre-processing ``>\\s+<`` -> ``><`` and ``\\s+`` -> ' ' (ts:5-8);
- removal of script/style/noscript/meta/link (ts:15-21);
- ``p``: blank-line block, rendered inline when inside an ``<a>`` (ts:24-41);
- ``div``: block only when it contains block elements, else inline + ' ';
  inline inside ``<a>`` (ts:44-69);
- ``span``: sibling-aware spacing (ts:72-100);
- anchors wrapping a single image -> ``[![alt](src)](href)`` with
  invalid-href fallback (ts:103-124);
- ``figure``/``picture`` and ``figcaption`` as blank-line blocks (ts:127-142);
- ``em/i`` -> ``*x*``, ``strong/b`` -> ``**x**`` on trimmed content (ts:145-160);
- ``br`` -> ``\\n`` (ts:163-168);
- post-passes: bracket-wrapped image normalization (ts:171-189), link-text
  whitespace collapse (ts:192-201), ``\\n{3,}`` -> ``\\n\\n`` + trim (ts:210).

This Python port is the spec-defining implementation for the rebuild
(SURVEY.md §7.5#1); golden tests pin its behavior.
"""

from __future__ import annotations

import re

from .htmldom import BLOCK_TAGS, Node, parse_html

_PRE_BETWEEN = re.compile(r">\s+<")
_PRE_WS = re.compile(r"\s+")

_REMOVE_TAGS = ("script", "style", "noscript", "meta", "link")
_REMOVE_TAGS_SET = frozenset(_REMOVE_TAGS)

_BLOCK_QUERY = "p, h1, h2, h3, h4, h5, h6, ul, ol, blockquote, pre"

# Turndown's text-escape table (commonmark escapes)
_ESCAPES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"\\"), r"\\\\"),
    (re.compile(r"\*"), r"\\*"),
    (re.compile(r"^-", re.M), r"\\-"),
    (re.compile(r"^\+ ", re.M), r"\\+ "),
    (re.compile(r"^(=+)", re.M), r"\\\1"),
    (re.compile(r"^(#{1,6}) ", re.M), r"\\\1 "),
    (re.compile(r"`"), r"\\`"),
    (re.compile(r"^~~~", re.M), r"\\~~~"),
    (re.compile(r"\["), r"\\["),
    (re.compile(r"\]"), r"\\]"),
    (re.compile(r"^>", re.M), r"\\>"),
    (re.compile(r"_"), r"\\_"),
    (re.compile(r"^(\d+)\. ", re.M), r"\1\\. "),
]


# fast-path probe: only texts containing one of these can need escaping
_MAYBE_ESCAPE = re.compile(r"[\\*`\[\]_~#>=+\-]|\d")

# single-pass fusion of the 13-pattern _ESCAPES chain: the anywhere
# character class and the line-start alternatives are disjoint alphabets,
# and every sequential replacement only ever INSERTS a backslash before
# the match — so one left-to-right scan that fires the first applicable
# alternative at each position produces the identical string (pinned
# against the sequential chain by a property test). 13 re.sub passes per
# text node were the top markdown hotspot (VERDICT r3 #8).
_ESCAPE_RX = re.compile(
    r"(?P<ls>^(?:\+ |=+|#{1,6} |~~~|>|-|\d+\. ))|(?P<ch>[\\*`\[\]_])",
    re.M,
)


def _escape_repl(m: re.Match) -> str:
    s = m.group(0)
    if m.lastgroup == "ch":
        return "\\" + s
    if s[0].isdigit():  # "12. " -> "12\. "
        return s[:-2] + "\\. "
    return "\\" + s


def _escape_text(text: str) -> str:
    if _MAYBE_ESCAPE.search(text) is None:
        return text
    return _ESCAPE_RX.sub(_escape_repl, text)


def _escape_text_sequential(text: str) -> str:
    """The reference 13-pass chain; kept as the spec for the property
    test pinning ``_escape_text`` equivalence."""
    for rx, repl in _ESCAPES:
        text = rx.sub(repl, text)
    return text


def _inside_anchor(node: Node) -> bool:
    return any(a.kind == "element" and a.tag == "a" for a in node.ancestors())


def _join(left: str, right: str) -> str:
    """Concatenate two markdown chunks, collapsing boundary newlines to the
    max of both sides, capped at 2 (Turndown's separating-newlines rule)."""
    if not left:
        return right
    if not right:
        return left
    trail = len(left) - len(left.rstrip("\n"))
    lead = len(right) - len(right.lstrip("\n"))
    sep = "\n" * min(max(trail, lead), 2)
    return left.rstrip("\n") + sep + right.lstrip("\n")


# tag -> unbound handler (or None), filled lazily; _Converter has no
# subclasses, so one table serves every instance/process lifetime
_TAG_DISPATCH: dict[str, object] = {}


class _Converter:
    def convert_children(self, node: Node) -> str:
        """Fold of ``_join`` over the children, restructured as a piece
        list: the naive ``out = _join(out, chunk)`` re-scanned and
        re-copied the whole accumulated string per child (O(k*L) for k
        children) — this tracks only the trailing-newline count between
        boundaries, so each chunk is copied once. Equality with the fold
        is pinned by a property test."""
        pieces: list[str] = []
        trail = 0
        empty = True
        for child in node.children:
            s = self.convert_node(child)
            if not s:
                continue
            if empty:
                core = s.rstrip("\n")
                trail = len(s) - len(core)
                if core:
                    pieces.append(core)
                empty = False
                continue
            lead = len(s) - len(s.lstrip("\n"))
            sep = min(max(trail, lead), 2)
            core = s.strip("\n")
            if core:
                if sep:
                    pieces.append("\n" * sep)
                pieces.append(core)
                trail = len(s) - len(s.rstrip("\n"))
            else:
                trail = sep
        if empty:
            return ""
        return "".join(pieces) + "\n" * trail

    def convert_node(self, node: Node) -> str:
        if node.kind == "text":
            return _escape_text(node.text)
        if node.kind != "element":
            return ""
        tag = node.tag
        # dispatch through a class-level tag table: the getattr probe built
        # an f-string + attribute lookup PER NODE (7k/400 pages measured)
        try:
            handler = _TAG_DISPATCH[tag]
        except KeyError:
            handler = getattr(type(self), f"_tag_{tag}", None)
            if len(_TAG_DISPATCH) > 512:
                # tag names are attacker-controlled HTML; bound the cache
                # like _COMPILED_SELECTORS does
                _TAG_DISPATCH.clear()
            _TAG_DISPATCH[tag] = handler
        if handler is not None:
            return handler(self, node)
        if tag in _REMOVE_TAGS:
            return ""
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            return self._heading(node, int(tag[1]))
        content = self.convert_children(node)
        if tag in BLOCK_TAGS:
            c = content.strip("\n")
            return f"\n\n{c}\n\n" if c else ""
        return content

    # -- custom rules (ordered per reference) -----------------------------
    def _tag_p(self, node: Node) -> str:
        trimmed = self.convert_children(node).strip()
        if not trimmed:
            return ""
        if _inside_anchor(node):
            return trimmed
        return f"\n\n{trimmed}\n\n"

    def _tag_div(self, node: Node) -> str:
        trimmed = self.convert_children(node).strip()
        if not trimmed:
            return ""
        if _inside_anchor(node):
            return trimmed
        if node.select_one(_BLOCK_QUERY) is not None:
            return f"\n\n{trimmed}\n\n"
        return trimmed + " "

    @staticmethod
    def _sibling_has_content(sib: Node | None) -> bool:
        if sib is None:
            return False
        if sib.kind == "text":
            return bool(sib.text.strip())
        return sib.kind == "element" and sib.tag == "span" and bool(
            sib.text_content().strip()
        )

    def _tag_span(self, node: Node) -> str:
        trimmed = self.convert_children(node).strip()
        if not trimmed:
            return ""
        prefix = " " if self._sibling_has_content(node.prev_sibling()) else ""
        nxt = node.next_sibling()
        # reference: suffix when next sibling exists with content (text or span)
        suffix = " " if self._sibling_has_content(nxt) else ""
        return prefix + trimmed + suffix

    def _tag_a(self, node: Node) -> str:
        # linkedImages rule: anchor whose only non-whitespace child is an img
        children = [
            c
            for c in node.children
            if not (c.kind == "text" and not c.text.strip()) and c.kind != "comment"
        ]
        href = (node.get("href") or "").strip()
        if len(children) == 1 and children[0].kind == "element" and children[0].tag == "img":
            image_md = self.convert_node(children[0]).strip()
            invalid = not href or href == "#" or href.lower().startswith("javascript:")
            return image_md if invalid else f"[{image_md}]({href})"
        content = self.convert_children(node)
        if not href:
            return content
        title = node.get("title")
        title_part = f' "{title}"' if title else ""
        return f"[{content}]({href}{title_part})"

    def _tag_img(self, node: Node) -> str:
        src = node.get("src") or ""
        if not src:
            return ""
        alt = node.get("alt") or ""
        title = node.get("title")
        title_part = f' "{title}"' if title else ""
        return f"![{alt}]({src}{title_part})"

    def _figureish(self, node: Node) -> str:
        inner = self.convert_children(node).strip()
        return f"\n\n{inner}\n\n" if inner else ""

    _tag_figure = _figureish
    _tag_picture = _figureish
    _tag_figcaption = _figureish

    def _emphasis(self, node: Node) -> str:
        clean = self.convert_children(node).strip()
        if not clean:
            return ""
        if node.tag in ("em", "i"):
            return f"*{clean}*"
        return f"**{clean}**"

    _tag_em = _emphasis
    _tag_i = _emphasis
    _tag_strong = _emphasis
    _tag_b = _emphasis

    def _tag_br(self, node: Node) -> str:
        return "\n"

    # -- Turndown default rules ------------------------------------------
    def _heading(self, node: Node, level: int) -> str:
        content = self.convert_children(node).strip()
        if not content:
            return ""
        if level in (1, 2):  # setext (Turndown default headingStyle)
            underline = ("=" if level == 1 else "-") * len(content)
            return f"\n\n{content}\n{underline}\n\n"
        return f"\n\n{'#' * level} {content}\n\n"

    def _tag_blockquote(self, node: Node) -> str:
        content = self.convert_children(node).strip("\n")
        content = re.sub(r"^", "> ", content, flags=re.M)
        return f"\n\n{content}\n\n"

    def _list(self, node: Node) -> str:
        content = self.convert_children(node)
        parent = node.parent
        if parent is not None and parent.kind == "element" and parent.tag == "li" and (
            parent.children and parent.children[-1] is node
        ):
            return "\n" + content
        return f"\n\n{content.strip(chr(10))}\n\n"

    _tag_ul = _list
    _tag_ol = _list

    def _tag_li(self, node: Node) -> str:
        content = self.convert_children(node)
        content = re.sub(r"^\n+", "", content)
        content = re.sub(r"\n+$", "\n", content)
        content = content.replace("\n", "\n    ")
        parent = node.parent
        if parent is not None and parent.kind == "element" and parent.tag == "ol":
            start = parent.get("start")
            items = [c for c in parent.children if c.kind == "element" and c.tag == "li"]
            index = items.index(node)
            base = int(start) if start and start.isdigit() else 1
            prefix = f"{base + index}.  "
        else:
            prefix = "*   "
        suffix = "\n" if node.next_sibling() is not None and not content.endswith("\n") else ""
        return prefix + content + suffix

    def _tag_code(self, node: Node) -> str:
        parent = node.parent
        if parent is not None and parent.kind == "element" and parent.tag == "pre":
            return node.text_content()
        text = node.text_content()
        if not text:
            return ""
        return f"`{text}`"

    def _tag_pre(self, node: Node) -> str:
        text = node.text_content()
        if not text.strip():
            return ""
        indented = re.sub(r"^", "    ", text.strip("\n"), flags=re.M)
        return f"\n\n{indented}\n\n"

    def _tag_hr(self, node: Node) -> str:
        return "\n\n* * *\n\n"


_BRACKET_IMG_COLLAPSE = re.compile(r"\[\s*(!\[[^\]]*\]\([^\)]+\))\s*\]")
_BRACKET_IMG_BARE = re.compile(r"\[\s*(!\[[^\]]*\]\([^\)]+\))\s*\](?!\s*[\(\[])")
_LINK_TEXT = re.compile(r"\[\s*([\s\S]*?)\s*\]\(([^\)]+)\)")
_MULTI_BLANK = re.compile(r"\n{3,}")


def _normalize_bracket_wrapped_images(s: str) -> str:
    prev = None
    while prev != s:
        prev = s
        s = _BRACKET_IMG_COLLAPSE.sub(r"[\1]", s)
        s = _BRACKET_IMG_BARE.sub(r"\1", s)
    return s


def _normalize_link_text_whitespace(s: str) -> str:
    def repl(m: re.Match) -> str:
        cleaned = re.sub(r"[\t\r\n]+", " ", m.group(1))
        cleaned = re.sub(r"\s{2,}", " ", cleaned).strip()
        return f"[{cleaned}]({m.group(2)})"

    return _LINK_TEXT.sub(repl, s)


def html_to_markdown(html: str) -> str:
    """Convert HTML to markdown with the reference's rule set."""
    html = _PRE_BETWEEN.sub("><", html)
    html = _PRE_WS.sub(" ", html).strip()
    root = parse_html(html)
    root.remove_tags(_REMOVE_TAGS_SET)
    return _convert_tree(root)


def _convert_tree(root: Node) -> str:
    markdown = _Converter().convert_children(root)
    markdown = _normalize_bracket_wrapped_images(markdown)
    markdown = _normalize_link_text_whitespace(markdown)
    markdown = _MULTI_BLANK.sub("\n\n", markdown).strip()
    return markdown


# ASCII whitespace only: the string pre-pass runs BEFORE entity decoding,
# so literal NBSP-class characters produced by entities must survive the
# tree-path collapse exactly like they survive the string path
_ASCII_WS = re.compile(r"[ \t\r\n\f\v]+")


def _collapse_tree_whitespace(root: Node) -> None:
    """Tree-level equivalent of the string pre-pass (``>\\s+<`` -> ``><``,
    ``\\s+`` -> ' '): merge adjacent text siblings, drop whitespace-only
    text nodes (they sit between tags), collapse runs inside the rest.
    Equivalence with the string path is pinned by tests over the golden
    cases and the synthetic corpus."""
    stack = [root]
    while stack:
        node = stack.pop()
        merged: list[Node] = []
        for child in node.children:
            if child.kind == "text" and merged and merged[-1].kind == "text":
                merged[-1].text += child.text
                continue
            child.parent = node
            merged.append(child)
        kept: list[Node] = []
        for child in merged:
            if child.kind == "text":
                if not child.text.strip():
                    continue
                t = child.text
                # identity fast path (C-level scans beat regex setup on
                # the short, already-clean text nodes that dominate):
                # the sub only changes t when it has a non-space ASCII
                # ws char or a double space
                if ("  " in t or "\n" in t or "\t" in t or "\r" in t
                        or "\f" in t or "\v" in t):
                    child.text = _ASCII_WS.sub(" ", t)
            kept.append(child)
        node.children = kept
        stack.extend(kept)


def markdown_from_tree(root: Node) -> str:
    """Markdown straight from an (already URL-transformed, cleaned) tree —
    skips the serialize + re-parse round trip of ``html_to_markdown``.
    MUTATES the tree (noise-tag removal + whitespace collapse); call after
    every other consumer of the tree. Output equality with
    ``html_to_markdown(root.to_html())`` is asserted by tests (the
    serializer encodes NBSP as &nbsp;, so both paths preserve it — the
    cheerio-faithful behavior)."""
    root.remove_tags(_REMOVE_TAGS_SET)
    _collapse_tree_whitespace(root)
    return _convert_tree(root)
