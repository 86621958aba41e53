"""HTML -> plain text, modeled on the ``html-to-text`` default conversion the
reference applies to raw HTML (packages/scrape/src/core/DataExtractor.ts:276).

Behavior replicated from that library's defaults:

- headings uppercased, rendered as their own blocks;
- anchors rendered as ``text [href]`` (href omitted when equal to the text);
- images rendered as their alt text;
- ``ul`` items prefixed `` * ``, ``ol`` items numbered;
- blocks separated by one blank line; long lines wrapped at 80 columns;
- script/style/head contents dropped.

This Python port is the spec-defining implementation for the rebuild; golden
tests in tests/test_textconv.py pin it.
"""

from __future__ import annotations

import re
import textwrap

from .htmldom import BLOCK_TAGS, Node, parse_html

_SKIP = frozenset(("script", "style", "noscript", "meta", "link", "title", "head"))
_WRAP = 80


def _collapse(text: str) -> str:
    return re.sub(r"\s+", " ", text)


def _wrap(text: str) -> str:
    """Greedy 80-col word wrap; identical to ``textwrap.wrap`` for
    space-separated text without over-long or hyphenated words (the common
    case — 10x cheaper); falls back to textwrap otherwise. The over-long
    word check is fused into the packing loop (a separate pre-pass scanned
    every word twice — measured hotspot)."""
    if len(text) <= _WRAP:
        return text
    if "-" in text:
        return "\n".join(textwrap.wrap(text, _WRAP))
    lines: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for w in text.split(" "):
        wl = len(w)
        if wl > _WRAP:  # rare: textwrap handles mid-word breaking
            return "\n".join(textwrap.wrap(text, _WRAP))
        add = wl + (1 if cur else 0)
        if cur_len + add > _WRAP:
            lines.append(" ".join(cur))
            cur, cur_len = [w], wl
        else:
            cur.append(w)
            cur_len += add
    if cur:
        lines.append(" ".join(cur))
    return "\n".join(lines)


class _TextConverter:
    def block_of(self, node: Node) -> list[str]:
        """Convert a container node into a list of finished text blocks."""
        blocks: list[str] = []
        inline: list[str] = []

        def flush() -> None:
            if inline:
                joined = _collapse("".join(inline)).strip()
                if joined:
                    blocks.append(_wrap(joined) or joined)
                inline.clear()

        for child in node.children:
            if child.kind == "text":
                inline.append(child.text)
                continue
            if child.kind != "element" or child.tag in _SKIP:
                continue
            tag = child.tag
            if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
                flush()
                heading = _collapse(self.inline_of(child)).strip().upper()
                if heading:
                    blocks.append(heading)
            elif tag in ("ul", "ol"):
                flush()
                items = [c for c in child.children if c.kind == "element" and c.tag == "li"]
                lines = []
                for i, li in enumerate(items):
                    marker = f" {i + 1}. " if tag == "ol" else " * "
                    body = _collapse(self.inline_of(li)).strip()
                    lines.append(marker + body)
                if lines:
                    blocks.append("\n".join(lines))
            elif tag in ("p", "blockquote", "pre", "div", "figure", "figcaption", "table",
                         "section", "article", "main", "header", "footer", "nav", "aside",
                         "form", "html", "body") or (tag in BLOCK_TAGS and tag != "br"):
                flush()
                blocks.extend(self.block_of(child))
            else:
                inline.append(self._render_inline(child))
        flush()
        return blocks

    def _render_inline(self, node: Node) -> str:
        """Render one inline element (anchor/img/br/other) to text."""
        if node.tag == "a":
            text = _collapse(self.inline_of(node)).strip()
            href = (node.get("href") or "").strip()
            if href and href != text and not href.startswith(("#", "javascript:")):
                return f"{text} [{href}]" if text else f"[{href}]"
            return text
        if node.tag == "img":
            return (node.get("alt") or "").strip()
        if node.tag == "br":
            return "\n"
        return self.inline_of(node)

    def inline_of(self, node: Node) -> str:
        out: list[str] = []
        for child in node.children:
            if child.kind == "text":
                out.append(child.text)
            elif child.kind == "element" and child.tag not in _SKIP:
                out.append(self._render_inline(child))
        return "".join(out)


def html_to_text(html: str) -> str:
    """Convert an HTML document to wrapped plain text."""
    return html_to_text_tree(parse_html(html))


def html_to_text_tree(root: Node) -> str:
    """Text conversion from an already-parsed tree (read-only walk —
    callers may share the tree with later mutating stages)."""
    blocks = _TextConverter().block_of(root)
    return "\n\n".join(b for b in blocks if b.strip())
