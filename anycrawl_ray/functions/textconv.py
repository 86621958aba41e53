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


def _collapse_strip(text: str) -> str:
    """``_collapse(text).strip()`` without the regex: ``str.split()``
    splits on exactly the ``str.isspace`` set, which equals re ``\\s``
    for str patterns (verified over the BMP in tests), and the join
    drops leading/trailing runs like the strip did. C-speed, one pass,
    no intermediate collapsed string (measured parse-kernel hotspot)."""
    return " ".join(text.split())


# greedy 80-col packing as ONE regex scan: at each word start the greedy
# `.{0,78}` takes the longest span <= 80 chars that ends on a word
# boundary — exactly the greedy word-packing line break for single-space
# separated text whose words all fit (equivalence pinned by a property
# test). Newlines can't appear post-collapse, and `.` won't cross one.
_WRAP_RX = re.compile(r"\S(?:.{0,78}\S)?(?= |$)")
_LONG_WORD = re.compile(r"\S{81}")


def _wrap(text: str) -> str:
    """Greedy 80-col word wrap; identical to ``textwrap.wrap`` for
    space-separated text without over-long or hyphenated words (the common
    case — one C regex scan); falls back to textwrap otherwise."""
    if len(text) <= _WRAP:
        return text
    if "-" in text or "\n" in text or "  " in text or _LONG_WORD.search(text):
        return "\n".join(textwrap.wrap(text, _WRAP))
    return "\n".join(_WRAP_RX.findall(text))


class _TextConverter:
    def block_of(self, node: Node) -> list[str]:
        """Convert a container node into a list of finished text blocks."""
        blocks: list[str] = []
        inline: list[str] = []

        def flush() -> None:
            if inline:
                joined = _collapse_strip("".join(inline))
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
                heading = _collapse_strip(self.inline_of(child)).upper()
                if heading:
                    blocks.append(heading)
            elif tag in ("ul", "ol"):
                flush()
                items = [c for c in child.children if c.kind == "element" and c.tag == "li"]
                lines = []
                for i, li in enumerate(items):
                    marker = f" {i + 1}. " if tag == "ol" else " * "
                    body = _collapse_strip(self.inline_of(li))
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
            text = _collapse_strip(self.inline_of(node))
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
